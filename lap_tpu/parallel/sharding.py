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

# Tensor-parallel placement rules for the LAP/Gemma parameter tree: regex on
# the flattened path -> weight dim to shard over the tp axis. Head-count dims
# for attention projections, hidden dims for MLPs, vocab for the embedding.
# GSPMD propagates matching activation shardings and inserts the collectives.
# The reference has no TP (SURVEY.md §2.6); this is the rebuild's addition.
DEFAULT_TP_RULES: tuple[tuple[str, object], ...] = (
    # Attention projections: the heads dim sits at -3 in every layout
    # ([.., N, D, H], [.., {2,3}, K, D, H], [.., N, H, D]).
    (r".*attn.*(qkv_einsum|q_einsum|kv_einsum|attn_vec_einsum).*/w$", -3),
    # MLPs: shard the hidden dim, which is the largest in both the Gemma2
    # ([2, D, F]) and Gemma3 ([2, F, D]) gating layouts.
    (r".*mlp.*(gating_einsum|linear)$", "largest"),
    # NOTE: the embedding table is deliberately NOT tp-sharded. Sharding
    # [V, D] over tp makes the encode gather and (worse) its backward
    # scatter-add repartition [B, T, D] cotangents across tp — XLA SPMD
    # falls back to involuntary full rematerialization there. FSDP still
    # splits the table; tp replication costs nothing at LAP vocab sizes.
)


@dataclasses.dataclass(frozen=True)
class FsdpShardingResult:
    sharding: object  # pytree of NamedSharding
    num_sharded: int
    num_replicated: int
    sharded_bytes: int
    replicated_bytes: int


def _tp_dim(path_str: str, shape: tuple[int, ...], tp_size: int, tp_rules) -> int | None:
    """Tensor-parallel dim for this param, or None."""
    if tp_size <= 1 or not shape:
        return None
    import re

    for pattern, rule in tp_rules:
        if not re.search(pattern, path_str):
            continue
        if rule == "largest":
            dim = max(range(len(shape)), key=lambda i: shape[i])
        else:
            dim = rule % len(shape)
        if shape[dim] % tp_size == 0 and shape[dim] >= tp_size:
            return dim
    return None


def _is_pp_layer_leaf(path_str: str, shape: tuple[int, ...], pp_size: int) -> bool:
    """Is this leaf part of the LLM's scan-stacked ``layers`` subtree that a
    pipeline run shards over the pp axis? Matches params, grads, and the
    optimizer's mu/nu moments (same tree paths), requiring the leading layer
    axis to divide by the pp size."""
    import re

    if not shape or shape[0] % pp_size != 0 or shape[0] < pp_size:
        return False
    # keystr normalization leaves the first bracket: ".params[llm/layers/..."
    return re.search(r"(^|/|\[)llm/layers/", path_str) is not None


def _spec(parts: list) -> PartitionSpec:
    while parts and parts[-1] is None:
        parts = parts[:-1]
    return PartitionSpec(*parts)


def _leaf_fsdp_spec(
    shape: tuple[int, ...], dtype, fsdp_size: int, min_bytes: int, tp_dim: int | None, tp_size: int
):
    """PartitionSpec: tp dim from rules, then largest divisible dim on fsdp."""
    spec = [None] * len(shape)
    if tp_dim is not None:
        spec[tp_dim] = mesh_lib.TP_AXIS
    if fsdp_size <= 1 or not shape:
        return _spec(spec)
    size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if size < min_bytes:
        return _spec(spec)
    # Prefer the largest dim; ties broken toward the trailing dim, which for
    # stacked scan layers avoids sharding the layer-stacking axis when an
    # equally large in-feature/out-feature dim exists.
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for dim in order:
        if dim == tp_dim:
            continue
        if shape[dim] % fsdp_size == 0 and shape[dim] >= fsdp_size:
            spec[dim] = mesh_lib.FSDP_AXIS
            return _spec(spec)
    return _spec(spec)


def fsdp_sharding(
    pytree,
    mesh: Mesh,
    *,
    min_size_bytes: int = DEFAULT_MIN_SIZE_BYTES,
    tp_rules=DEFAULT_TP_RULES,
    log: bool = False,
):
    """Map a pytree of arrays / ShapeDtypeStructs to NamedShardings.

    FSDP (largest divisible dim over the fsdp axis, size-thresholded) plus
    tensor parallelism over the tp axis when the mesh has one. Works on
    ``jax.eval_shape`` output, so the train-state sharding tree is derived
    before any parameter is materialized.
    """
    fsdp_size = mesh.shape[mesh_lib.FSDP_AXIS]
    tp_size = mesh.shape.get(mesh_lib.TP_AXIS, 1)
    pp_size = mesh.shape.get(mesh_lib.PP_AXIS, 1)
    stats = {"sharded": 0, "replicated": 0, "sharded_b": 0, "repl_b": 0}

    def to_sharding(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        dtype = getattr(leaf, "dtype", np.float32)
        path_str = jax.tree_util.keystr(path).replace("'", "").replace("][", "/").strip("[]")
        if pp_size > 1 and _is_pp_layer_leaf(path_str, shape, pp_size):
            # Pipeline-parallel run: the LLM's scan-stacked layer leaves are
            # stored with the exact spec pipeline_apply's shard_map in_specs
            # declare (layer axis over pp, largest divisible non-layer dim
            # over fsdp, NO size threshold) so the jitted train step never
            # reshards parameters at the shard_map boundary. Every other
            # param (embedder, ViT, heads, optimizer scalars) falls through
            # to the usual fsdp rules, replicated over pp.
            from lap_tpu.parallel.pipeline import pp_layer_param_spec

            spec = pp_layer_param_spec(shape, pp_size, fsdp_size)
            nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize if shape else 0
            stats["sharded"] += 1
            stats["sharded_b"] += nbytes
            return NamedSharding(mesh, spec)
        tp_dim = _tp_dim(path_str, shape, tp_size, tp_rules)
        spec = _leaf_fsdp_spec(shape, dtype, fsdp_size, min_size_bytes, tp_dim, tp_size)
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
