"""Multi-host array utilities (parity: lihzha/lap training/array_utils.py)."""

from __future__ import annotations

import jax
import numpy as np


def array_info(x) -> str:
    """Compact description of an array for sharding/debug dumps."""
    sharding = getattr(x, "sharding", None)
    spec = getattr(sharding, "spec", None)
    return f"{tuple(x.shape)} {x.dtype} spec={spec}"


def tree_info(tree) -> str:
    lines = []
    jax.tree_util.tree_map_with_path(
        lambda p, x: lines.append(f"{jax.tree_util.keystr(p)}: {array_info(x)}"), tree
    )
    return "\n".join(lines)


def to_local_array(x) -> np.ndarray:
    """Concatenate this process's addressable shards along the batch dim."""
    if not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def global_concat(x) -> np.ndarray:
    """All-gather host-local data across processes (single-process: identity)."""
    if jax.process_count() == 1:
        return to_local_array(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def sync_global_devices(name: str) -> None:
    """Cross-host barrier (no-op single process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
