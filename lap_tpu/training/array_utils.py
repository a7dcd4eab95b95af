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


def gather_host_json(obj) -> list:
    """All-gather one small JSON-serializable object per process.

    Returns ``[obj_process_0, ..., obj_process_{N-1}]`` on every process
    (single-process: ``[obj]``). Used to collect per-host checkpoint assets
    (e.g. dataloader cursors) so the primary host can persist all of them in
    one atomic orbax item.
    """
    import json as _json

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(_json.dumps(obj).encode("utf-8"), dtype=np.uint8)
    # Fixed-size buffers are required for the allgather: agree on the max
    # length first, then pad with zeros (stripped on decode).
    max_len = int(multihost_utils.process_allgather(np.asarray(len(payload))).max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)  # (N, max_len)
    return [
        _json.loads(bytes(row).rstrip(b"\x00").decode("utf-8"))
        for row in np.asarray(gathered).reshape(jax.process_count(), max_len)
    ]
