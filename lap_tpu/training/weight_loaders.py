"""Checkpoint-format adapters: load released weights into the params tree.

Capability parity with lihzha/lap ``training/weight_loaders.py``: orbax
"trained checkpoint" params, PaliGemma big_vision ``.npz`` archives, and
partial-weight merging by regex. The npz remapping targets OUR param tree
(lap_model.LAP: ``llm/...``, ``img/...``) which intentionally mirrors the
reference layout minus the NNX wrapper.
"""

from __future__ import annotations

import dataclasses
import logging
import re
from pathlib import Path
from typing import Literal, Protocol

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class WeightLoader(Protocol):
    def load(self, params: dict) -> dict:
        """Return params_shape-compatible partial params to merge."""


@dataclasses.dataclass(frozen=True)
class NoOpWeightLoader:
    def load(self, params: dict) -> dict:
        return params


def flatten(tree: dict, parent: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{parent}/{k}" if parent else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def merge_params(loaded: dict, params_shape: dict, *, missing_regex: str = ".*") -> dict:
    """Merge loaded params over the init-shape tree.

    Loaded leaves are cast to the target dtype; any target path not present
    in ``loaded`` must match ``missing_regex`` (it keeps its fresh init),
    mirroring reference ``_merge_params`` (weight_loaders.py:691-719).
    """
    flat_shape = flatten(params_shape)
    flat_loaded = flatten(loaded)
    pattern = re.compile(missing_regex)
    out = {}
    for key, ref in flat_shape.items():
        if key in flat_loaded:
            val = flat_loaded[key]
            dtype = getattr(ref, "dtype", None)
            if hasattr(val, "astype") and dtype is not None:
                val = val.astype(dtype)
            if tuple(val.shape) != tuple(ref.shape):
                raise ValueError(
                    f"shape mismatch for {key}: loaded {val.shape} vs model {ref.shape}"
                )
            out[key] = val
        elif pattern.fullmatch(key):
            out[key] = ref
        else:
            raise ValueError(f"param {key} missing from checkpoint and not matched by {missing_regex!r}")
    extra = set(flat_loaded) - set(flat_shape)
    if extra:
        logger.warning("checkpoint has %d params not in model (e.g. %s)", len(extra), sorted(extra)[:5])
    return unflatten(out)


def restore_params(path: str | Path, *, dtype=None) -> dict:
    """Restore an orbax params checkpoint directory (reference layout:
    ``{step}/params`` holding {'params': tree}).

    Arrays are materialized as host numpy (no sharding requirement), so a
    checkpoint saved on one topology loads on any other; the caller
    device_puts onto the target mesh.
    """
    from lap_tpu.training.checkpoints import restore_params as _restore_np

    return _restore_np(path, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class CheckpointWeightLoader:
    """Load a full trained checkpoint (orbax params dir).

    Non-LoRA params must all be present; LoRA params may be fresh
    (reference weight_loaders.py:55-105).
    """

    params_path: str

    def load(self, params_shape: dict) -> dict:
        loaded = restore_params(self.params_path)
        return merge_params(loaded, params_shape, missing_regex=".*lora.*")


def recover_dtype(a: np.ndarray) -> np.ndarray:
    """np.save stores bfloat16 as a 2-byte void dtype; view it back
    (reference weight_loaders.py:25-30 — required for PaliGemma2 npz
    exports, which ship bf16 arrays)."""
    if hasattr(a, "dtype") and a.dtype.type is np.void:
        if a.itemsize != 2:
            raise ValueError(f"unknown void dtype with itemsize {a.itemsize}")
        return a.view(jnp.bfloat16)
    return a


@dataclasses.dataclass(frozen=True)
class PaliGemmaWeightLoader:
    """Load big_vision PaliGemma / PaliGemma2 ``.npz`` weights into
    expert 0 + SigLIP.

    npz keys look like ``params/img/embedding/kernel`` and
    ``params/llm/layers/attn/q_einsum/w``; everything else (action expert,
    projections) keeps its fresh init (reference weight_loaders.py:109-124).
    PaliGemma2 exports additionally store bfloat16 arrays (void-2 in npz,
    recovered here — reference ``PaliGemma2WeightLoader``, :127-140).
    """

    npz_path: str

    def load(self, params_shape: dict) -> dict:
        with Path(self.npz_path).open("rb") as f:
            flat_np = dict(np.load(f, allow_pickle=False))
        loaded = {}
        for key, value in flat_np.items():
            key = key.removeprefix("params/")
            loaded[self._remap(key)] = jnp.asarray(recover_dtype(value))
        return merge_params(unflatten(loaded), params_shape, missing_regex=".*")

    @staticmethod
    def _remap(key: str) -> str:
        # big_vision uses nested module dirs; our SigLIP flattens the
        # Transformer scope into scan-stacked module names.
        key = key.replace("img/Transformer/encoderblock/", "img/Transformer_encoderblock/")
        key = key.replace("img/Transformer/encoder_norm/", "img/Transformer_encoder_norm/")
        key = key.replace(
            "MlpBlock_0/Dense_0", "MlpBlock_0/Dense_0"
        )
        return key


@dataclasses.dataclass(frozen=True)
class WeightLoaderChoice:
    """CLI-friendly weight-loader selector (reference weight_loaders.py:631)."""

    kind: Literal["none", "checkpoint", "paligemma", "paligemma2", "gemma3"] = "none"
    params_path: str | None = None

    def build(self) -> WeightLoader | None:
        if self.kind == "none":
            return None
        if self.kind == "checkpoint":
            if not self.params_path:
                raise ValueError("checkpoint loader requires params_path")
            return CheckpointWeightLoader(self.params_path)
        if self.kind in ("paligemma", "paligemma2"):
            # Same npz layout; paligemma2 exports carry bf16 (recovered
            # unconditionally, reference kinds :653-674).
            if not self.params_path:
                raise ValueError(f"{self.kind} loader requires params_path (.npz)")
            return PaliGemmaWeightLoader(self.params_path)
        if self.kind == "gemma3":
            from lap_tpu.training.gemma3_weights import Gemma3ScanCompatibleWeightLoader

            if not self.params_path:
                raise ValueError("gemma3 loader requires params_path")
            return Gemma3ScanCompatibleWeightLoader(self.params_path)
        raise ValueError(f"unknown weight loader kind: {self.kind}")
