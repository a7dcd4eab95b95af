"""Gemma3 checkpoint remapper.

Capability parity with lihzha/lap ``weight_loaders.py:281-628``
(Gemma3ScanCompatibleWeightLoader).  A raw Gemma3-IT orbax export stores

    transformer/layer_N/attn/{q,kv,attn_vec}_einsum/w
    transformer/layer_N/attn/{_key_norm,_query_norm}/scale
    transformer/layer_N/mlp/{gating_einsum,linear}/w
    transformer/layer_N/{pre,post}_{attention,ffw}_norm/scale
    transformer/{final_norm/scale, embedder/input_embedding}
    transformer/embedder/mm_input_projection/w        -> img/head/kernel
    transformer/embedder/mm_soft_embedding_norm/scale -> img/mm_soft_embedding_norm/scale
    SigLiPFromPatches_0/siglip_encoder/Transformer/encoderblock_N/...
    SigLiPFromPatches_0/siglip_encoder/{embedding,pos_embedding,head,...}

and this loader

- stacks per-layer / per-encoderblock arrays into the leading-depth axis
  nn.scan expects,
- renames ``_key_norm -> k_rmsnorm`` / ``_query_norm -> q_rmsnorm`` and
  drops the einsum ``/w`` nesting where our modules store bare arrays,
- routes the multimodal projection into the SigLIP head,
- bicubic-resizes the ViT position embeddings when the grid differs
  (e.g. 64x64 (896px) -> 16x16 (224px)),
- verifies parameter-count conservation (no key maps twice) before merging.
"""

from __future__ import annotations

import dataclasses
import logging
import re

import jax.numpy as jnp
import numpy as np

from lap_tpu.training.weight_loaders import flatten, merge_params, restore_params, unflatten

logger = logging.getLogger(__name__)

_LAYER_RE = re.compile(r"(?:^|/)layer_(\d+)/")
_ENCODERBLOCK_RE = re.compile(r"(?:^|/)Transformer_encoderblock_(\d+)/")


def _stack_by_index(flat: dict, pattern: re.Pattern, replacement: str) -> dict:
    """Collapse ``...<name>_N/...`` paths into stacked arrays with a leading
    depth axis, leaving other paths untouched."""
    grouped: dict[str, dict[int, np.ndarray]] = {}
    out: dict = {}
    for key, value in flat.items():
        m = pattern.search(key)
        if not m:
            out[key] = value
            continue
        idx = int(m.group(1))
        stacked_key = key[: m.start()] + ("/" if m.start() else "") + replacement + key[m.end() - 1 :]
        grouped.setdefault(stacked_key, {})[idx] = value
    for key, by_layer in grouped.items():
        depth = max(by_layer) + 1
        if len(by_layer) != depth:
            raise ValueError(f"missing layers for {key}: have {sorted(by_layer)}")
        out[key] = np.stack([np.asarray(by_layer[i]) for i in range(depth)], axis=0)
    return out


def stack_scan_layers(flat: dict) -> dict:
    """Collapse ``.../layer_N/...`` paths into stacked arrays with a leading
    depth axis, leaving other paths untouched."""
    return _stack_by_index(flat, _LAYER_RE, "layers")


def resize_pos_embedding(posemb: np.ndarray, target_tokens: int) -> np.ndarray:
    """Bicubic grid resize of learned ViT position embeddings [1, N, D]
    (reference weight_loaders.py:296-341)."""
    from scipy.ndimage import zoom

    posemb = np.asarray(posemb)
    n, d = posemb.shape[-2], posemb.shape[-1]
    side = int(round(n**0.5))
    target_side = int(round(target_tokens**0.5))
    if side == target_side:
        return posemb
    grid = posemb.reshape(side, side, d)
    factor = target_side / side
    resized = zoom(grid, (factor, factor, 1), order=3, mode="reflect")
    return resized.reshape(1, target_side * target_side, d).astype(posemb.dtype)


def remap_gemma3_export(flat: dict) -> dict:
    """Remap a flattened raw Gemma3 export to our model's flat key space
    (no merging; pure key/layout surgery)."""
    out: dict = {}
    for key, value in flat.items():
        key = key.removeprefix("params/")
        if key.startswith("transformer/embedder/mm_input_projection/w"):
            out["img/head/kernel"] = value
            continue
        if key.startswith("transformer/embedder/mm_input_projection/b"):
            out["img/head/bias"] = value
            continue
        if key.startswith("transformer/embedder/mm_soft_embedding_norm/"):
            out["img/" + key.removeprefix("transformer/embedder/")] = value
            continue
        if key.startswith("transformer/"):
            key = "llm/" + key.removeprefix("transformer/")
            key = key.replace("/_key_norm/", "/k_rmsnorm/")
            key = key.replace("/_query_norm/", "/q_rmsnorm/")
            # our Einsum modules store bare arrays, not {'w': ...}
            key = key.replace("/mlp/gating_einsum/w", "/mlp/gating_einsum")
            key = key.replace("/mlp/linear/w", "/mlp/linear")
            out[key] = value
            continue
        if key.startswith("SigLiPFromPatches_0/siglip_encoder/"):
            sub = key.removeprefix("SigLiPFromPatches_0/siglip_encoder/")
            sub = sub.replace("Transformer/encoder_norm/", "Transformer_encoder_norm/")
            sub = sub.replace("Transformer/encoderblock_", "Transformer_encoderblock_")
            out["img/" + sub] = value
            continue
        out[key] = value  # already in our namespace (e.g. re-export of a merge)
    # stack transformer layers and SigLIP encoder blocks
    out = _stack_by_index(out, _LAYER_RE, "layers")
    return _stack_by_index(out, _ENCODERBLOCK_RE, "Transformer_encoderblock")


@dataclasses.dataclass(frozen=True)
class Gemma3ScanCompatibleWeightLoader:
    params_path: str
    # Params not present in the source checkpoint keep fresh init (action
    # expert `_1` branches, projections, adaRMS Dense, LoRA).
    missing_regex: str = r".*(_1($|/).*|action_.*|time_mlp.*|state_proj.*|Dense_0.*|lora.*)"

    def load(self, params_shape: dict) -> dict:
        raw = restore_params(self.params_path)
        flat = flatten(raw)
        n_src = sum(int(np.prod(np.shape(v))) for v in flat.values())
        remapped = remap_gemma3_export(flat)

        # Position-embedding resize if the model uses a different grid.
        flat_shape = flatten(params_shape)
        for key in list(remapped.keys()):
            if key.endswith("pos_embedding") and key in flat_shape:
                want = flat_shape[key].shape[-2]
                have = np.asarray(remapped[key]).shape[-2]
                if want != have:
                    logger.info("resizing %s pos embedding %d -> %d tokens", key, have, want)
                    remapped[key] = resize_pos_embedding(np.asarray(remapped[key]), want)

        # Parameter-count conservation check (reference weight_loaders.py:598-620):
        # remapping must never duplicate a source array; pos-emb resize is the
        # only size-changing step, and extra source keys may be discarded.
        n_out = sum(int(np.prod(np.shape(v))) for k, v in remapped.items() if not k.endswith("pos_embedding"))
        n_src_no_pos = sum(
            int(np.prod(np.shape(v))) for k, v in flat.items() if not k.endswith("pos_embedding")
        )
        if n_out > n_src_no_pos:
            raise ValueError(
                f"gemma3 remap GAINED parameters ({n_src_no_pos:,} -> {n_out:,}): duplication bug"
            )
        logger.info(
            "gemma3 loader: %d source params, %d after remap (discarded %d)",
            n_src, n_out, n_src_no_pos - n_out,
        )
        remapped = {k: jnp.asarray(v) for k, v in remapped.items()}
        return merge_params(unflatten(remapped), params_shape, missing_regex=self.missing_regex)
