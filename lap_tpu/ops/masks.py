"""Attention-mask construction.

Semantics match the reference stack (openpi ``make_attn_mask`` as used at
lihzha/lap ``src/lap/models/lap.py:347`` and the Gemma3 sliding-window /
bidirectional-image logic at ``src/lap/models/backbones/gemma3.py:722-760``),
expressed as boolean masks (True = may attend). The Pallas flash kernels
consume these same boolean masks blockwise, so no fp32 logit-sized tensor is
ever materialized.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_attn_mask(input_mask: jnp.ndarray, mask_ar: jnp.ndarray) -> jnp.ndarray:
    """Build a [B, T, T] attention mask from per-token metadata.

    Tokens are grouped into segments by the cumulative sum of ``mask_ar``:
    ``mask_ar[i] = True`` starts a new autoregressive segment at token i;
    tokens within the same segment attend bidirectionally, and each segment
    attends causally to all earlier segments. ``input_mask`` marks valid
    (non-padding) tokens; padding can never be attended to.

    Args:
        input_mask: [B, T] bool, True for real tokens.
        mask_ar: [B, T] bool/int, segment-start flags.

    Returns:
        [B, T, T] bool, ``out[b, i, j]`` True if query i may attend key j.
    """
    mask_ar = mask_ar.astype(jnp.int32)
    cumsum = jnp.cumsum(mask_ar, axis=-1)
    attn = cumsum[:, None, :] <= cumsum[:, :, None]
    return attn & input_mask[:, None, :]


def sliding_window_mask(
    q_positions: jnp.ndarray, kv_positions: jnp.ndarray, window: int
) -> jnp.ndarray:
    """[B, T, S] mask allowing attention only within ``window`` positions back.

    Matches Gemma3 local attention: key position must satisfy
    ``q_pos - window < kv_pos`` (and the base mask already enforces
    ``kv_pos <= q_pos`` where causal).
    """
    diff = q_positions[:, :, None] - kv_positions[:, None, :]
    return diff < window


def bidirectional_block_mask(
    q_flags: jnp.ndarray, kv_flags: jnp.ndarray
) -> jnp.ndarray:
    """[B, T, S] mask True where both tokens carry the flag (e.g. same-image
    tokens attending bidirectionally); OR this into a causal base mask."""
    return q_flags[:, :, None] & kv_flags[:, None, :]


def combine_masks(*masks: jnp.ndarray | None) -> jnp.ndarray | None:
    """AND together masks, skipping Nones."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else (out & m)
    return out
