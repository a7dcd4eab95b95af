"""Rotary position embeddings.

Numerics follow the reference (lihzha/lap ``gemma.py:548-564``): timescales
``base ** (2i / H)``, rotation applied in float32, result cast back to the
input dtype. Gemma3 uses a dual base (10k local / 1M global) selected per
layer (``gemma3.py:562``).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_rope(
    x: jnp.ndarray, positions: jnp.ndarray, *, base: float = 10_000.0
) -> jnp.ndarray:
    """Rotate pairs of channels by position-dependent angles.

    Args:
        x: [B, T, N, H] with H even.
        positions: [B, T] int positions.
        base: RoPE wavelength base.

    Returns:
        Same shape/dtype as ``x``.
    """
    b, t, n, h = x.shape
    half = h // 2
    freq_exponents = (2.0 / h) * jnp.arange(half, dtype=jnp.float32)
    timescale = base**freq_exponents
    radians = positions[..., None].astype(jnp.float32) / timescale[None, None, :]
    radians = radians[..., None, :]  # [B, T, 1, half]
    sin, cos = jnp.sin(radians), jnp.cos(radians)
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return rotated.astype(x.dtype)
