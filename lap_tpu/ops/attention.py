"""Attention dispatch: one interface, two implementations.

- ``xla``: reference einsum attention with float32 softmax — numerics match
  lihzha/lap ``gemma.py:235-271`` (mask constant -2.3819763e38). Used on CPU,
  for tiny shapes, and as the parity oracle in tests.
- ``flash``: the Pallas blockwise kernel (``flash_attention.py``) — the TPU
  production path for training.

Decode steps (query length 1-few vs a KV cache) stay on the XLA path: the
whole score matrix is tiny and XLA fuses it well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lap_tpu.ops.flash_attention import flash_attention

BIG_NEG = -2.3819763e38


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    scale: float | None = None,
) -> jnp.ndarray:
    """Reference einsum attention. q: [B,T,N,H]; k,v: [B,S,K,H]; mask [B,T,S]."""
    b, t, n, h = q.shape
    _, s, kh, _ = k.shape
    if scale is None:
        scale = h**-0.5
    g = n // kh
    q = q.reshape(b, t, kh, g, h)
    logits = jnp.einsum("BTKGH,BSKH->BKGTS", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(mask[:, None, None, :, :], logits, BIG_NEG)
    probs = jax.nn.softmax(logits, axis=-1).astype(k.dtype)
    out = jnp.einsum("BKGTS,BSKH->BTKGH", probs, v)
    return out.reshape(b, t, n, h)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    scale: float | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head (GQA) attention with a boolean mask (True = attend).

    impl: "auto" picks flash on TPU for non-trivial sequence lengths, xla
    otherwise. "flash" / "xla" force a path.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        # Flash pads queries to its 256-row block and head dims to the
        # 128-wide lane tiles: short-query decode (the 17-token flow-suffix
        # step) would waste ~15x query compute, and ragged head dims (e.g.
        # SigLIP's 72) waste ~1.8x everywhere — measured 6.4 ms (XLA) vs
        # 11.0 ms (flash) for the So400m forward on v5e. Keep those on XLA.
        impl = (
            "flash"
            if (on_tpu and q.shape[1] >= 192 and q.shape[-1] % 128 == 0)
            else "xla"
        )
    if impl == "flash":
        return flash_attention(q, k, v, mask, scale=scale)
    if impl == "xla":
        return xla_attention(q, k, v, mask, scale=scale)
    raise ValueError(f"unknown attention impl: {impl}")
