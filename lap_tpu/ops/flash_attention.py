"""Pallas TPU flash attention (training forward + backward).

Replaces the reference's materialized ``[B, K, G, T, S]`` float32 attention
logits (lihzha/lap ``gemma.py:235-271``, ``gemma3.py:645-698``) with a
blockwise online-softmax kernel. Numerics preserved: logits and softmax in
float32, boolean masks (True = attend), bfloat16 inputs/outputs.

Design notes (TPU-first):
- Grid iterates (batch, q_head, q_block, kv_block) with the kv_block as the
  innermost sequential reduction; running max / sum / accumulator live in
  VMEM scratch and the output block is written once on the last kv step.
- GQA is expressed through BlockSpec index maps (kv head = q head // group),
  never by materializing repeated K/V.
- The boolean mask is streamed blockwise from HBM: O(T*S) bytes of int8
  instead of O(N*T*S) float32 logits. Fully-masked query rows produce zeros
  (not NaN) in both forward and backward.
- Backward recomputes logits blockwise (flash-style) in two kernels: dQ
  (reduce over kv blocks) and dK/dV (reduce over q blocks), using the saved
  logsumexp. For GQA, per-query-head dK/dV partials are summed in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on TPU v5e (B=4, T=1024, N=8, H=256): (256, 512) gives 1.8x over the
# XLA einsum path forward and beats it on fwd+bwd as well.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_KV = 512
_NEG_INF = -2.3819763e38  # reference mask constant (gemma.py:258)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    # Pallas TPU kernels only compile on TPU; elsewhere (CPU tests) run the
    # interpreter so the same code path is exercised everywhere.
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,  # [1, 1, bq, H]
    k_ref,  # [1, 1, bk, H]
    v_ref,  # [1, 1, bk, H]
    mask_ref,  # [1, bq, bk] int8
    out_ref,  # [1, 1, bq, H]
    lse_ref,  # [1, 1, 1, bq]
    m_scratch,  # [bq, 128] f32
    l_scratch,  # [bq, 128] f32
    acc_scratch,  # [bq, H] f32
    *,
    scale: float,
    num_kv_blocks: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0] != 0

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scratch[:, 0:1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # Guard fully-masked rows: exp(-inf - -inf) would be NaN.
    safe_m = jnp.where(m_new <= _NEG_INF / 2, 0.0, m_new)
    p = jnp.exp(jnp.where(mask, s - safe_m, _NEG_INF))
    correction = jnp.exp(jnp.where(m_prev <= _NEG_INF / 2, _NEG_INF, m_prev - safe_m))

    l_prev = l_scratch[:, 0:1]
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scratch[:] = acc_scratch[:] * correction + pv
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        l = l_scratch[:, 0:1]
        denom = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scratch[:] / denom).astype(out_ref.dtype)
        m = m_scratch[:, 0:1]
        lse = jnp.where(m <= _NEG_INF / 2, _NEG_INF, m + jnp.log(denom))
        lse_ref[0, 0] = lse.reshape(1, -1)


def _flash_forward(q, k, v, mask, scale, block_q, block_kv):
    """q: [B,N,T,H]; k,v: [B,K,S,H]; mask: [B,T,S] bool. Returns out, lse."""
    b, n, t, h = q.shape
    _, kh, s, _ = k.shape
    group = n // kh
    t_pad, s_pad, h_pad = _ceil_to(t, block_q), _ceil_to(s, block_kv), _ceil_to(h, 128)

    q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, h_pad - h)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s), (0, h_pad - h)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s), (0, h_pad - h)))
    mask_i8 = jnp.pad(
        mask.astype(jnp.int8), ((0, 0), (0, t_pad - t), (0, s_pad - s))
    )

    num_q_blocks = t_pad // block_q
    num_kv_blocks = s_pad // block_kv
    grid = (b, n, num_q_blocks, num_kv_blocks)

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, num_kv_blocks=num_kv_blocks
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, h_pad), lambda b_, n_, i, j: (b_, n_, i, 0)),
            pl.BlockSpec(
                (1, 1, block_kv, h_pad), lambda b_, n_, i, j: (b_, n_ // group, j, 0)
            ),
            pl.BlockSpec(
                (1, 1, block_kv, h_pad), lambda b_, n_, i, j: (b_, n_ // group, j, 0)
            ),
            pl.BlockSpec((1, block_q, block_kv), lambda b_, n_, i, j: (b_, i, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, h_pad), lambda b_, n_, i, j: (b_, n_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, i, j: (b_, n_, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, t_pad, h_pad), q.dtype),
            jax.ShapeDtypeStruct((b, n, 1, t_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, h_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, mask_i8)
    return out[:, :, :t, :h], lse[:, :, 0, :t]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scratch,
    *,
    scale: float,
    num_kv_blocks: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0] != 0
    lse = lse_ref[0, 0].reshape(-1, 1)
    delta = delta_ref[0, 0].reshape(-1, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    safe_lse = jnp.where(lse <= _NEG_INF / 2, 0.0, lse)
    p = jnp.where(mask, jnp.exp(s - safe_lse), 0.0)
    p = jnp.where(lse <= _NEG_INF / 2, 0.0, p)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq_scratch[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(j == num_kv_blocks - 1)
    def _finish():
        dq_ref[0, 0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *,
    scale: float,
    num_q_blocks: int,
):
    i = pl.program_id(3)

    @pl.when(i == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    mask = mask_ref[0] != 0  # [bq, bk]
    lse = lse_ref[0, 0].reshape(-1, 1)
    delta = delta_ref[0, 0].reshape(-1, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    safe_lse = jnp.where(lse <= _NEG_INF / 2, 0.0, lse)
    p = jnp.where(mask, jnp.exp(s - safe_lse), 0.0)
    p = jnp.where(lse <= _NEG_INF / 2, 0.0, p)

    dv_scratch[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dk_scratch[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(i == num_q_blocks - 1)
    def _finish():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_backward(res, grads, scale, block_q, block_kv):
    q, k, v, mask, out, lse = res
    do = grads
    b, n, t, h = q.shape
    _, kh, s, _ = k.shape
    group = n // kh
    t_pad, s_pad, h_pad = _ceil_to(t, block_q), _ceil_to(s, block_kv), _ceil_to(h, 128)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - t), (0, h_pad - h)))
    k_p = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - s), (0, h_pad - h)))
    v_p = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - s), (0, h_pad - h)))
    do_p = jnp.pad(do, ((0, 0), (0, 0), (0, t_pad - t), (0, h_pad - h)))
    mask_i8 = jnp.pad(mask.astype(jnp.int8), ((0, 0), (0, t_pad - t), (0, s_pad - s)))
    # Padded query rows: lse = -inf so p = 0 everywhere -> no gradient.
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, t_pad - t)), constant_values=_NEG_INF)
    lse_p = lse_p.reshape(b, n, 1, t_pad)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, t_pad - t))).reshape(b, n, 1, t_pad)

    num_q_blocks = t_pad // block_q
    num_kv_blocks = s_pad // block_kv

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_kv_blocks=num_kv_blocks),
        grid=(b, n, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, h_pad), lambda b_, n_, i, j: (b_, n_, i, 0)),
            pl.BlockSpec((1, 1, block_kv, h_pad), lambda b_, n_, i, j: (b_, n_ // group, j, 0)),
            pl.BlockSpec((1, 1, block_kv, h_pad), lambda b_, n_, i, j: (b_, n_ // group, j, 0)),
            pl.BlockSpec((1, block_q, block_kv), lambda b_, n_, i, j: (b_, i, j)),
            pl.BlockSpec((1, 1, block_q, h_pad), lambda b_, n_, i, j: (b_, n_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, i, j: (b_, n_, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, i, j: (b_, n_, 0, i)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, h_pad), lambda b_, n_, i, j: (b_, n_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, t_pad, h_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, h_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_p, k_p, v_p, mask_i8, do_p, lse_p, delta_p)

    # dK/dV per query head; GQA partials summed afterwards in XLA.
    dk_pern, dv_pern = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, num_q_blocks=num_q_blocks),
        grid=(b, n, num_kv_blocks, num_q_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, h_pad), lambda b_, n_, j, i: (b_, n_, i, 0)),
            pl.BlockSpec((1, 1, block_kv, h_pad), lambda b_, n_, j, i: (b_, n_ // group, j, 0)),
            pl.BlockSpec((1, 1, block_kv, h_pad), lambda b_, n_, j, i: (b_, n_ // group, j, 0)),
            pl.BlockSpec((1, block_q, block_kv), lambda b_, n_, j, i: (b_, i, j)),
            pl.BlockSpec((1, 1, block_q, h_pad), lambda b_, n_, j, i: (b_, n_, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, j, i: (b_, n_, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, n_, j, i: (b_, n_, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, h_pad), lambda b_, n_, j, i: (b_, n_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, h_pad), lambda b_, n_, j, i: (b_, n_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, s_pad, h_pad), k.dtype),
            jax.ShapeDtypeStruct((b, n, s_pad, h_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, h_pad), jnp.float32),
            pltpu.VMEM((block_kv, h_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q_p, k_p, v_p, mask_i8, do_p, lse_p, delta_p)

    dq = dq[:, :, :t, :h]
    dk = dk_pern.reshape(b, kh, group, s_pad, h_pad).sum(axis=2)[:, :, :s, :h]
    dv = dv_pern.reshape(b, kh, group, s_pad, h_pad).sum(axis=2)[:, :, :s, :h]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention(q, k, v, mask, scale, block_q, block_kv):
    out, _ = _flash_forward(q, k, v, mask, scale, block_q, block_kv)
    return out


def _fwd_rule(q, k, v, mask, scale, block_q, block_kv):
    out, lse = _flash_forward(q, k, v, mask, scale, block_q, block_kv)
    return out, (q, k, v, mask, out, lse)


def _bwd_rule(scale, block_q, block_kv, res, g):
    return _flash_backward(res, g, scale, block_q, block_kv)


_flash_attention.defvjp(_fwd_rule, _bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
) -> jnp.ndarray:
    """Flash attention with a streamed boolean mask.

    Args:
        q: [B, T, N, H] queries.
        k, v: [B, S, K, H] keys/values; N must be a multiple of K (GQA).
        mask: [B, T, S] bool, True = may attend. Fully-masked query rows
            yield zeros.
        scale: logit scale; defaults to H**-0.5.

    Returns:
        [B, T, N, H] in the dtype of ``q``.
    """
    h = q.shape[-1]
    if scale is None:
        scale = h**-0.5
    # Short-sequence shape tuning: when the whole KV side fits one block,
    # take it in one pass (no cross-block online-softmax rescale) with
    # narrower query tiles — measured ~2x on the LAP prefill shape
    # (T=S=768, 8 heads, H=256) vs the generic (256, 512) blocks.
    if (
        block_q == DEFAULT_BLOCK_Q
        and block_kv == DEFAULT_BLOCK_KV
        and k.shape[1] <= 768
    ):
        block_kv = max(-(-k.shape[1] // 128) * 128, 128)
        block_q = 128
    # Kernel-internal layout is [B, heads, seq, H].
    q_t = jnp.swapaxes(q, 1, 2)
    k_t = jnp.swapaxes(k, 1, 2)
    v_t = jnp.swapaxes(v, 1, 2)
    out = _flash_attention(q_t, k_t, v_t, mask, float(scale), block_q, block_kv)
    return jnp.swapaxes(out, 1, 2)
