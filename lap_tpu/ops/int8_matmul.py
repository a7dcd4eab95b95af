"""Pallas TPU int8 weight-only dequant-matmul for decode-bound serving.

Batch-1 flow/AR decode is HBM weight-read bound (~90% of the bf16 floor,
see bench.py). Halving the weight bytes is the only remaining lever, but
the XLA expression ``x @ (w_i8.astype(bf16) * scale)`` measures just 1.15x
because the convert+scale materializes a bf16 copy of the weights in HBM.
This kernel streams the int8 blocks HBM->VMEM, converts in VMEM, and runs
the MXU dot per block — only int8 ever crosses HBM.

Quantization is symmetric per-output-channel (scale[n] = absmax_k/127),
the standard weight-only recipe; the matmul applies scales to the f32
accumulator on the last K step, which is exactly ``x @ (w * scale)``.

No reference counterpart (lihzha/lap serves bf16 only); this is a
beyond-parity serving optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def quantize_int8(w, axis: int = 0) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8 quantization of a 2-D weight matrix.

    Returns ``(w_i8, scales)`` with ``w ~= w_i8 * scales`` where scales
    broadcast along ``axis`` (the contraction axis: scales has one entry
    per OUTPUT channel).
    """
    w = jnp.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"expected 2-D weights, got {w.shape}")
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127).astype(jnp.int8)
    return w_i8, scales.squeeze(axis).astype(jnp.float32)


def _pick_block(dim: int, candidates: tuple[int, ...]) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wb = w_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == pl.num_programs(1) - 1)
    def _flush():
        o_ref[:] = (acc_ref[:] * s_ref[0, :][None, :]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "force_kernel")
)
def int8_matmul(
    x, w_i8, scales, *, block_n: int = 0, block_k: int = 0,
    force_kernel: bool = False,
):
    """``x @ (w_i8 * scales)`` with int8 weights streamed from HBM.

    x: [M, K] bf16/f32 (M small — the decode path), w_i8: [K, N] int8,
    scales: [N] f32. Returns [M, N] in x.dtype.

    Off-TPU this computes the math-equal XLA expression instead of the
    interpreted kernel: interpret mode walks the grid in Python (minutes
    for a 257k-column vocab projection), and CPU callers only need the
    quantized math, not the kernel schedule. ``force_kernel=True`` runs
    the kernel anyway (interpret mode off-TPU) — used by the kernel
    parity tests.
    """
    if _interpret() and not force_kernel:
        return int8_matmul_reference(x, w_i8, scales)
    m, kdim = x.shape
    k2, n = w_i8.shape
    assert kdim == k2 and scales.shape == (n,), (x.shape, w_i8.shape, scales.shape)

    bn = block_n or _pick_block(n, (2048, 1024, 512, 256, 128))
    bk = block_k or _pick_block(kdim, (2048, 1024, 512, 256, 128))
    if n % bn or kdim % bk:
        # Non-divisible explicit blocks would floor-divide the grid and leave
        # output columns unwritten (or skip the kernel entirely).
        raise ValueError(f"block sizes must divide (K, N): {(bk, bn)} vs {(kdim, n)}")
    # Pad M to the sublane tile for the x dtype.
    m_tile = 16 if x.dtype == jnp.bfloat16 else 8
    m_pad = max(m_tile, -(-m // m_tile) * m_tile)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    scales2d = scales.reshape(1, n)
    out = pl.pallas_call(
        _kernel,
        grid=(n // bn, kdim // bk),
        in_specs=[
            pl.BlockSpec((m_pad, bk), lambda ni, ki: (0, ki)),
            pl.BlockSpec((bk, bn), lambda ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, w_i8, scales2d)
    return out[:m]


def int8_matmul_reference(x, w_i8, scales):
    """XLA oracle: exact math the kernel must reproduce."""
    y = jnp.dot(x.astype(jnp.float32), w_i8.astype(jnp.float32))
    return (y * scales[None, :].astype(jnp.float32)).astype(x.dtype)
