"""Pallas TPU int4 weight-only dequant-matmul for decode-bound serving.

Batch-1 AR decode reads every decode weight once per token, so its latency
is weight-bytes / HBM-bandwidth. The int8 kernel (``int8_matmul.py``)
halves the bf16 bytes; this kernel halves them AGAIN by packing two 4-bit
weights per byte.

MEASURED RESULT (v5e, BENCH_r05): int4 decode is SLOWER than int8 — 203 vs
245 tok/s (10.6 vs 12.5 Hz composed language-action rate). Halving the
streamed bytes did not halve the time because the kernel is no longer
bandwidth-bound: each grid step unpacks a ``[G, bn]`` int32 block with four
VPU shift ops and runs TWO MXU dots + two scale-multiplies where int8 runs
one, and at decode shapes (m=16 rows of real work) that VPU/MXU overhead
exceeds the ~2x byte saving. Do not re-attempt a pure-speed int4 decode on
this hardware without first making the unpack free (e.g. int4-native MXU
operands, unavailable to Pallas today). int4 remains worth shipping for
CAPACITY: the decode copy shrinks ~4x vs bf16 (~2x vs int8), which is what
lets a bf16-prefill + quantized-decode dual copy of gemma3_4b-class models
fit a single 16 GB chip (bf16+int8 needs ~14 GB — marginal; bf16+int4
~12 GB). Speed-wise int8 stays the recommended decode mode.

Because 4-bit rounding is too coarse for a per-output-channel scale on
transformer weights, quantization here is GROUP-WISE: the contraction axis
is split into groups of ``group_size`` rows and every (group, output
channel) pair gets its own scale (absmax/7, symmetric). The kernel applies
the scale to each group's f32 partial product inside the accumulation
loop, so the math is exactly ``sum_g (x_g @ w_g) * scale_g``.

Packing layout: the K rows are split into a low half ``[0, K/2)`` and a
high half ``[K/2, K)``; byte ``packed[i, n]`` holds row ``i`` in its low
nibble and row ``K/2 + i`` in its high nibble. Each grid step then loads
one contiguous packed block and contracts it against two strided x slices
— no interleaving in VMEM, and both nibbles sign-extend with two shifts.

No reference counterpart (lihzha/lap serves bf16 only); this is a
beyond-parity serving optimization stacked on the round-4 int8 mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _unpack_nibbles(packed):
    """int8 [Kp, N] -> (lo, hi) int32 values in [-8, 7] (quantize clips to
    [-7, 7]; the unpack itself is exact for the full nibble range)."""
    p = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(p, 24), 28)
    return lo, hi


def quantize_int4(w, group_size: int = 256) -> tuple[jax.Array, jax.Array]:
    """Group-wise symmetric int4 quantization of a 2-D weight matrix.

    Returns ``(packed, scales)`` with ``packed`` int8 ``[K/2, N]`` (two
    nibbles per byte, low half of K in the low nibble) and ``scales`` f32
    ``[K/group_size, N]``. Requires ``K % (2 * group_size) == 0`` so each
    packed half covers whole groups.
    """
    w = jnp.asarray(w)
    if w.ndim != 2:
        raise ValueError(f"expected 2-D weights, got {w.shape}")
    k, n = w.shape
    if group_size <= 0 or k % (2 * group_size):
        raise ValueError(f"K={k} must be a multiple of 2*group_size={2 * group_size}")
    wf = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scales = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scales), -7, 7).astype(jnp.int32).reshape(k, n)
    lo, hi = q[: k // 2], q[k // 2 :]
    b = ((hi & 0xF) << 4) | (lo & 0xF)
    packed = jnp.where(b >= 128, b - 256, b).astype(jnp.int8)
    return packed, scales.reshape(k // group_size, n)


def _pick_block(dim: int, candidates: tuple[int, ...]) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _kernel(x_lo_ref, x_hi_ref, wp_ref, s_ref, o_ref, acc_ref):
    k = pl.program_id(1)
    half_groups = pl.num_programs(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_nibbles(wp_ref[:])
    dt = x_lo_ref.dtype
    dims = (((1,), (0,)), ((), ()))
    part_lo = jax.lax.dot_general(
        x_lo_ref[:], lo.astype(dt), dims, preferred_element_type=jnp.float32
    )
    part_hi = jax.lax.dot_general(
        x_hi_ref[:], hi.astype(dt), dims, preferred_element_type=jnp.float32
    )
    # The scales block holds ALL group rows for this N block (its index map
    # is constant over k, so Pallas keeps it resident in VMEM); pick the
    # low-half and high-half group rows for this k step dynamically.
    s_lo = s_ref[pl.ds(k, 1), :]
    s_hi = s_ref[pl.ds(k + half_groups, 1), :]
    acc_ref[:] += part_lo * s_lo + part_hi * s_hi

    @pl.when(k == pl.num_programs(1) - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "force_kernel"))
def int4_matmul(
    x, w_packed, scales, *, block_n: int = 0, force_kernel: bool = False
):
    """``x @ dequant(w_packed, scales)`` with int4 weights streamed from HBM.

    x: [M, K] bf16/f32 (M small — the decode path), w_packed: [K/2, N] int8
    (two nibbles per byte), scales: [K/G, N] f32 group scales. Returns
    [M, N] in x.dtype. The k-grid step IS the quantization group: each step
    loads one packed block covering group ``ki`` (low nibbles) and group
    ``K/(2G) + ki`` (high nibbles) and scales both partials before
    accumulating.

    Off-TPU this computes the math-equal XLA expression instead of the
    interpreted kernel (same rationale as ``int8_matmul``); the parity
    tests run the kernel anyway via ``force_kernel=True``.
    """
    if _interpret() and not force_kernel:
        return int4_matmul_reference(x, w_packed, scales)
    m, kdim = x.shape
    kp, n = w_packed.shape
    groups, n2 = scales.shape
    if kdim != 2 * kp:
        raise ValueError(f"x K={kdim} does not match packed K/2={kp}")
    if n2 != n:
        raise ValueError(f"scales N={n2} != weights N={n}")
    if groups < 2 or groups % 2 or kp % (groups // 2):
        raise ValueError(
            f"scales rows ({groups}) must be even and divide K/2={kp}"
        )
    g = kdim // groups  # group size; the kernel's k block
    half_groups = groups // 2

    bn = block_n or _pick_block(n, (2048, 1024, 512, 256, 128))
    if n % bn:
        raise ValueError(f"block_n must divide N: {bn} vs {n}")
    m_tile = 16 if x.dtype == jnp.bfloat16 else 8
    m_pad = max(m_tile, -(-m // m_tile) * m_tile)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(n // bn, half_groups),
        in_specs=[
            pl.BlockSpec((m_pad, g), lambda ni, ki: (0, ki)),
            pl.BlockSpec((m_pad, g), lambda ni, ki: (0, ki + half_groups)),
            pl.BlockSpec((g, bn), lambda ni, ki: (ki, ni)),
            # All group rows for this N block; constant over k (resident).
            pl.BlockSpec((groups, bn), lambda ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda ni, ki: (0, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m_pad, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, x, w_packed, scales)
    return out[:m]


def int4_matmul_reference(x, w_packed, scales):
    """XLA oracle: the exact math (unpack, per-group scale, f32 matmul)."""
    kp, n = w_packed.shape
    k = 2 * kp
    g = k // scales.shape[0]
    lo, hi = _unpack_nibbles(w_packed)
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    sc = jnp.repeat(scales.astype(jnp.float32), g, axis=0)
    y = jnp.dot(x.astype(jnp.float32), w * sc)
    return y.astype(x.dtype)
