"""Parity tests for the Pallas int4 weight-only dequant-matmul.

The kernel computes ``sum_g (x_g @ w_g) * scale_g`` with group-wise f32
scales applied inside the accumulation loop; the XLA oracle computes the
same dequantized matmul in one f32 dot. The two differ only in f32
summation order, so assertions are tight-tolerance — plus one exact test
with unit scales and integer activations where every intermediate is an
exactly-representable integer (bit-level proof of the nibble unpack).

No reference counterpart (lihzha/lap serves bf16 only); this kernel backs
the opt-in int4 serving mode that takes the AR language-action rate past
the 15 Hz bar int8 could not reach (see bench.py ar_int4_langact_hz).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.ops.int4_matmul import (
    int4_matmul,
    int4_matmul_reference,
    quantize_int4,
)


def _mk(m, k, n, g, seed=0, dtype=jnp.bfloat16):
    kw, kx = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.02
    x = jax.random.normal(kx, (m, k), dtype)
    packed, scales = quantize_int4(w, group_size=g)
    return x, w, packed, scales


@pytest.mark.parametrize(
    "m,k,n,g",
    [
        (1, 256, 512, 64),  # AR decode row
        (17, 512, 1024, 128),  # flow suffix rows
        (33, 384, 640, 64),  # odd M (pads to the sublane tile)
        (2, 128, 384, 32),  # N block == 128, tiny groups
        (64, 1024, 256, 256),  # wide-M dispatch boundary, 2 groups per half
    ],
)
def test_kernel_matches_oracle(m, k, n, g):
    x, _, packed, scales = _mk(m, k, n, g, seed=m)
    got = int4_matmul(x, packed, scales, force_kernel=True)
    want = int4_matmul_reference(x, packed, scales)
    assert got.dtype == x.dtype and got.shape == (m, n)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=2e-2,
        atol=1e-6,
    )


def test_kernel_exact_with_unit_scales_integer_x():
    """With scales == 1 and small-integer activations every product and sum
    is an exactly-representable integer: the kernel must match the oracle
    bit-for-bit, proving both nibbles sign-extend correctly."""
    k, n, g = 256, 384, 64
    rng = np.random.default_rng(5)
    q = rng.integers(-7, 8, (k, n)).astype(np.float32)
    packed, scales = quantize_int4(jnp.asarray(q), group_size=g)
    # absmax/7 scales of integer [-7,7] inputs are exact; force unit scales
    # so dequantized values equal the raw nibbles.
    scales = jnp.ones_like(scales)
    x = jnp.asarray(rng.integers(-4, 5, (3, k)), jnp.float32)
    got = int4_matmul(x, packed, scales, force_kernel=True)
    want = x @ jnp.asarray(q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_float32_activations():
    x, _, packed, scales = _mk(5, 256, 512, 128, seed=7, dtype=jnp.float32)
    got = int4_matmul(x, packed, scales, force_kernel=True)
    want = int4_matmul_reference(x, packed, scales)
    # f32 end to end, so only group-vs-flat summation order differs.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-6
    )


def test_quantize_int4_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(3), (512, 640), jnp.float32) * 0.05
    packed, scales = quantize_int4(w, group_size=128)
    assert packed.dtype == jnp.int8 and packed.shape == (256, 640)
    assert scales.shape == (4, 640)
    # Unpack and dequantize on the host.
    p = np.asarray(packed, np.int32)
    lo = (p << 28) >> 28
    hi = (p << 24) >> 28
    q = np.concatenate([lo, hi], axis=0)
    assert q.min() >= -7 and q.max() <= 7
    deq = q.astype(np.float32) * np.repeat(np.asarray(scales), 128, axis=0)
    # Symmetric group-wise: error bounded by scale/2 per element.
    err = np.abs(deq - np.asarray(w))
    bound = np.repeat(np.asarray(scales), 128, axis=0) / 2 + 1e-8
    assert (err <= bound).all()


def test_quantize_int4_zero_group_is_safe():
    w = np.zeros((128, 128), np.float32)
    w[:64, 0] = 1.0  # only the low-half group of column 0 is non-zero
    packed, scales = quantize_int4(jnp.asarray(w), group_size=64)
    assert np.isfinite(np.asarray(scales)).all()
    x = jnp.ones((1, 128), jnp.bfloat16)
    out = int4_matmul(x, packed, scales, force_kernel=True)
    out = np.asarray(out, np.float32)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[0, 1:], 0.0)
    assert out[0, 0] == 64.0


def test_shape_validation():
    x, _, packed, scales = _mk(2, 256, 512, 64, seed=1)
    with pytest.raises(ValueError, match="does not match packed"):
        int4_matmul(x[:, :128], packed, scales, force_kernel=True)
    with pytest.raises(ValueError, match="scales N"):
        int4_matmul(x, packed, scales[:, :256], force_kernel=True)
    with pytest.raises(ValueError, match="multiple of 2"):
        quantize_int4(jnp.zeros((100, 8)), group_size=64)
    with pytest.raises(ValueError, match="2-D"):
        quantize_int4(jnp.zeros((4, 4, 4)))


def test_cpu_fallback_is_reference():
    """Off-TPU, the public entry point computes the oracle expression."""
    x, _, packed, scales = _mk(3, 128, 256, 32, seed=9)
    if jax.default_backend() == "tpu":
        pytest.skip("fallback path is CPU-only")
    got = int4_matmul(x, packed, scales)
    want = int4_matmul_reference(x, packed, scales)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_int4_tighter_than_naive_per_channel():
    """Group-wise scales must beat one per-channel int4 scale on weights
    with outlier rows — the reason int4 mode is group-wise at all."""
    rng = np.random.default_rng(11)
    w = rng.normal(size=(512, 64)).astype(np.float32) * 0.02
    w[5] *= 100.0  # an outlier row blows up a per-channel absmax
    packed, scales = quantize_int4(jnp.asarray(w), group_size=64)
    p = np.asarray(packed, np.int32)
    q = np.concatenate([(p << 28) >> 28, (p << 24) >> 28], axis=0)
    deq_group = q.astype(np.float32) * np.repeat(np.asarray(scales), 64, axis=0)

    absmax = np.abs(w).max(axis=0, keepdims=True)
    s_pc = absmax / 7.0
    deq_pc = np.clip(np.round(w / s_pc), -7, 7) * s_pc

    mask = np.ones(len(w), bool)
    mask[5] = False  # compare error off the outlier row
    assert (
        np.abs(deq_group - w)[mask].mean() < 0.25 * np.abs(deq_pc - w)[mask].mean()
    )
