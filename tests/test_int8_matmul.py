"""Parity tests for the Pallas int8 weight-only dequant-matmul.

The kernel must reproduce ``x @ (w_i8 * scales)`` exactly (the dequant
happens in VMEM; the f32 accumulator applies scales on the last K step),
so it is tested bit-for-bit against the XLA oracle in interpret mode.

No reference counterpart (lihzha/lap serves bf16 only); this kernel backs
the opt-in int8 serving mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.ops.int8_matmul import (
    int8_matmul,
    int8_matmul_reference,
    quantize_int8,
)


def _mk(m, k, n, seed=0, dtype=jnp.bfloat16):
    kw, kx = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.02
    x = jax.random.normal(kx, (m, k), dtype)
    w_i8, scales = quantize_int8(w, axis=0)
    return x, w_i8, scales


@pytest.mark.parametrize(
    "m,k,n",
    [
        (1, 256, 512),  # AR decode row
        (17, 512, 1024),  # flow suffix rows
        (33, 384, 640),  # odd M (pads to the sublane tile)
        (2, 128, 384),  # N block == 128
        (64, 1024, 256),  # wide-M dispatch boundary
    ],
)
def test_kernel_matches_oracle_bitwise(m, k, n):
    x, w_i8, scales = _mk(m, k, n, seed=m)
    got = int8_matmul(x, w_i8, scales, force_kernel=True)
    want = int8_matmul_reference(x, w_i8, scales)
    assert got.dtype == x.dtype and got.shape == (m, n)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_kernel_float32_activations():
    x, w_i8, scales = _mk(5, 256, 512, seed=7, dtype=jnp.float32)
    got = int8_matmul(x, w_i8, scales, force_kernel=True)
    want = int8_matmul_reference(x, w_i8, scales)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_int8_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(3), (384, 640), jnp.float32) * 0.05
    w_i8, scales = quantize_int8(w, axis=0)
    assert w_i8.dtype == jnp.int8 and scales.shape == (640,)
    deq = np.asarray(w_i8, np.float32) * np.asarray(scales)[None, :]
    # Symmetric per-channel: error bounded by scale/2 per element.
    err = np.abs(deq - np.asarray(w))
    bound = np.asarray(scales)[None, :] / 2 + 1e-8
    assert (err <= bound).all()


def test_quantize_int8_zero_column_is_safe():
    w = np.zeros((64, 128), np.float32)
    w[:, 0] = 1.0
    w_i8, scales = quantize_int8(jnp.asarray(w), axis=0)
    assert np.isfinite(np.asarray(scales)).all()
    x = jnp.ones((1, 64), jnp.bfloat16)
    out = int8_matmul(x, w_i8, scales, force_kernel=True)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # All-zero columns decode to exactly zero.
    np.testing.assert_array_equal(np.asarray(out, np.float32)[0, 1:], 0.0)


def test_non_divisible_n_falls_back_to_full_block():
    # N=200 has no candidate divisor -> single N block of 200 (lane-padded
    # inside Mosaic/interpret); the math must still be exact.
    x, w_i8, scales = _mk(3, 256, 200, seed=11)
    got = int8_matmul(x, w_i8, scales, force_kernel=True)
    want = int8_matmul_reference(x, w_i8, scales)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )
