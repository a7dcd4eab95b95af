import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.ops import (
    apply_rope,
    flash_attention,
    make_attn_mask,
    sliding_window_mask,
    xla_attention,
)

# On CPU the Pallas TPU kernels run in interpret mode.
INTERPRET = jax.default_backend() != "tpu"

if INTERPRET:
    from jax.experimental.pallas import tpu as pltpu

    _ctx = pltpu.force_tpu_interpret_mode
else:
    import contextlib

    _ctx = contextlib.nullcontext


def _rand_qkv(key, b, t, s, n, kh, h, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, n, h), dtype)
    k = jax.random.normal(kk, (b, s, kh, h), dtype)
    v = jax.random.normal(kv, (b, s, kh, h), dtype)
    return q, k, v


def test_make_attn_mask():
    input_mask = jnp.array([[1, 1, 1, 1, 0]], dtype=bool)
    # Segments: [0,0] bidirectional prefix, then tokens 2,3 causal.
    mask_ar = jnp.array([[0, 0, 1, 1, 1]], dtype=jnp.int32)
    m = make_attn_mask(input_mask, mask_ar)
    expected = np.array(
        [
            [1, 1, 0, 0, 0],
            [1, 1, 0, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 1, 0],
            [1, 1, 1, 1, 0],  # padding row (unused), padding col always 0
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(np.asarray(m[0]), expected)


def test_sliding_window_mask():
    pos = jnp.arange(6)[None, :]
    m = sliding_window_mask(pos, pos, window=2)
    # q at position i can see kv positions j with i - j < 2
    assert bool(m[0, 3, 2]) and bool(m[0, 3, 3])
    assert not bool(m[0, 3, 1])


@pytest.mark.parametrize("gqa", [1, 4])
def test_flash_matches_xla(gqa):
    key = jax.random.PRNGKey(0)
    b, t, s, kh, h = 2, 192, 192, 2, 64
    n = kh * gqa
    q, k, v = _rand_qkv(key, b, t, s, n, kh, h)
    input_mask = jnp.arange(s)[None, :] < jnp.array([s, s - 37])[:, None]
    mask_ar = jnp.tile((jnp.arange(s) % 3 == 0)[None, :], (b, 1))
    mask = make_attn_mask(input_mask, mask_ar)

    ref = xla_attention(q, k, v, mask)
    with _ctx():
        out = flash_attention(q, k, v, mask)
    # Compare only valid query rows; padded/invalid rows differ by design
    # (flash yields ~uniform-free zeros, xla yields uniform mixtures).
    valid = np.asarray(input_mask)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], atol=2e-5, rtol=2e-5
    )


def test_flash_fully_masked_rows_zero():
    key = jax.random.PRNGKey(1)
    b, t, s, n, h = 1, 128, 128, 2, 64
    q, k, v = _rand_qkv(key, b, t, s, n, n, h)
    mask = jnp.zeros((b, t, s), dtype=bool)
    with _ctx():
        out = flash_attention(q, k, v, mask)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_flash_grads_match_xla():
    key = jax.random.PRNGKey(2)
    b, t, s, kh, h = 1, 128, 128, 2, 32
    n = 4
    q, k, v = _rand_qkv(key, b, t, s, n, kh, h)
    input_mask = jnp.arange(s)[None, :] < s - 17
    mask_ar = jnp.tile((jnp.arange(s) % 5 == 0)[None, :], (b, 1))
    mask = make_attn_mask(input_mask, mask_ar)

    def loss_flash(q, k, v):
        with _ctx():
            out = flash_attention(q, k, v, mask)
        return jnp.sum(jnp.where(input_mask[:, :, None, None], out, 0.0) ** 2)

    def loss_xla(q, k, v):
        out = xla_attention(q, k, v, mask)
        return jnp.sum(jnp.where(input_mask[:, :, None, None], out, 0.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4)


def test_flash_nonaligned_shapes():
    # T, S, H none of which are multiples of the block sizes.
    key = jax.random.PRNGKey(3)
    b, t, s, kh, h = 2, 100, 75, 2, 72  # h=72 is the SigLIP head dim
    n = 4
    q, k, v = _rand_qkv(key, b, t, s, n, kh, h)
    input_mask = jnp.ones((b, s), dtype=bool)
    mask = jnp.tile(
        (jnp.arange(s)[None, :] <= jnp.arange(t)[:, None])[None], (b, 1, 1)
    )
    ref = xla_attention(q, k, v, mask)
    with _ctx():
        out = flash_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_rope_rotation_properties():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 8))
    pos = jnp.arange(4)[None, :]
    y = apply_rope(x, pos)
    # Position 0 is identity.
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(x[0, 0]), atol=1e-6)
    # Norm preserved per pair.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
