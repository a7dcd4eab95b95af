import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.models.lap_model import (
    LAPConfig,
    left_to_right_align,
    put_along_last_axis,
    posemb_sincos,
)
from lap_tpu.ops.masks import make_attn_mask

TINY = LAPConfig(
    dtype="float32",
    paligemma_variant="dummy",
    action_expert_variant="dummy",
    siglip_variant="dummy",
    action_dim=7,
    action_horizon=4,
    max_token_len=24,
    image_resolution=(56, 56),  # 4x4 = 16 tokens/cam with patch 14
    enable_action_training=True,
    enable_langact_training=True,
    pi05=True,
)


def _obs(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    obs = cfg.fake_obs(b)
    prompt = rng.integers(3, 200, (b, cfg.max_token_len)).astype(np.int32)
    langact = np.zeros((b, cfg.max_token_len), bool)
    langact[:, 10:] = True
    loss_mask = langact.copy()
    return obs.replace(
        images={k: jnp.asarray(rng.uniform(-1, 1, v.shape), jnp.float32) for k, v in obs.images.items()},
        state=jnp.asarray(rng.normal(size=(b, cfg.action_dim)), jnp.float32),
        tokenized_prompt=jnp.asarray(prompt),
        tokenized_langact_mask=jnp.asarray(langact),
        token_loss_mask=jnp.asarray(loss_mask),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = TINY.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    return model, params


def test_compute_loss(model_and_params):
    model, params = model_and_params
    obs = _obs(TINY)
    actions = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 7)), jnp.float32)
    loss, metrics = model.apply(
        params, jax.random.PRNGKey(0), obs, actions, train=True,
        method=model.compute_loss,
    )
    assert np.isfinite(float(loss))
    assert "lang_loss" in metrics and "action_loss" in metrics
    assert np.isfinite(float(metrics["lang_loss"]))
    assert np.isfinite(float(metrics["action_loss"]))


def test_loss_grads_flow(model_and_params):
    model, params = model_and_params
    obs = _obs(TINY)
    actions = jnp.zeros((2, 4, 7))

    def loss_fn(p):
        loss, _ = model.apply(
            p, jax.random.PRNGKey(0), obs, actions, train=False,
            method=model.compute_loss,
        )
        return loss

    g = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # Action expert and VLM both get gradient.
    gp = g["params"]
    assert np.abs(np.asarray(gp["action_out_proj"]["kernel"])).max() > 0
    assert np.abs(np.asarray(gp["llm"]["layers"]["mlp"]["gating_einsum"])).max() > 0


def test_sample_actions(model_and_params):
    model, params = model_and_params
    obs = _obs(TINY)
    acts = model.apply(
        params, jax.random.PRNGKey(0), obs, num_steps=3, method=model.sample_actions
    )
    assert acts.shape == (2, 4, 7)
    assert np.isfinite(np.asarray(acts)).all()


def test_sample_tokens(model_and_params):
    model, params = model_and_params
    obs = _obs(TINY)
    toks = model.apply(
        params, jax.random.PRNGKey(0), obs, max_decoding_steps=8,
        method=model.sample_tokens,
    )
    assert toks.shape == (2, 8)
    assert toks.dtype == jnp.int32


def test_sample_tokens_batched_rows_stop_at_eos(model_and_params):
    """With batch > 1 the decode loop runs until EVERY row finishes; rows
    that already emitted EOS must keep writing 0 (identical to the unwritten
    trailing slots of a single-request decode), not post-EOS continuation
    tokens (micro-batched AR serving relies on this)."""
    from lap_tpu.models import lap_model as _lm

    model, params = model_and_params
    obs = _obs(TINY, b=4, seed=3)
    # The random model's greedy argmax differs per row; redefine EOS as
    # row 0's first greedy token so row 0 finishes at step 0 while the other
    # rows keep decoding — fully deterministic staggered finishes. (The
    # greedy probe runs at the SAME max_decoding_steps: among the random
    # model's near-tied logits, argmax tie-breaking is shape-dependent.)
    greedy = np.asarray(
        model.apply(
            params, jax.random.PRNGKey(0), obs, max_decoding_steps=16,
            method=model.sample_tokens,
        )
    )
    eos_token = int(greedy[0, 0])
    # NOTE: EOS_TOKEN is a dataclass field — its default is baked into
    # __init__, so patching the class attribute would be a no-op.
    model2 = _lm.LAP(config=TINY, EOS_TOKEN=eos_token)
    toks = np.asarray(
        model2.apply(
            params, jax.random.PRNGKey(0), obs, max_decoding_steps=16,
            method=model2.sample_tokens,
        )
    )
    first_eos = []
    for row in toks:
        hits = np.nonzero(row == eos_token)[0]
        first_eos.append(int(hits[0]) if hits.size else None)
        if hits.size:
            assert (row[int(hits[0]) + 1 :] == 0).all(), (
                f"post-EOS tokens written: {row}"
            )
    # The scenario must actually exercise staggered finishes: row 0 done at
    # step 0 while at least one other row decodes past it.
    assert first_eos[0] == 0
    assert any(p is None or p > 0 for p in first_eos[1:]), first_eos
    assert toks.shape[1] == 16 and (toks[0, 1:] == 0).all()


def test_left_to_right_align():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 4, 2)
    mask = jnp.array([[True, True, False, False]])
    attn = make_attn_mask(mask, jnp.zeros_like(mask))
    x2, m2, a2 = left_to_right_align(x, mask, attn)
    np.testing.assert_array_equal(np.asarray(m2[0]), [False, False, True, True])
    np.testing.assert_allclose(np.asarray(x2[0, 2:]), np.asarray(x[0, :2]))
    # Attention restricted to valid right-aligned block.
    assert not np.asarray(a2)[0, :, :2].any()
    assert np.asarray(a2)[0, 2:, 2:].all()


def test_put_along_last_axis():
    arr = jnp.zeros((2, 5), jnp.int32)
    out = put_along_last_axis(arr, jnp.array([[1], [3]]), jnp.array([[7], [9]]))
    assert out[0, 1] == 7 and out[1, 3] == 9
    assert out.sum() == 16


def test_posemb_sincos():
    emb = posemb_sincos(jnp.array([0.5]), 32, 4e-3, 4.0)
    assert emb.shape == (1, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_uint8_images_match_prescaled_floats(model_and_params):
    """Wire-format invariance: the loader now ships uint8 images (4x fewer
    bytes over the host->device link) and preprocess_observation converts to
    [-1, 1] on device. A uint8 batch must produce the same loss and sampled
    actions as the equivalently-prescaled float batch."""
    model, params = model_and_params
    rng = np.random.default_rng(7)
    obs = _obs(TINY, b=2, seed=7)
    u8 = {
        k: np.asarray(rng.integers(0, 256, v.shape), np.uint8)
        for k, v in obs.images.items()
    }
    as_float = {k: jnp.asarray(v, jnp.float32) / 127.5 - 1.0 for k, v in u8.items()}
    obs_u8 = obs.replace(images={k: jnp.asarray(v) for k, v in u8.items()})
    obs_f = obs.replace(images=as_float)
    actions = jnp.asarray(rng.normal(size=(2, TINY.action_horizon, TINY.action_dim)), jnp.float32)

    def loss(o):
        l, _ = model.apply(
            params, jax.random.PRNGKey(1), o, actions, train=False,
            method=model.compute_loss,
        )
        return l

    np.testing.assert_allclose(np.asarray(loss(obs_u8)), np.asarray(loss(obs_f)), rtol=1e-6)

    def sample(o):
        return model.apply(
            params, jax.random.PRNGKey(2), o, num_steps=2,
            noise=jnp.zeros((2, TINY.action_horizon, TINY.action_dim)),
            method=model.sample_actions,
        )

    np.testing.assert_allclose(np.asarray(sample(obs_u8)), np.asarray(sample(obs_f)), rtol=1e-6)
