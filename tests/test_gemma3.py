import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.models import gemma3
from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.models.tokenizer import GEMMA3_IMAGE_TOKEN, Gemma3Tokenizer
from lap_tpu.ops import make_attn_mask

CFG = gemma3.get_config("gemma3_dummy")


def test_attention_pattern():
    cfg = gemma3.get_config("gemma3_4b")
    types = [cfg.get_attention_type(i) for i in range(12)]
    assert types[:6] == ["local"] * 5 + ["global"]
    assert types[6:12] == ["local"] * 5 + ["global"]


def test_variant_sizes():
    cfg = gemma3.get_config("gemma3_4b")
    assert (cfg.width, cfg.num_layers, cfg.num_heads, cfg.num_kv_heads) == (2560, 34, 8, 4)
    cfg = gemma3.get_config("gemma3_27b")
    assert (cfg.width, cfg.head_dim, cfg.num_layers) == (5376, 128, 62)


def _init_module(**kw):
    model = gemma3.Module(configs=[CFG, CFG], embed_dtype="float32", **kw)
    params = model.init(jax.random.PRNGKey(0), (False, True), method=model.init_params)
    return model, params


def test_forward_and_param_names():
    model, params = _init_module(adarms=True)
    b, t0, t1 = 2, 10, 4
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, t0, CFG.width))
    x1 = jax.random.normal(key, (b, t1, CFG.width))
    pos = jnp.tile(jnp.arange(t0 + t1)[None], (b, 1))
    mask = make_attn_mask(
        jnp.ones((b, t0 + t1), bool),
        jnp.tile(jnp.array([0] * t0 + [1] * t1)[None], (b, 1)),
    )
    cond = [None, jnp.zeros((b, CFG.width))]
    (o0, o1), cache = model.apply(params, [x0, x1], pos, mask, cond)
    assert o0.shape == x0.shape and o1.shape == x1.shape
    p = params["params"]["layers"]
    # Gemma3-specific param names.
    assert "q_rmsnorm" in p["attn"] and "k_rmsnorm" in p["attn"]
    assert "post_attention_norm" in p and "post_ffw_norm" in p
    # Transposed gating layout [2, H, F].
    assert p["mlp"]["gating_einsum"].shape == (CFG.num_layers, 2, CFG.hidden_dim, CFG.width)


def test_sliding_window_restricts_attention():
    """A local-layer query must not see keys beyond the window."""
    model, params = _init_module()
    b, t = 1, 12
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (b, t, CFG.width))
    pos = jnp.tile(jnp.arange(t)[None], (b, 1))
    mask = make_attn_mask(jnp.ones((b, t), bool), jnp.ones((b, t), jnp.int32))

    (out_full, _), _ = model.apply(params, [x, None], pos, mask, None)
    # Perturb the FIRST token: with window=4, outputs at position >= 5 in
    # local layers are independent of token 0, but global layers (every 6th)
    # still propagate it. So the full output SHOULD change (sanity) ...
    x2 = x.at[:, 0].add(10.0)
    (out_pert, _), _ = model.apply(params, [x2, None], pos, mask, None)
    assert np.abs(np.asarray(out_pert - out_full)).max() > 0

    # ... but with a single LOCAL layer only, far positions are unaffected.
    cfg_local = dataclasses.replace(CFG, num_layers=1, sliding_window_pattern=99)
    m2 = gemma3.Module(configs=[cfg_local], embed_dtype="float32")
    p2 = m2.init(jax.random.PRNGKey(0), (False,), method=m2.init_params)
    (a, ), _ = m2.apply(p2, [x], pos, mask, None)
    (bq, ), _ = m2.apply(p2, [x2], pos, mask, None)
    diff = np.abs(np.asarray(bq - a)).max(axis=-1)[0]
    assert diff[0] > 0  # perturbed token itself changes
    assert diff[5:].max() < 1e-5  # beyond window (4): unchanged


def test_image_bidir_attention():
    model, params = _init_module()
    b, t = 1, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, CFG.width))
    pos = jnp.tile(jnp.arange(t)[None], (b, 1))
    # Fully causal base mask; tokens 2-5 are "image" tokens.
    mask = make_attn_mask(jnp.ones((b, t), bool), jnp.ones((b, t), jnp.int32))
    img = jnp.zeros((b, t), bool).at[:, 2:6].set(True)
    (causal_out, _n1), _ = model.apply(params, [x, None], pos, mask, [None, None])
    (img_out, _n2), _ = model.apply(params, [x, None], pos, mask, [None, None], image_mask=img)
    # Image token 2 now attends forward to 3..5 -> its output changes.
    assert np.abs(np.asarray(img_out[0, 2] - causal_out[0, 2])).max() > 1e-6
    # Non-image token 0 before the image block is unchanged (causal, no new keys).
    np.testing.assert_allclose(np.asarray(img_out[0, 0]), np.asarray(causal_out[0, 0]), atol=1e-6)


def test_lap_gemma3_end_to_end():
    cfg = LAPConfig(
        dtype="float32",
        paligemma_variant="gemma3_dummy",
        action_expert_variant="gemma3_dummy",
        siglip_variant="dummy",
        action_dim=7,
        action_horizon=4,
        max_token_len=80,
        image_resolution=(56, 56),
        enable_action_training=True,
        enable_langact_training=True,
    )
    model = cfg.create_module()
    assert type(model).__name__ == "LAPGemma3"

    # Build an observation whose prompt embeds 16-token image placeholders
    # (dummy siglip on 56x56 -> 4x4=16 tokens/cam, 2 cams).
    b = 2
    obs = cfg.fake_obs(b)
    tok = np.full((b, cfg.max_token_len), 5, np.int32)
    tok[:, 0] = 2
    tok[:, 4:20] = GEMMA3_IMAGE_TOKEN
    tok[:, 24:40] = GEMMA3_IMAGE_TOKEN
    langact = np.zeros((b, cfg.max_token_len), bool)
    langact[:, 60:] = True
    obs = obs.replace(
        tokenized_prompt=jnp.asarray(tok),
        tokenized_langact_mask=jnp.asarray(langact),
        token_loss_mask=jnp.ones((b, cfg.max_token_len), bool),
    )
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    loss, metrics = model.apply(
        params, jax.random.PRNGKey(0), obs, cfg.fake_actions(b), train=False,
        method=model.compute_loss,
    )
    assert np.isfinite(float(loss))
    assert float(metrics["lang_loss"]) > 0

    acts = model.apply(
        params, jax.random.PRNGKey(0), obs, num_steps=2, method=model.sample_actions
    )
    assert acts.shape == (b, 4, 7) and np.isfinite(np.asarray(acts)).all()

    toks = model.apply(
        params, jax.random.PRNGKey(0), obs, max_decoding_steps=6, method=model.sample_tokens
    )
    assert toks.shape == (b, 6)


def test_lap_gemma3_batched_rows_stop_at_eos():
    """Gemma3-backbone twin of test_sample_tokens_batched_rows_stop_at_eos:
    rows that already emitted EOS must keep writing 0 while the coalesced
    batch's other rows finish (micro-batched AR serving relies on this)."""
    from lap_tpu.models.lap_gemma3 import LAPGemma3

    cfg = LAPConfig(
        dtype="float32",
        paligemma_variant="gemma3_dummy",
        action_expert_variant="gemma3_dummy",
        siglip_variant="dummy",
        action_dim=7,
        action_horizon=4,
        max_token_len=80,
        image_resolution=(56, 56),
        enable_action_training=True,
        enable_langact_training=True,
    )
    model = cfg.create_module()
    b = 4
    obs = cfg.fake_obs(b)
    tok = np.full((b, cfg.max_token_len), 5, np.int32)
    tok[:, 0] = 2
    tok[:, 4:20] = GEMMA3_IMAGE_TOKEN
    tok[:, 24:40] = GEMMA3_IMAGE_TOKEN
    # Vary the prompt per row so greedy continuations differ across rows.
    tok[:, 40] = 5 + np.arange(b)
    obs = obs.replace(tokenized_prompt=jnp.asarray(tok))
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    greedy = np.asarray(
        model.apply(
            params, jax.random.PRNGKey(0), obs, max_decoding_steps=12,
            method=model.sample_tokens,
        )
    )
    eos_token = int(greedy[0, 0])
    model2 = LAPGemma3(config=cfg, EOS_TOKEN=eos_token)
    toks = np.asarray(
        model2.apply(
            params, jax.random.PRNGKey(0), obs, max_decoding_steps=12,
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
    assert first_eos[0] == 0
    assert any(p is None or p > 0 for p in first_eos[1:]), first_eos


def test_lap_gemma3_init_params_fn_needs_placeholders():
    """init_params_fn must create all params even with placeholder images."""
    cfg = LAPConfig(
        dtype="float32",
        paligemma_variant="gemma3_dummy",
        action_expert_variant="gemma3_dummy",
        siglip_variant="dummy",
        action_dim=7,
        action_horizon=4,
        max_token_len=80,
        image_resolution=(56, 56),
        enable_action_training=True,
    )
    model = cfg.create_module()
    params = model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn)
    assert "img" in params["params"] and "llm" in params["params"]
    assert "action_out_proj" in params["params"]


def _dense_inputs(b, t0, t1, key=0):
    k = jax.random.PRNGKey(key)
    x0 = jax.random.normal(k, (b, t0, CFG.width))
    x1 = jax.random.normal(jax.random.fold_in(k, 1), (b, t1, CFG.width))
    pos = jnp.tile(jnp.arange(t0 + t1)[None], (b, 1))
    mask = make_attn_mask(
        jnp.ones((b, t0 + t1), bool),
        jnp.tile(jnp.array([0] * t0 + [1] * t1)[None], (b, 1)),
    )
    return x0, x1, pos, mask


def test_gemma3_prefill_then_ar_decode_matches_full_forward():
    """Cached single-token decode must reproduce the full forward pass —
    including the sliding-window mask reconstruction on local layers (the
    dummy config's window of 4 is crossed by the 9-token sequence)."""
    model = gemma3.Module(configs=[CFG], embed_dtype="float32")
    b, t0, steps = 1, 7, 2
    t = t0 + steps
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (b, t, CFG.width))
    pos = jnp.tile(jnp.arange(t)[None], (b, 1))
    full_mask = make_attn_mask(
        jnp.ones((b, t), bool), jnp.tile(jnp.ones(t, jnp.int32)[None], (b, 1))
    )
    params = model.init(jax.random.PRNGKey(0), (False,), method=model.init_params)

    (full_out,), _ = model.apply(params, [x], pos, full_mask)

    pre_mask = jnp.pad(full_mask[:, :t0, :t0], ((0, 0), (0, 0), (0, steps)))
    (pre_out,), cache = model.apply(params, [x[:, :t0]], pos[:, :t0], pre_mask)
    np.testing.assert_allclose(
        np.asarray(pre_out), np.asarray(full_out[:, :t0]), atol=1e-5, rtol=1e-5
    )
    for step in range(steps):
        i = t0 + step
        (step_out,), cache = model.apply(
            params, [x[:, i : i + 1]], pos[:, i : i + 1], full_mask[:, i : i + 1, :],
            kv_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(step_out[:, 0]), np.asarray(full_out[:, i]),
            atol=1e-5, rtol=1e-5,
        )


def test_gemma3_suffix_decode_matches_full_forward():
    """Flow-matching pattern on the Gemma3 backbone: prefill expert-0, run
    the expert-1 suffix against the cache; numerics must match the joint
    forward (sliding windows active across the prefix/suffix boundary)."""
    model = gemma3.Module(configs=[CFG, CFG], embed_dtype="float32")
    b, t0, t1 = 1, 7, 3
    x0, x1, pos, mask = _dense_inputs(b, t0, t1, key=5)
    params = model.init(jax.random.PRNGKey(0), (False, False), method=model.init_params)

    (_, full1), _ = model.apply(params, [x0, x1], pos, mask)

    pre_mask = mask[:, :t0, :t0]
    _, cache = model.apply(params, [x0, None], pos[:, :t0], pre_mask)
    suf_mask = mask[:, t0:, :]
    (_, suf_out), _ = model.apply(
        params, [None, x1], pos[:, t0:], suf_mask, kv_cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(suf_out), np.asarray(full1), atol=1e-5, rtol=1e-5
    )
