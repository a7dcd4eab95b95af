"""int8 weight-only serving path: unscanned layers + quantized decode.

Covers the pieces behind ``create_trained_policy(..., quantize="int8")``:
- ``gemma.unstack_layer_params`` converts a scan-stacked checkpoint tree
  into the per-layer layout of ``scan_layers=False`` and the unscanned
  module reproduces the scanned module's outputs exactly,
- the "quant" variable collection is populated from restored params and
  decode-shaped matmuls route through the Pallas int8 kernel with bounded
  numeric drift,
- quantization is serving-only opt-in (scanned + quant is rejected).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.models import gemma as _gemma
from lap_tpu.models import lora as _lora
from lap_tpu.models.lap_model import LAPConfig

TINY = LAPConfig(
    dtype="float32",
    paligemma_variant="dummy",
    action_expert_variant="dummy",
    siglip_variant="dummy",
    action_dim=7,
    action_horizon=4,
    max_token_len=24,
    image_resolution=(56, 56),
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
    return obs.replace(
        images={
            k: jnp.asarray(rng.uniform(-1, 1, v.shape), jnp.float32)
            for k, v in obs.images.items()
        },
        state=jnp.asarray(rng.normal(size=(b, cfg.action_dim)), jnp.float32),
        tokenized_prompt=jnp.asarray(prompt),
        tokenized_langact_mask=jnp.asarray(langact),
        token_loss_mask=jnp.asarray(langact),
    )


@pytest.fixture(scope="module")
def scanned():
    model = TINY.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    # Perturb every leaf away from its init: the adaptive-RMSNorm gates are
    # zero-initialized, which multiplies each block's contribution by 0 and
    # would make any weight-path comparison vacuously pass.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
        for v, k in zip(leaves, keys)
    ]
    return model, jax.tree_util.tree_unflatten(treedef, leaves)


def _unstacked_params(params, depth):
    p = dict(params["params"])
    p["llm"] = _gemma.unstack_layer_params(dict(p["llm"]), depth)
    return p


def test_unscanned_matches_scanned_sample_actions(scanned):
    model, params = scanned
    cfg_u = dataclasses.replace(TINY, scan_layers=False)
    model_u = cfg_u.create_module()
    p_u = _unstacked_params(params, TINY.backbone_depth)

    obs = _obs(TINY)
    noise = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, TINY.action_horizon, TINY.action_dim)),
        jnp.float32,
    )
    a_s = model.apply(
        params, jax.random.PRNGKey(1), obs, noise=noise, method=model.sample_actions
    )
    a_u = model_u.apply(
        {"params": p_u}, jax.random.PRNGKey(1), obs, noise=noise,
        method=model_u.sample_actions,
    )
    np.testing.assert_allclose(
        np.asarray(a_u), np.asarray(a_s), rtol=0, atol=1e-5
    )


def test_unscanned_matches_scanned_sample_tokens(scanned):
    model, params = scanned
    cfg_u = dataclasses.replace(TINY, scan_layers=False)
    model_u = cfg_u.create_module()
    p_u = _unstacked_params(params, TINY.backbone_depth)

    obs = _obs(TINY, b=1, seed=3)
    kw = dict(max_decoding_steps=8, temperature=0.0, stop_on_eos=False)
    t_s = model.apply(
        params, jax.random.PRNGKey(2), obs, method=model.sample_tokens, **kw
    )
    t_u = model_u.apply(
        {"params": p_u}, jax.random.PRNGKey(2), obs, method=model_u.sample_tokens, **kw
    )
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_u))


def test_unstack_layer_params_values_conserved(scanned):
    _, params = scanned
    depth = TINY.backbone_depth
    llm = dict(params["params"]["llm"])
    out = _gemma.unstack_layer_params(llm, depth)
    assert "layers" not in out
    flat_stacked = jax.tree.leaves(llm["layers"])
    flat_unstacked = [jax.tree.leaves(out[f"layers_{i}"]) for i in range(depth)]
    for stacked, *_ in [(flat_stacked,)]:
        for j, leaf in enumerate(stacked):
            for i in range(depth):
                np.testing.assert_array_equal(
                    np.asarray(leaf[i]), np.asarray(flat_unstacked[i][j])
                )
    with pytest.raises(ValueError):
        _gemma.unstack_layer_params({"embedder": {}}, depth)
    with pytest.raises(ValueError):
        _gemma.unstack_layer_params(llm, depth + 1)


def _populate_quant(model, p_u):
    _, qvars = model.apply(
        {"params": p_u},
        jax.random.PRNGKey(0),
        method=model.init_params_fn,
        mutable=["quant"],
    )
    return qvars["quant"]


def test_quantized_sampling_close_to_bf16(scanned, monkeypatch):
    model, params = scanned
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    cfg_q = dataclasses.replace(TINY, scan_layers=False, quant="int8")
    model_q = cfg_q.create_module()
    p_u = _unstacked_params(params, TINY.backbone_depth)
    quant = _populate_quant(model_q, p_u)

    # Every decode-path matmul got an int8 copy (incl. the vocab projection).
    flat = jax.tree_util.tree_flatten_with_path(quant)[0]
    paths = ["/".join(str(k.key) for k in path) for path, _ in flat]
    assert any("embedder" in p and "decode_w_i8" in p for p in paths)
    assert any("layers_0" in p and "w_i8" in p for p in paths)
    i8_leaves = [v for _, v in flat if v.dtype == jnp.int8]
    assert i8_leaves and all(l.dtype == jnp.int8 for l in i8_leaves)

    obs = _obs(TINY)
    noise = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, TINY.action_horizon, TINY.action_dim)),
        jnp.float32,
    )
    a_ref = model.apply(
        params, jax.random.PRNGKey(1), obs, noise=noise, method=model.sample_actions
    )
    a_q = model_q.apply(
        {"params": p_u, "quant": quant},
        jax.random.PRNGKey(1),
        obs,
        noise=noise,
        method=model_q.sample_actions,
    )
    # Weight rounding is ~0.4% per matmul; actions stay close but not equal.
    np.testing.assert_allclose(np.asarray(a_q), np.asarray(a_ref), atol=0.15)
    assert not np.array_equal(np.asarray(a_q), np.asarray(a_ref))


def test_quantized_ar_decode_runs_deterministically(scanned, monkeypatch):
    model, params = scanned
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    cfg_q = dataclasses.replace(TINY, scan_layers=False, quant="int8")
    model_q = cfg_q.create_module()
    p_u = _unstacked_params(params, TINY.backbone_depth)
    quant = _populate_quant(model_q, p_u)

    obs = _obs(TINY, b=1, seed=3)
    kw = dict(max_decoding_steps=6, temperature=0.0, stop_on_eos=False)
    variables = {"params": p_u, "quant": quant}
    t1 = model_q.apply(
        variables, jax.random.PRNGKey(2), obs, method=model_q.sample_tokens, **kw
    )
    t2 = model_q.apply(
        variables, jax.random.PRNGKey(2), obs, method=model_q.sample_tokens, **kw
    )
    assert t1.shape == (1, 6)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_prefill_rows_take_exact_bf16_path(monkeypatch):
    """Above QUANT_MAX_ROWS the dispatch must return the exact einsum result
    (prefill numerics unchanged by quantized serving)."""
    import flax.linen as nn

    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    m = _lora.Einsum(
        shape=(8, 32, 16),
        init_fn=nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,)),
        quant="int8",
    )
    x_small = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), "BTD,NDH->BTNH", x_small)
    x_big = jax.random.normal(
        jax.random.PRNGKey(2), (2, _lora.QUANT_MAX_ROWS, 32), jnp.float32
    )
    got = m.apply(variables, "BTD,NDH->BTNH", x_big)
    want = jnp.einsum("BTD,NDH->BTNH", x_big, variables["params"]["w"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # And below the threshold the quantized path returns something different.
    got_small = m.apply(variables, "BTD,NDH->BTNH", x_small)
    want_small = jnp.einsum("BTD,NDH->BTNH", x_small, variables["params"]["w"])
    assert not np.array_equal(np.asarray(got_small), np.asarray(want_small))


def test_quant_requires_unscanned_layers():
    cfg = dataclasses.replace(TINY, quant="int8")  # scan_layers left True
    model = cfg.create_module()
    with pytest.raises(ValueError, match="scan_layers=False"):
        model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
        )


def test_create_trained_policy_quantized_end_to_end(tmp_path, monkeypatch):
    """The full serving assembly: fabricated checkpoint -> quantize="int8"
    -> Policy.infer returns finite action chunks through the int8 path."""
    import orbax.checkpoint as ocp

    from lap_tpu.policies import policy_config
    from lap_tpu.training import config as config_mod

    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    monkeypatch.delenv("LAP_TPU_TOKENIZER_MODEL", raising=False)
    train_config = config_mod.get_config("debug")
    model = train_config.model.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )["params"]
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save((tmp_path / "params").resolve(), {"params": params})

    policy = policy_config.create_trained_policy(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8", num_steps=2
    )
    assert "quant" in policy._params
    img = np.random.default_rng(0).integers(0, 255, (56, 56, 3), np.uint8)
    obs = {
        "observation": {
            "base_0_rgb": img,
            "left_wrist_0_rgb": img,
            "state": np.zeros(7, np.float32),
        },
        "prompt": "pick up the cup",
    }
    result = policy.infer(obs)
    assert result["actions"].shape == (
        train_config.model.action_horizon,
        train_config.model.action_dim,
    )
    assert np.isfinite(result["actions"]).all()

    ar = policy_config.create_trained_policy_ar(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8",
        max_decoding_steps=6,
    )
    assert "quant" in ar._params
    ar_result = ar.infer(obs)
    assert ar_result["policy_timing"]["infer_ms"] > 0


TINY3 = LAPConfig(
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


def _obs3(cfg, b=1):
    from lap_tpu.models.tokenizer import GEMMA3_IMAGE_TOKEN

    obs = cfg.fake_obs(b)
    tok = np.full((b, cfg.max_token_len), 5, np.int32)
    tok[:, 0] = 2
    tok[:, 4:20] = GEMMA3_IMAGE_TOKEN
    tok[:, 24:40] = GEMMA3_IMAGE_TOKEN
    langact = np.zeros((b, cfg.max_token_len), bool)
    langact[:, 60:] = True
    return obs.replace(
        tokenized_prompt=jnp.asarray(tok),
        tokenized_langact_mask=jnp.asarray(langact),
        token_loss_mask=jnp.ones((b, cfg.max_token_len), bool),
    )


@pytest.fixture(scope="module")
def gemma3_scanned():
    model = TINY3.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(43), len(leaves))
    leaves = [
        v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
        for v, k in zip(leaves, keys)
    ]
    return model, jax.tree_util.tree_unflatten(treedef, leaves)


def test_gemma3_unscanned_matches_scanned(gemma3_scanned):
    model, params = gemma3_scanned
    cfg_u = dataclasses.replace(TINY3, scan_layers=False)
    model_u = cfg_u.create_module()
    p_u = _unstacked_params(params, TINY3.backbone_depth)

    obs = _obs3(TINY3)
    noise = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 4, 7)), jnp.float32
    )
    a_s = model.apply(
        params, jax.random.PRNGKey(1), obs, num_steps=2, noise=noise,
        method=model.sample_actions,
    )
    a_u = model_u.apply(
        {"params": p_u}, jax.random.PRNGKey(1), obs, num_steps=2, noise=noise,
        method=model_u.sample_actions,
    )
    np.testing.assert_allclose(np.asarray(a_u), np.asarray(a_s), rtol=0, atol=1e-5)

    t_s = model.apply(
        params, jax.random.PRNGKey(2), obs, max_decoding_steps=6,
        method=model.sample_tokens,
    )
    t_u = model_u.apply(
        {"params": p_u}, jax.random.PRNGKey(2), obs, max_decoding_steps=6,
        method=model_u.sample_tokens,
    )
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_u))


def test_gemma3_quantized_sampling(gemma3_scanned, monkeypatch):
    model, params = gemma3_scanned
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    cfg_q = dataclasses.replace(TINY3, scan_layers=False, quant="int8")
    model_q = cfg_q.create_module()
    p_u = _unstacked_params(params, TINY3.backbone_depth)
    quant = _populate_quant(model_q, p_u)

    flat = jax.tree_util.tree_flatten_with_path(quant)[0]
    paths = ["/".join(str(k.key) for k in path) for path, _ in flat]
    assert any("layers_0" in p and "gating_w_i8" in p for p in paths)
    assert any("embedder" in p and "decode_w_i8" in p for p in paths)

    obs = _obs3(TINY3)
    noise = jnp.asarray(np.random.default_rng(9).normal(size=(1, 4, 7)), jnp.float32)
    a_ref = model.apply(
        params, jax.random.PRNGKey(1), obs, num_steps=2, noise=noise,
        method=model.sample_actions,
    )
    a_q = model_q.apply(
        {"params": p_u, "quant": quant}, jax.random.PRNGKey(1), obs, num_steps=2,
        noise=noise, method=model_q.sample_actions,
    )
    np.testing.assert_allclose(np.asarray(a_q), np.asarray(a_ref), atol=0.15)
    assert not np.array_equal(np.asarray(a_q), np.asarray(a_ref))

    toks = model_q.apply(
        {"params": p_u, "quant": quant}, jax.random.PRNGKey(2), obs,
        max_decoding_steps=6, method=model_q.sample_tokens,
    )
    assert toks.shape == (1, 6)


def test_quantized_policy_composes_with_micro_batching(tmp_path, monkeypatch):
    """int8 decode serving under the request coalescer: two concurrent AR
    requests ride one batched (2-row, still <= QUANT_MAX_ROWS) decode."""
    from concurrent.futures import ThreadPoolExecutor

    import orbax.checkpoint as ocp

    from lap_tpu.policies import policy_config
    from lap_tpu.policies.batching import BatchingPolicy
    from lap_tpu.training import config as config_mod

    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    monkeypatch.delenv("LAP_TPU_TOKENIZER_MODEL", raising=False)
    train_config = config_mod.get_config("debug")
    model = train_config.model.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )["params"]
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save((tmp_path / "params").resolve(), {"params": params})
    ar = policy_config.create_trained_policy_ar(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8",
        max_decoding_steps=6,
    )
    batcher = BatchingPolicy(
        ar, max_batch=2, window_ms=2000.0, background_warmup=False
    )
    try:
        img = np.random.default_rng(0).integers(0, 255, (56, 56, 3), np.uint8)
        obs = {
            "observation": {
                "base_0_rgb": img,
                "left_wrist_0_rgb": img,
                "state": np.zeros(7, np.float32),
            },
            "prompt": "pick up the cup",
        }
        with ThreadPoolExecutor(2) as ex:
            results = list(ex.map(lambda _: batcher.infer(obs), range(2)))
        for r in results:
            assert np.isfinite(np.asarray(r["actions"])).all()
    finally:
        batcher.close()


def test_quantized_policy_composes_with_token_bucket(tmp_path, monkeypatch):
    """serve_policy --quantize int8 --token_bucket 8 (round-4 VERDICT ask #4):
    the composed stack's outputs equal the int8 full-length oracle — prompt
    bucketing only trims zero-attention pad, so greedy AR tokens and the flow
    chunk are unchanged."""
    import orbax.checkpoint as ocp

    from lap_tpu.policies import policy_config
    from lap_tpu.training import config as config_mod

    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    monkeypatch.delenv("LAP_TPU_TOKENIZER_MODEL", raising=False)
    train_config = config_mod.get_config("debug")
    model = train_config.model.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )["params"]
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save((tmp_path / "params").resolve(), {"params": params})
    img = np.random.default_rng(0).integers(0, 255, (56, 56, 3), np.uint8)
    obs = {
        "observation": {
            "base_0_rgb": img,
            "left_wrist_0_rgb": img,
            "state": np.zeros(7, np.float32),
        },
        "prompt": "pick up the cup",
    }

    ar_full = policy_config.create_trained_policy_ar(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8",
        max_decoding_steps=6,
    )
    ar_bucket = policy_config.create_trained_policy_ar(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8",
        max_decoding_steps=6, token_bucket=8,
    )
    r_full = ar_full.infer(obs)
    r_bucket = ar_bucket.infer(obs)
    np.testing.assert_allclose(
        np.asarray(r_full["actions"]), np.asarray(r_bucket["actions"]), atol=1e-5
    )
    assert r_full.get("reasoning", "") == r_bucket.get("reasoning", "")

    flow_full = policy_config.create_trained_policy(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8", num_steps=2
    )
    flow_bucket = policy_config.create_trained_policy(
        train_config, tmp_path, allow_test_vocab=True, quantize="int8",
        num_steps=2, token_bucket=8,
    )
    np.testing.assert_allclose(
        flow_full.infer(obs)["actions"],
        flow_bucket.infer(obs)["actions"],
        rtol=1e-4,
        atol=1e-4,
    )
