"""int4 weight-only serving path: group-wise nibble-packed decode weights.

Covers ``create_trained_policy(..., quantize="int4")`` — the mode stacked
on round 4's int8 serving that halves decode weight bytes again:
- the "quant" collection holds nibble-packed ``w_i4`` + 2-D group scales
  for every big decode matmul (and falls back to per-channel ``w_i8`` for
  weights whose K fits no group candidate),
- sampling stays close to bf16 (group scales bound the 4-bit rounding),
- the full policy assembly works end to end for flow and AR, composed
  with prompt-length bucketing,
- unsupported compositions (tp>1) are rejected.
"""

import dataclasses

import flax.linen as nn
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


def test_int4_group_picking():
    assert _lora._int4_group(2048) == 256  # gemma_2b width
    assert _lora._int4_group(16384) == 256  # gemma_2b mlp_dim
    assert _lora._int4_group(3840) == 128  # gemma3_12b width (512 fails)
    assert _lora._int4_group(64) == 32  # dummy width
    assert _lora._int4_group(24) is None  # no candidate -> int8 fallback
    assert _lora._int4_group(63) is None  # odd K cannot nibble-pack


def test_einsum_int4_falls_back_to_int8_for_small_k(monkeypatch):
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    m = _lora.Einsum(
        shape=(24, 16),
        init_fn=nn.initializers.lecun_normal(in_axis=-2, out_axis=-1),
        quant="int4",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), "BD,DH->BH", x)
    assert "w_i8" in variables["quant"]  # K=24 fits no int4 group
    assert variables["quant"]["scale"].ndim == 1


def test_einsum_int4_packs_and_matches_oracle(monkeypatch):
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    m = _lora.Einsum(
        shape=(128, 96),
        init_fn=nn.initializers.lecun_normal(in_axis=-2, out_axis=-1),
        quant="int4",
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), "BD,DH->BH", x)
    q = variables["quant"]
    assert "w_i4" in q and q["w_i4"].shape == (64, 96) and q["w_i4"].dtype == jnp.int8
    assert q["scale"].shape == (128 // 64, 96)  # group size 64 for K=128
    got = m.apply(variables, "BD,DH->BH", x)
    from lap_tpu.ops.int4_matmul import int4_matmul_reference

    want = int4_matmul_reference(x, q["w_i4"], q["scale"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-6)
    # And the quantized result tracks the exact bf16 einsum.
    exact = jnp.einsum("BD,DH->BH", x, variables["params"]["w"])
    err = np.abs(np.asarray(got) - np.asarray(exact))
    assert err.max() < 0.12 * np.abs(np.asarray(exact)).max() + 1e-3


def _unstacked_params(params, depth):
    p = dict(params["params"])
    p["llm"] = _gemma.unstack_layer_params(dict(p["llm"]), depth)
    return p


def _populate_quant(model, p_u):
    _, qvars = model.apply(
        {"params": p_u},
        jax.random.PRNGKey(0),
        method=model.init_params_fn,
        mutable=["quant"],
    )
    return qvars["quant"]


@pytest.fixture(scope="module")
def scanned():
    model = TINY.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        v + 0.03 * jax.random.normal(k, v.shape, v.dtype)
        for v, k in zip(leaves, keys)
    ]
    return model, jax.tree_util.tree_unflatten(treedef, leaves)


def test_int4_quant_collection_layout(scanned, monkeypatch):
    model, params = scanned
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    cfg_q = dataclasses.replace(TINY, scan_layers=False, quant="int4")
    model_q = cfg_q.create_module()
    p_u = _unstacked_params(params, TINY.backbone_depth)
    quant = _populate_quant(model_q, p_u)

    flat = jax.tree_util.tree_flatten_with_path(quant)[0]
    paths = ["/".join(str(k.key) for k in path) for path, _ in flat]
    # Dummy widths (64/128) all fit int4 groups: the vocab projection and
    # the layer matmuls pack as nibbles with 2-D group scales.
    assert any("embedder" in p and "decode_w_i4" in p for p in paths)
    assert any("layers_0" in p and p.endswith("w_i4") for p in paths)
    assert not any(p.endswith("w_i8") for p in paths)
    for path, v in flat:
        joined = "/".join(str(k.key) for k in path)
        if joined.endswith("w_i4"):
            assert v.dtype == jnp.int8
        if joined.endswith("scale"):
            assert v.ndim == 2  # group-wise everywhere here


def test_int4_sampling_close_to_bf16(scanned, monkeypatch):
    model, params = scanned
    monkeypatch.setattr(_lora, "QUANT_MIN_WEIGHT_ELEMS", 0)
    cfg_q = dataclasses.replace(TINY, scan_layers=False, quant="int4")
    model_q = cfg_q.create_module()
    p_u = _unstacked_params(params, TINY.backbone_depth)
    quant = _populate_quant(model_q, p_u)

    from tests.test_int8_serving import _obs

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
    # 4-bit group-wise rounding: looser than int8's 0.15 but still close.
    np.testing.assert_allclose(np.asarray(a_q), np.asarray(a_ref), atol=0.3)
    assert not np.array_equal(np.asarray(a_q), np.asarray(a_ref))

    kw = dict(max_decoding_steps=6, temperature=0.0, stop_on_eos=False)
    obs1 = _obs(TINY, b=1, seed=3)
    t1 = model_q.apply(
        {"params": p_u, "quant": quant}, jax.random.PRNGKey(2), obs1,
        method=model_q.sample_tokens, **kw
    )
    assert t1.shape == (1, 6)


def test_create_trained_policy_int4_end_to_end(tmp_path, monkeypatch):
    """Fabricated checkpoint -> quantize="int4" -> finite flow actions and a
    running AR policy, composed with --token_bucket (output-parity vs the
    full-length int4 oracle)."""
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

    policy = policy_config.create_trained_policy(
        train_config, tmp_path, allow_test_vocab=True, quantize="int4", num_steps=2
    )
    assert "quant" in policy._params
    i4 = [
        v
        for path, v in jax.tree_util.tree_flatten_with_path(policy._params["quant"])[0]
        if str(path[-1].key).endswith("w_i4")
    ]
    assert i4 and all(v.dtype == jnp.int8 for v in i4)
    result = policy.infer(obs)
    assert result["actions"].shape == (
        train_config.model.action_horizon,
        train_config.model.action_dim,
    )
    assert np.isfinite(result["actions"]).all()

    ar_full = policy_config.create_trained_policy_ar(
        train_config, tmp_path, allow_test_vocab=True, quantize="int4",
        max_decoding_steps=6,
    )
    ar_bucket = policy_config.create_trained_policy_ar(
        train_config, tmp_path, allow_test_vocab=True, quantize="int4",
        max_decoding_steps=6, token_bucket=8,
    )
    r_full = ar_full.infer(obs)
    r_bucket = ar_bucket.infer(obs)
    np.testing.assert_allclose(
        np.asarray(r_full["actions"]), np.asarray(r_bucket["actions"]), atol=1e-5
    )
    assert r_full.get("reasoning", "") == r_bucket.get("reasoning", "")


def test_int4_rejects_tp(tmp_path):
    from lap_tpu.policies import policy_config
    from lap_tpu.training import config as config_mod

    with pytest.raises(ValueError, match="single-chip"):
        policy_config._restore(
            config_mod.get_config("debug"), tmp_path, quantize="int4", tp=2
        )


def test_unknown_quant_mode_rejected():
    with pytest.raises(ValueError, match="unknown quant mode"):
        _lora.quant_enabled("int2", None, 10**9)
