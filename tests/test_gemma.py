import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.models import gemma
from lap_tpu.ops import make_attn_mask

CFG = gemma.get_config("dummy")
CFG_EXPERT = gemma.Config(
    width=32, depth=4, mlp_dim=64, num_heads=8, num_kv_heads=1, head_dim=16
)


def _make_model(**kw):
    return gemma.Module(configs=[CFG, CFG_EXPERT], embed_dtype="float32", **kw)


def _init(model, b=2, t0=6, t1=4, adarms=(False, False)):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, t0, CFG.width))
    x1 = jax.random.normal(key, (b, t1, CFG_EXPERT.width))
    positions = jnp.tile(jnp.arange(t0 + t1)[None], (b, 1))
    input_mask = jnp.ones((b, t0 + t1), bool)
    ar = jnp.tile(
        jnp.array([0] * t0 + [1] * t1, jnp.int32)[None], (b, 1)
    )
    mask = make_attn_mask(input_mask, ar)
    cond = [
        jnp.zeros((b, c.width)) if u else None
        for u, c in zip(adarms, [CFG, CFG_EXPERT])
    ]
    params = model.init(key, adarms, method=model.init_params)
    return params, (x0, x1, positions, mask, cond)


def test_forward_shapes_and_param_names():
    model = _make_model()
    params, (x0, x1, positions, mask, cond) = _init(model)
    (out0, out1), (idx, k, v) = model.apply(params, [x0, x1], positions, mask, cond)
    assert out0.shape == x0.shape and out1.shape == x1.shape
    # KV cache stacked over layers by scan.
    assert k.shape == (CFG.depth, 2, 10, CFG.num_kv_heads, CFG.head_dim)
    p = params["params"]
    # Checkpoint-layout contract: expert 0 bare names, expert 1 suffixed.
    layer_keys = set(p["layers"].keys())
    assert {"attn", "pre_attention_norm", "pre_attention_norm_1", "mlp", "mlp_1",
            "pre_ffw_norm", "pre_ffw_norm_1"} <= layer_keys
    attn_keys = set(p["layers"]["attn"].keys())
    assert {"q_einsum", "kv_einsum", "attn_vec_einsum",
            "q_einsum_1", "kv_einsum_1", "attn_vec_einsum_1"} <= attn_keys
    # scan stacking: leading depth axis
    assert p["layers"]["attn"]["q_einsum"]["w"].shape[0] == CFG.depth
    assert "final_norm" in p and "final_norm_1" in p and "embedder" in p


def test_embed_decode():
    model = _make_model()
    params, _ = _init(model)
    tokens = jnp.array([[1, 2, 3]])
    emb = model.apply(params, tokens, method=model.embed)
    assert emb.shape == (1, 3, CFG.width)
    logits = model.apply(params, emb, method=model.decode_logits)
    assert logits.shape == (1, 3, gemma.PALIGEMMA_VOCAB_SIZE)


def test_prefill_then_ar_decode_matches_full_forward():
    """KV-cache single-token decode must reproduce the full forward pass."""
    model = _make_model(attn_impl="xla")
    b, t0 = 1, 5
    key = jax.random.PRNGKey(1)
    x_full = jax.random.normal(key, (b, t0 + 2, CFG.width))
    positions = jnp.tile(jnp.arange(t0 + 2)[None], (b, 1))
    input_mask = jnp.ones((b, t0 + 2), bool)
    ar = jnp.tile(jnp.array([0] * t0 + [1, 1], jnp.int32)[None], (b, 1))
    mask = make_attn_mask(input_mask, ar)
    params = model.init(key, [x_full, None], positions, mask, None)

    (full_out, _), _ = model.apply(params, [x_full, None], positions, mask, None)

    # Prefill first t0 tokens with cache sized for the whole sequence.
    pre_mask = jnp.pad(mask[:, :t0, :t0], ((0, 0), (0, 0), (0, 2)))
    (pre_out, _), cache = model.apply(
        params, [x_full[:, :t0], None], positions[:, :t0], pre_mask, None
    )
    np.testing.assert_allclose(
        np.asarray(pre_out), np.asarray(full_out[:, :t0]), atol=1e-5, rtol=1e-5
    )
    # Decode the last two tokens one at a time.
    for step in range(2):
        t = t0 + step
        step_mask = mask[:, t : t + 1, :]
        (step_out, _), cache = model.apply(
            params,
            [x_full[:, t : t + 1], None],
            positions[:, t : t + 1],
            step_mask,
            None,
            kv_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(step_out[:, 0]),
            np.asarray(full_out[:, t]),
            atol=1e-5,
            rtol=1e-5,
        )


def test_suffix_decode_matches_full_forward():
    """Flow-matching pattern: prefill expert-0, run expert-1 suffix vs cache."""
    model = _make_model(attn_impl="xla")
    b, t0, t1 = 1, 5, 3
    params, (x0, x1, positions, mask, cond) = _init(model, b=b, t0=t0, t1=t1)
    x1 = x1[:, :t1]

    (full0, full1), _ = model.apply(params, [x0, x1], positions, mask, None)

    pre_mask = mask[:, :t0, :t0]
    (_, _), cache = model.apply(
        params, [x0, None], positions[:, :t0], pre_mask, None
    )
    # Suffix attends cached prefix (padded region masked off) + itself.
    suf_mask = mask[:, t0:, :]
    (_, suf_out), _ = model.apply(
        params, [None, x1], positions[:, t0:], suf_mask, None, kv_cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(suf_out), np.asarray(full1), atol=1e-5, rtol=1e-5
    )


def test_stop_action_to_vlm_grad():
    def loss_fn(params, model):
        _, (x0, x1, positions, mask, cond) = _init(model)
        (out0, out1), _ = model.apply(params, [x0, x1], positions, mask, cond)
        return jnp.sum(out1.astype(jnp.float32) ** 2)

    model_sg = _make_model(stop_action_to_vlm_grad=True, attn_impl="xla")
    params, _ = _init(model_sg)
    g = jax.grad(lambda p: loss_fn(p, model_sg))(params)["params"]
    # Expert-0 KV projections receive no gradient from a suffix-only loss.
    assert np.abs(np.asarray(g["layers"]["attn"]["kv_einsum"]["w"])).max() == 0.0
    assert np.abs(np.asarray(g["embedder"]["input_embedding"])).max() == 0.0
    # Expert-1 weights do.
    assert np.abs(np.asarray(g["layers"]["attn"]["kv_einsum_1"]["w"])).max() > 0.0

    model = _make_model(stop_action_to_vlm_grad=False, attn_impl="xla")
    g2 = jax.grad(lambda p: loss_fn(p, model))(params)["params"]
    assert np.abs(np.asarray(g2["layers"]["attn"]["kv_einsum"]["w"])).max() > 0.0


def test_adarms_conditioning():
    model = _make_model(adarms=True)
    params, (x0, x1, positions, mask, cond) = _init(model, adarms=(False, True))
    (out0, out1), _ = model.apply(params, [x0, x1], positions, mask, cond)
    assert out1.shape == x1.shape
    # adaRMS Dense params exist for expert 1 norms only.
    p = params["params"]["layers"]
    assert "Dense_0" in p["pre_attention_norm_1"]
    assert "Dense_0" not in p["pre_attention_norm"]
    # Conditioning changes the output once the modulation weights are nonzero
    # (they are zero-initialized so adaRMS starts as a plain RMSNorm).
    kern = p["pre_attention_norm_1"]["Dense_0"]["kernel"]
    p["pre_attention_norm_1"]["Dense_0"]["kernel"] = jnp.ones_like(kern) * 0.1
    cond2 = [None, jnp.ones_like(cond[1])]
    (_, out1a), _ = model.apply(params, [x0, x1], positions, mask, cond)
    (_, out1b), _ = model.apply(params, [x0, x1], positions, mask, cond2)
    assert np.abs(np.asarray(out1b) - np.asarray(out1a)).max() > 0
