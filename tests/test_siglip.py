import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.models import siglip


def test_forward_tokens():
    cfg = siglip.get_config("dummy")
    model = siglip.SigLIP(config=cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (2, 56, 56, 3)) * 2 - 1
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    # 56/14 = 4 -> 16 tokens
    assert out.shape == (2, 16, cfg.width)
    p = params["params"]
    assert {"embedding", "pos_embedding", "Transformer_encoderblock",
            "Transformer_encoder_norm"} <= set(p.keys())
    blk = p["Transformer_encoderblock"]
    assert {"LayerNorm_0", "LayerNorm_1", "MultiHeadDotProductAttention_0",
            "MlpBlock_0"} <= set(blk.keys())
    # Scan stacking over depth.
    assert blk["LayerNorm_0"]["scale"].shape == (cfg.depth, cfg.width)
    assert blk["MultiHeadDotProductAttention_0"]["query"]["kernel"].shape == (
        cfg.depth, cfg.width, cfg.num_heads, cfg.width // cfg.num_heads
    )


def test_gemma3_pool_and_head():
    cfg = siglip.get_config(
        "dummy", pool_to_tokens=4, head_dim_out=32, soft_embedding_norm=True
    )
    model = siglip.SigLIP(config=cfg)
    imgs = jnp.zeros((1, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    # 4x4 grid pooled 2x2 -> 2x2 = 4 tokens, projected to 32.
    assert out.shape == (1, 4, 32)
    assert "mm_soft_embedding_norm" in params["params"]
    assert "head" in params["params"]


def test_jit_and_grad():
    cfg = siglip.get_config("dummy")
    model = siglip.SigLIP(config=cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)

    @jax.jit
    def loss(p, im):
        return jnp.sum(model.apply(p, im).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params, imgs)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
