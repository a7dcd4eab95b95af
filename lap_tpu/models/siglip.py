"""SigLIP vision transformer (So400m/14 family), TPU-native.

Capability parity with the ``openpi.models.siglip`` ViT consumed by the
reference (lihzha/lap ``lap.py:77-85``) and the Gemma3 variant
(``siglip_gemma3.py``): conv patchify, learned position embeddings, pre-LN
encoder blocks, and for Gemma3 an RMS soft-embedding norm, average pooling to
256 tokens, and a linear projection to the LLM width.

Parameter names follow the big_vision layout (``embedding``,
``pos_embedding``, ``Transformer/encoderblock/...`` scan-stacked,
``Transformer/encoder_norm``) so PaliGemma ``.npz`` checkpoints load without
renaming. Attention dispatches to the shared attention op (Pallas flash on
TPU for big token counts, einsum otherwise).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from lap_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    patch_size: int = 14
    # Gemma3 extensions:
    pool_to_tokens: int | None = None  # average-pool grid to this many tokens
    head_dim_out: int | None = None  # project to LLM width
    head_bias: bool = True  # big_vision head has bias; Gemma3's does not
    soft_embedding_norm: bool = False


Variant = Literal["So400m/14", "B/16", "dummy"]


def get_config(variant: str, **overrides) -> SiglipConfig:
    table = {
        "So400m/14": dict(width=1152, depth=27, mlp_dim=4304, num_heads=16, patch_size=14),
        "B/16": dict(width=768, depth=12, mlp_dim=3072, num_heads=12, patch_size=16),
        "dummy": dict(width=64, depth=2, mlp_dim=128, num_heads=4, patch_size=14),
    }
    if variant not in table:
        raise ValueError(f"Unknown siglip variant: {variant}")
    return SiglipConfig(**{**table[variant], **overrides})


class _SelfAttention(nn.Module):
    """Bidirectional MHA with flax-MultiHeadDotProductAttention param layout
    (query/key/value/out with kernel+bias) for checkpoint compatibility."""

    num_heads: int
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        h = d // self.num_heads

        def dense(name):
            return nn.DenseGeneral(
                features=(self.num_heads, h), axis=-1, name=name, dtype=x.dtype
            )

        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        mask = jnp.ones((b, t, t), dtype=bool)
        out = attention(q, k, v, mask, scale=h**-0.5, impl=self.attn_impl)
        return nn.DenseGeneral(
            features=d, axis=(-2, -1), name="out", dtype=x.dtype
        )(out)


class _EncoderBlock(nn.Module):
    mlp_dim: int
    num_heads: int
    attn_impl: str = "auto"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.LayerNorm(name="LayerNorm_0", dtype=x.dtype)(x)
        y = _SelfAttention(
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            name="MultiHeadDotProductAttention_0",
        )(y)
        x = x + y
        y = nn.LayerNorm(name="LayerNorm_1", dtype=x.dtype)(x)
        y = nn.Dense(self.mlp_dim, name="MlpBlock_0_Dense_0", dtype=x.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(x.shape[-1], name="MlpBlock_0_Dense_1", dtype=x.dtype)(y)
        return x + y, None


class _ScannedEncoderBlock(nn.Module):
    """Wrapper giving the scanned block the nested MlpBlock_0/Dense_i naming."""

    mlp_dim: int
    num_heads: int
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, _):
        y = nn.LayerNorm(name="LayerNorm_0", dtype=x.dtype)(x)
        y = _SelfAttention(
            num_heads=self.num_heads,
            attn_impl=self.attn_impl,
            name="MultiHeadDotProductAttention_0",
        )(y)
        x = x + y
        y = nn.LayerNorm(name="LayerNorm_1", dtype=x.dtype)(x)
        mlp = _Mlp(mlp_dim=self.mlp_dim, name="MlpBlock_0")
        return x + mlp(y), None


class _Mlp(nn.Module):
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.mlp_dim, name="Dense_0", dtype=x.dtype)(x)
        y = nn.gelu(y)
        return nn.Dense(x.shape[-1], name="Dense_1", dtype=x.dtype)(y)


class _RMSNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + 1e-6)
        scale = self.param("scale", nn.initializers.zeros_init(), (x.shape[-1],))
        return (normed * (1 + scale)).astype(dtype)


class SigLIP(nn.Module):
    """ViT image encoder emitting a token sequence (no pooling head by
    default, as used by PaliGemma)."""

    config: SiglipConfig
    dtype: str = "float32"
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        """images: [B, H, W, 3] in [-1, 1]. Returns [B, tokens, width_out]."""
        cfg = self.config
        x = images.astype(self.dtype)
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            name="embedding",
            dtype=x.dtype,
        )(x)
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        posemb = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=1 / (d**0.5)),
            (1, gh * gw, d),
        )
        x = x + posemb.astype(x.dtype)

        if cfg.soft_embedding_norm:
            x = _RMSNorm(name="mm_soft_embedding_norm")(x)

        block = nn.remat(
            _ScannedEncoderBlock,
            prevent_cse=False,
            policy=jax.checkpoint_policies.nothing_saveable,
        )
        encoder = nn.scan(
            block,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.depth,
        )(
            mlp_dim=cfg.mlp_dim,
            num_heads=cfg.num_heads,
            attn_impl=self.attn_impl,
            name="Transformer_encoderblock",
        )
        x, _ = encoder(x, None)
        x = nn.LayerNorm(name="Transformer_encoder_norm", dtype=x.dtype)(x)

        if cfg.pool_to_tokens:
            # Gemma3: average-pool the token grid down to a fixed 256 tokens
            # (e.g. 64x64 -> 16x16 via 4x4 windows; siglip_gemma3.py:456-478).
            side = int(round((gh * gw) ** 0.5))
            out_side = int(round(cfg.pool_to_tokens**0.5))
            factor = side // out_side
            x = x.reshape(b, out_side, factor, out_side, factor, d).mean(axis=(2, 4))
            x = x.reshape(b, out_side * out_side, d)

        if cfg.head_dim_out:
            x = nn.Dense(
                cfg.head_dim_out, use_bias=cfg.head_bias, name="head", dtype=x.dtype
            )(x)
        return x
