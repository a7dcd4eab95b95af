"""Multi-expert Gemma3 decoder, TPU-native.

Capability parity with lihzha/lap ``src/lap/models/backbones/gemma3.py``:
5-local+1-global sliding-window attention (window 512/1024), dual RoPE bases
(10k local / 1M global, selected per scanned layer), interleaved-pair RoPE
layout, QK-RMSNorm instead of logit softcapping, post-attention and post-FFW
norms on expert 0, bidirectional image-token attention OR'd into the mask,
transposed gating einsum, vocab 262144, and the same multi-expert /
stop-gradient / adaRMS / KV-cache machinery as the Gemma2 module.

TPU-native: the fused (base + sliding + image) boolean mask feeds the Pallas
flash kernel; no [B,K,G,T,S] float32 logits are materialized.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from lap_tpu.models import lora
from lap_tpu.models.gemma import (
    Embedder,
    RMSNorm,
    _gated_residual,
    _name,
    init_cache,
    pipelined_block_stack,
    update_cache,
)
from lap_tpu.ops.attention import attention
from lap_tpu.parallel.mesh import activation_sharding_constraint
from lap_tpu.parallel.pipeline import current_pipeline

GEMMA3_VOCAB_SIZE = 262_144

Variant = Literal[
    "gemma3_300m", "gemma3_1b", "gemma3_4b", "gemma3_12b", "gemma3_27b",
    "gemma3_300m_26", "gemma3_300m_48", "gemma3_300m_62", "gemma3_dummy",
]


@dataclasses.dataclass(frozen=True)
class Config:
    width: int
    hidden_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    num_layers: int
    sliding_window_size: int = 1024
    sliding_window_pattern: int = 6  # every 6th layer is global
    rope_local_base_freq: float = 10_000.0
    rope_global_base_freq: float = 1_000_000.0
    use_qk_norm: bool = True
    use_post_attn_norm: bool = True
    use_post_ffw_norm: bool = True
    vocab_size: int = GEMMA3_VOCAB_SIZE
    lora_configs: dict = dataclasses.field(default_factory=dict)

    def get_attention_type(self, layer_idx: int) -> str:
        return "global" if (layer_idx + 1) % self.sliding_window_pattern == 0 else "local"

    def is_global_attn_array(self) -> jnp.ndarray:
        return jnp.array(
            [self.get_attention_type(i) == "global" for i in range(self.num_layers)]
        )


_VARIANTS = {
    # (width, hidden, heads, kv, head_dim, layers, window)
    "gemma3_1b": (1152, 6 * 1152, 4, 1, 256, 26, 512),
    "gemma3_4b": (2560, 2560 * 4, 8, 4, 256, 34, 1024),
    "gemma3_12b": (3840, 4 * 3840, 16, 8, 256, 48, 1024),
    "gemma3_27b": (5376, 5376 * 4, 32, 16, 128, 62, 1024),
    "gemma3_300m": (768, 768 * 4, 8, 4, 256, 34, 512),
    "gemma3_300m_26": (768, 768 * 4, 4, 1, 256, 26, 512),
    "gemma3_300m_48": (768, 768 * 4, 16, 8, 256, 48, 512),
    "gemma3_300m_62": (768, 768 * 4, 32, 16, 128, 62, 512),
    "gemma3_dummy": (64, 128, 4, 2, 16, 6, 4),
}


def get_config(variant: str) -> Config:
    if variant not in _VARIANTS:
        raise ValueError(f"Unknown gemma3 variant: {variant}")
    w, h, n, k, hd, layers, window = _VARIANTS[variant]
    return Config(
        width=w, hidden_dim=h, num_heads=n, num_kv_heads=k, head_dim=hd,
        num_layers=layers, sliding_window_size=window,
    )


class QKRMSNorm(nn.Module):
    """Query/key RMSNorm with direct (not 1+x) ones-init scale
    (checkpoint names q_rmsnorm/scale, k_rmsnorm/scale)."""

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        head_dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (head_dim,))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32**2, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + 1e-6) * scale.astype(jnp.float32)).astype(dtype)


def apply_rope_interleaved(x, positions, base_frequency):
    """Gemma3 RoPE: rotates interleaved (even, odd) channel pairs; the base
    may be a traced scalar (selected per layer)."""
    head_dim = x.shape[-1]
    pairs = head_dim // 2
    freq_seq = jnp.arange(pairs, dtype=jnp.float32) / pairs
    inv_freq = 1.0 / (base_frequency**freq_seq)
    angles = positions.astype(jnp.float32)[:, :, None] * inv_freq[None, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    x1, x2 = x[..., ::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class FeedForward(nn.Module):
    """GeGLU MLP with the Gemma3 transposed gating layout
    (``gating_einsum``: [2, H, F], eq "...F,GHF->...GH")."""

    features: int
    hidden_dim: int
    lora_config: lora.LoRAConfig | None = None
    quant: str | None = None

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w_gating_raw = self.param(
            "gating_einsum",
            nn.initializers.lecun_normal(),
            (2, self.hidden_dim, self.features),
        )
        w_gating = w_gating_raw.astype(dtype)
        # [2, H, F] -> [F, 2H]: contraction-major for the int8 kernel.
        gate_full = lora.quant_dispatch(
            self, "gating_", w_gating_raw, (2, 0, 1), 1,
            quant=self.quant, lora_config=self.lora_config, x=x,
            out_shape=(*x.shape[:-1], 2, self.hidden_dim),
        )
        if gate_full is None:
            gate_full = jnp.einsum("...F,GHF->...GH", x, w_gating)
        hidden = jax.nn.gelu(gate_full[..., 0, :]) * gate_full[..., 1, :]
        w_linear_raw = self.param(
            "linear", nn.initializers.lecun_normal(), (self.hidden_dim, self.features)
        )
        w_linear = w_linear_raw.astype(dtype)
        out = lora.quant_dispatch(
            self, "linear_", w_linear_raw, (0, 1), 1,
            quant=self.quant, lora_config=self.lora_config, x=hidden,
            out_shape=(*x.shape[:-1], self.features),
        )
        if out is None:
            out = jnp.einsum("...H,HF->...F", hidden, w_linear)
        if self.lora_config is not None:
            cfg = self.lora_config
            a = self.param("gating_lora_a", nn.initializers.normal(cfg.init_scale),
                           (2, self.features, cfg.rank)).astype(dtype)
            b = self.param("gating_lora_b", nn.initializers.zeros_init(),
                           (2, cfg.rank, self.hidden_dim)).astype(dtype)
            gate_l = (x @ a[0]) @ b[0]
            up_l = (x @ a[1]) @ b[1]
            hidden2 = jax.nn.gelu(gate_full[..., 0, :] + cfg.scaling_value * gate_l) * (
                gate_full[..., 1, :] + cfg.scaling_value * up_l
            )
            la = self.param("linear_lora_a", nn.initializers.normal(cfg.init_scale),
                            (self.hidden_dim, cfg.rank)).astype(dtype)
            lb = self.param("linear_lora_b", nn.initializers.zeros_init(),
                            (cfg.rank, self.features)).astype(dtype)
            out = jnp.einsum("...H,HF->...F", hidden2, w_linear) + cfg.scaling_value * (
                (hidden2 @ la) @ lb
            )
        return out.astype(dtype)


class Attention(nn.Module):
    configs: Sequence[Config]
    stop_action_to_vlm_grad: bool = False
    cache_dtype: str | None = None
    attn_impl: str = "auto"
    quant: str | None = None

    @nn.compact
    def __call__(self, xs, positions, attn_mask, kv_cache, is_global_attn, image_mask=None):
        cfg0 = self.configs[0]
        dtype = next(x.dtype for x in xs if x is not None)
        rope_base = jnp.where(
            is_global_attn, cfg0.rope_global_base_freq, cfg0.rope_local_base_freq
        )

        qs, ks, vs = [], [], []
        for i, (x, cfg) in enumerate(zip(xs, self.configs, strict=True)):
            if x is None:
                continue
            if cfg.num_kv_heads == cfg.num_heads:
                qkv = lora.Einsum(
                    shape=(3, cfg.num_heads, cfg.width, cfg.head_dim),
                    name=_name("qkv_einsum", i),
                    init_fn=nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0, 1)),
                    lora_config=cfg.lora_configs.get("attn"),
                    quant=self.quant,
                )("BSD,3KDH->3BSKH", x)
                q, k, v = qkv[0], qkv[1], qkv[2]
            else:
                q = lora.Einsum(
                    shape=(cfg.num_heads, cfg.width, cfg.head_dim),
                    name=_name("q_einsum", i),
                    init_fn=nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0,)),
                    lora_config=cfg.lora_configs.get("attn"),
                    quant=self.quant,
                )("BTD,NDH->BTNH", x)
                kv = lora.Einsum(
                    shape=(2, cfg.num_kv_heads, cfg.width, cfg.head_dim),
                    name=_name("kv_einsum", i),
                    init_fn=nn.initializers.lecun_normal(in_axis=-2, out_axis=-1, batch_axis=(0, 1)),
                    lora_config=cfg.lora_configs.get("attn"),
                    quant=self.quant,
                )("BSD,2KDH->2BSKH", x)
                k, v = kv[0], kv[1]
            qs.append(q.astype(dtype))
            ks.append(k.astype(dtype))
            vs.append(v.astype(dtype))

        q = jnp.concatenate(qs, axis=1)
        k = jnp.concatenate(ks, axis=1)
        v = jnp.concatenate(vs, axis=1)

        if cfg0.use_qk_norm:
            q = QKRMSNorm(name="q_rmsnorm")(q)
            k = QKRMSNorm(name="k_rmsnorm")(k)

        q = apply_rope_interleaved(q, positions, rope_base)
        k = apply_rope_interleaved(k, positions, rope_base)
        q = q * jnp.asarray(cfg0.head_dim**-0.5, dtype=dtype)

        cache_dtype = jnp.dtype(self.cache_dtype) if self.cache_dtype else dtype
        if kv_cache is not None:
            idx, cache_k, cache_v = kv_cache
            if xs[0] is not None:
                idx, k, v = update_cache(k, v, idx, cache_k, cache_v, cache_dtype)
            else:
                idx = idx + k.shape[1]
                k = jnp.concatenate([cache_k, k.astype(cache_dtype)], axis=1)
                v = jnp.concatenate([cache_v, v.astype(cache_dtype)], axis=1)
        else:
            idx, k, v = init_cache(k, v, attn_mask.shape[-1], cache_dtype)

        # Effective mask: sliding window on local layers, image-bidir OR'd in.
        kv_len = k.shape[1]
        q_pos = positions[:, :, None]
        k_pos = jnp.arange(kv_len)[None, None, :]
        sliding = (k_pos <= q_pos) & ((q_pos - k_pos) < cfg0.sliding_window_size)
        effective_mask = jnp.where(is_global_attn, attn_mask, attn_mask & sliding)
        if image_mask is not None:
            # Key-side mask padded/truncated to the KV length: during cached
            # decode the queries are never image tokens, so the padded region
            # being False is exact.
            k_img = image_mask
            if k_img.shape[1] < kv_len:
                k_img = jnp.pad(k_img, ((0, 0), (0, kv_len - k_img.shape[1])))
            else:
                k_img = k_img[:, :kv_len]
            effective_mask = effective_mask | (image_mask[:, :, None] & k_img[:, None, :])

        stop_grad = (
            self.stop_action_to_vlm_grad and xs[0] is not None and kv_cache is None
        )
        if stop_grad:
            l0 = xs[0].shape[1]
            k_sg = jnp.concatenate([jax.lax.stop_gradient(k[:, :l0]), k[:, l0:]], axis=1)
            v_sg = jnp.concatenate([jax.lax.stop_gradient(v[:, :l0]), v[:, l0:]], axis=1)
            out0 = attention(q[:, :l0], k, v, effective_mask[:, :l0], scale=1.0, impl=self.attn_impl)
            out1 = attention(q[:, l0:], k_sg, v_sg, effective_mask[:, l0:], scale=1.0, impl=self.attn_impl)
            encoded = jnp.concatenate([out0, out1], axis=1)
        else:
            encoded = attention(q, k, v, effective_mask, scale=1.0, impl=self.attn_impl)

        out = []
        start = 0
        for i, (x, cfg) in enumerate(zip(xs, self.configs, strict=True)):
            if x is None:
                out.append(None)
                continue
            end = start + x.shape[1]
            proj = lora.Einsum(
                shape=(cfg.num_heads, cfg.head_dim, cfg.width),
                name=_name("attn_vec_einsum", i),
                init_fn=nn.initializers.lecun_normal(in_axis=(-3, -2), out_axis=-1),
                lora_config=cfg.lora_configs.get("attn"),
                quant=self.quant,
            )
            out.append(proj("BTNH,NHD->BTD", encoded[:, start:end]).astype(dtype))
            start = end
        return out, (idx, k, v)


class Block(nn.Module):
    configs: tuple[Config, ...]
    stop_action_to_vlm_grad: bool = False
    cache_dtype: str | None = None
    dropout: float = 0.0
    attn_impl: str = "auto"
    quant: str | None = None

    @nn.compact
    def __call__(
        self, xs, kv_cache, positions, attn_mask, adarms_cond, is_global_attn,
        image_mask=None, deterministic=True,
    ):
        xs = activation_sharding_constraint(xs)
        pre, gates = [], []
        for i, x in enumerate(xs):
            gate = None
            if x is not None:
                x, gate = RMSNorm(name=_name("pre_attention_norm", i))(x, adarms_cond[i])
            pre.append(x)
            gates.append(gate)
        pre = activation_sharding_constraint(pre)

        post, kv_cache = Attention(
            configs=self.configs,
            stop_action_to_vlm_grad=self.stop_action_to_vlm_grad,
            cache_dtype=self.cache_dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="attn",
        )(pre, positions, attn_mask, kv_cache, is_global_attn, image_mask)

        if self.configs[0].use_post_attn_norm:
            post = [
                RMSNorm(name="post_attention_norm")(x, None)[0] if (x is not None and i == 0) else x
                for i, x in enumerate(post)
            ]
        xs = [_gated_residual(x, y, g) for x, y, g in zip(xs, post, gates, strict=True)]
        xs = activation_sharding_constraint(xs)

        outs, gates = [], []
        for i, (x, cfg) in enumerate(zip(xs, self.configs, strict=True)):
            gate = None
            if x is not None:
                x, gate = RMSNorm(name=_name("pre_ffw_norm", i))(x, adarms_cond[i])
                x = FeedForward(
                    features=cfg.width,
                    hidden_dim=cfg.hidden_dim,
                    name=_name("mlp", i),
                    lora_config=cfg.lora_configs.get("ffn"),
                    quant=self.quant,
                )(x)
            outs.append(x)
            gates.append(gate)
        if self.configs[0].use_post_ffw_norm:
            outs = [
                RMSNorm(name="post_ffw_norm")(x, None)[0] if (x is not None and i == 0) else x
                for i, x in enumerate(outs)
            ]
        xs = [_gated_residual(x, y, g) for x, y, g in zip(xs, outs, gates, strict=True)]
        xs = activation_sharding_constraint(xs)
        return xs, kv_cache


class Module(nn.Module):
    """Gemma3 multi-expert transformer (scanned, rematerialized)."""

    configs: Sequence[Config]
    embed_dtype: str = "bfloat16"
    dropout: float = 0.0
    adarms: bool = False
    stop_action_to_vlm_grad: bool = False
    cache_dtype: str | None = None
    attn_impl: str = "auto"
    # Layer-scan unroll (1 for training; higher for latency-critical decode).
    scan_unroll: int = 1
    # Block remat policy (see gemma.Module.remat_policy): a
    # jax.checkpoint_policies name, or "none" for no remat.
    remat_policy: str = "nothing_saveable"
    # Per-layer blocks instead of nn.scan (serving-only; required for the
    # quantized decode path — see gemma.Module.scan_layers).
    scan_layers: bool = True
    # Weight-only decode quantization ("int8", "int4" or None), serving-only.
    quant: str | None = None

    def setup(self):
        if not all(c.num_layers == self.configs[0].num_layers for c in self.configs):
            raise ValueError("experts must share num_layers")
        self.embedder = Embedder(
            vocab_size=self.configs[0].vocab_size,
            embed_dim=self.configs[0].width,
            quant=self.quant,
            name="embedder",
        )
        self._is_global_attn = self.configs[0].is_global_attn_array()
        block_kwargs = dict(
            configs=tuple(self.configs),
            dropout=self.dropout,
            stop_action_to_vlm_grad=self.stop_action_to_vlm_grad,
            cache_dtype=self.cache_dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
        )
        if not self.scan_layers:
            self.blocks = [
                Block(**block_kwargs, name=f"layers_{i}")
                for i in range(self.configs[0].num_layers)
            ]
        else:
            if self.quant is not None:
                raise ValueError(
                    "quant requires scan_layers=False (per-layer weight "
                    "arrays; the scan's weight slices cannot feed Pallas "
                    "without materializing copies)"
                )
            if self.remat_policy == "none":
                block_cls = Block
            else:
                block_cls = nn.remat(
                    Block,
                    prevent_cse=False,
                    static_argnums=(8,),  # deterministic (0 = self)
                    policy=getattr(jax.checkpoint_policies, self.remat_policy),
                )
            self.layers = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                # (kv_cache, positions, mask, adarms, is_global, image_mask, det)
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, 0, nn.broadcast, nn.broadcast),
                length=self.configs[0].num_layers,
                unroll=self.scan_unroll,
            )(**block_kwargs)
        self.final_norms = [
            RMSNorm(name=_name("final_norm", i)) for i in range(len(self.configs))
        ]

    def embed(self, tokens):
        return self.embedder.encode(tokens).astype(self.embed_dtype)

    def decode_logits(self, prelogits):
        return self.embedder.decode(prelogits)

    def __call__(
        self,
        embedded: Sequence[jnp.ndarray | None],
        positions,
        mask,
        adarms_cond=None,
        image_mask=None,
        *,
        kv_cache=None,
        deterministic: bool = True,
    ):
        embedded = jax.tree.map(lambda e: e.astype(self.embed_dtype), embedded)
        if adarms_cond is None:
            adarms_cond = [None] * len(self.configs)
        # Pin [B, W] conditioning to the data axes (see gemma.py.__call__):
        # avoids involuntary rematerialization in the scan backward.
        adarms_cond = activation_sharding_constraint(adarms_cond)
        pipe = (
            current_pipeline()
            if self.scan_layers and kv_cache is None and not self.is_initializing()
            else None
        )
        if pipe is not None:
            # GPipe pipeline parallelism (see gemma.Module._pipelined_layers):
            # training forward only, stage-sharded over the mesh's pp axis.
            embedded = self._pipelined_layers(
                pipe, embedded, positions, mask, adarms_cond, image_mask,
                deterministic,
            )
            kv_cache = None
        elif self.scan_layers:
            embedded, kv_cache = self.layers(
                embedded, kv_cache, positions, mask, adarms_cond,
                self._is_global_attn, image_mask, deterministic,
            )
        else:
            cfg0 = self.configs[0]
            layer_caches = []
            for i, block in enumerate(self.blocks):
                layer_in = (
                    None
                    if kv_cache is None
                    else jax.tree.map(lambda c, i=i: c[i], kv_cache)
                )
                embedded, layer_out = block(
                    embedded, layer_in, positions, mask, adarms_cond,
                    # Static per-layer attention type: lets XLA drop the
                    # sliding-window branch entirely on global layers.
                    jnp.bool_(cfg0.get_attention_type(i) == "global"),
                    image_mask, deterministic,
                )
                layer_caches.append(layer_out)
            kv_cache = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_caches)
        out = [
            f(e, a)[0] if e is not None else None
            for f, e, a in zip(self.final_norms, embedded, adarms_cond, strict=True)
        ]
        return out, kv_cache

    def _pipelined_layers(
        self, pipe, embedded, positions, mask, adarms_cond, image_mask, deterministic
    ):
        """GPipe over the pp mesh axis via the shared
        ``gemma.pipelined_block_stack`` routing. Gemma3's one structural
        twist: the per-layer global/sliding attention flag is a SCANNED
        input (in_axes=0), so it rides the stacked-params pytree — each
        stage slices its own ``[L/P]`` flags alongside its layer weights —
        while masks/positions/adaRMS/image_mask go through ``static``."""
        block = Block(
            configs=tuple(self.configs),
            dropout=0.0,
            stop_action_to_vlm_grad=self.stop_action_to_vlm_grad,
            cache_dtype=self.cache_dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            parent=None,
        )

        def apply_block(blk, layer, xs, st):
            out, _ = blk.apply(
                {"params": layer["params"]},
                xs,
                None,
                st["positions"],
                st["mask"],
                st["adarms"],
                layer["is_global"],
                st["image_mask"],
                True,
            )
            return out

        return pipelined_block_stack(
            pipe,
            block=block,
            stacked={
                "params": self.variables["params"]["layers"],
                "is_global": jnp.asarray(self._is_global_attn),
            },
            xs=list(embedded),
            static={
                "positions": positions,
                "mask": mask,
                "adarms": list(adarms_cond),
                "image_mask": image_mask,
            },
            apply_block=apply_block,
            dropout=self.dropout,
            deterministic=deterministic,
            remat=self.remat_policy != "none",
        )

    def init_params(self, use_adarms: Sequence[bool]):
        self.embed(jnp.zeros((1, 1), dtype=jnp.int32))
        n = len(self.configs)
        self(
            [jnp.zeros((1, 1, c.width)) for c in self.configs],
            jnp.zeros((1, n), dtype=jnp.int32),
            jnp.zeros((1, n, n), dtype=bool),
            adarms_cond=[
                jnp.zeros((1, c.width)) if u else None
                for u, c in zip(use_adarms, self.configs, strict=True)
            ],
        )
