"""Multi-expert Gemma decoder (PaliGemma family), TPU-native.

Capability parity with lihzha/lap ``src/lap/models/backbones/gemma.py`` (a
big_vision derivative): a transformer whose token sequence is split between
N heterogeneous "experts" (in practice 2: the PaliGemma VLM and a small
action expert). Each expert has its own width/MLP weights; attention is
computed jointly over the concatenated sequence with shared head geometry.

What is intentionally identical (checkpoint + numerics compatibility):
- Parameter names/shapes (``attn/qkv_einsum/w``, ``mlp/gating_einsum``,
  expert suffixes ``_1``; scan-stacked layers under ``layers``) so PaliGemma
  npz and LAP orbax checkpoints load without remapping.
- RMSNorm with zero-init scale, adaptive RMS (scale/shift/gate from a time
  embedding, pi0.5-style), gated residuals, RoPE-then-scale queries,
  float32 softmax semantics, KV cache as (idx, k, v).

What is TPU-native here instead of a translation:
- Attention dispatches to the Pallas flash kernel on TPU (einsum fallback on
  CPU / short queries) — no materialized [B,K,G,T,S] logits.
- ``stop_action_to_vlm_grad`` is realized by splitting the query rows into
  (expert-0, rest) and giving the rest stop-gradient K/V for expert-0 keys —
  mathematically identical to the reference's logit surgery
  (``gemma.py:242-269``) but expressible through any attention kernel.
- Activation sharding constraints over the (dp, fsdp) data axes at block
  boundaries.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from lap_tpu.models import lora
from lap_tpu.ops.attention import attention
from lap_tpu.parallel.mesh import activation_sharding_constraint, suspend_mesh
from lap_tpu.parallel.pipeline import current_pipeline, pipeline_apply

PALIGEMMA_VOCAB_SIZE = 257_152


@dataclasses.dataclass(frozen=True)
class Config:
    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    lora_configs: dict[str, lora.LoRAConfig] = dataclasses.field(default_factory=dict)


Variant = Literal["dummy", "gemma_300m", "gemma_300m_lora", "gemma_2b", "gemma_2b_lora"]


def get_config(variant: Variant) -> Config:
    """Model variants; sizes mirror the reference table (gemma.py:58-109)."""
    base = {
        "dummy": dict(width=64, depth=4, mlp_dim=128, num_heads=8, num_kv_heads=1, head_dim=16),
        "gemma_300m": dict(width=1024, depth=18, mlp_dim=4096, num_heads=8, num_kv_heads=1, head_dim=256),
        "gemma_2b": dict(width=2048, depth=18, mlp_dim=16_384, num_heads=8, num_kv_heads=1, head_dim=256),
    }
    if variant in base:
        return Config(**base[variant])
    if variant == "gemma_2b_lora":
        cfg = lora.LoRAConfig(rank=16, alpha=16.0)
        return Config(**base["gemma_2b"], lora_configs={"attn": cfg, "ffn": cfg})
    if variant == "gemma_300m_lora":
        cfg = lora.LoRAConfig(rank=32, alpha=32.0)
        return Config(**base["gemma_300m"], lora_configs={"attn": cfg, "ffn": cfg})
    if variant == "dummy_lora":  # CPU-testable LoRA path
        cfg = lora.LoRAConfig(rank=4, alpha=4.0)
        return Config(**base["dummy"], lora_configs={"attn": cfg, "ffn": cfg})
    raise ValueError(f"Unknown gemma variant: {variant}")


def _name(name: str, i: int) -> str:
    # Expert 0 keeps the bare name so PaliGemma checkpoints load verbatim;
    # later experts get a suffix (checkpoint-layout contract, gemma.py:567).
    return name if i == 0 else f"{name}_{i}"


def unstack_layer_params(llm_params: dict, depth: int) -> dict:
    """Scan-stacked ``layers`` params -> per-layer ``layers_{i}`` subtrees.

    Converts a checkpoint-layout params tree (every leaf under ``layers``
    carries a leading [depth] axis from ``nn.scan``) into the layout the
    ``scan_layers=False`` serving module expects. Values are identical —
    only the tree structure changes.
    """
    if "layers" not in llm_params:
        raise ValueError("params have no scan-stacked 'layers' subtree")
    out = {k: v for k, v in llm_params.items() if k != "layers"}
    stacked = llm_params["layers"]
    for leaf in jax.tree.leaves(stacked):
        if leaf.shape[0] != depth:
            raise ValueError(
                f"stacked leaf has leading dim {leaf.shape[0]}, expected {depth}"
            )
    for i in range(depth):
        out[f"layers_{i}"] = jax.tree.map(lambda v, i=i: v[i], stacked)
    return out


class RMSNorm(nn.Module):
    """RMSNorm with zero-init scale; adaptive (scale/shift/gate) when given a
    conditioning vector. Returns (normed, gate or None)."""

    @nn.compact
    def __call__(self, x, cond=None):
        dtype = x.dtype
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + 1e-6)
        if cond is None:
            scale = self.param("scale", nn.initializers.zeros_init(), (x.shape[-1],))
            return (normed * (1 + scale)).astype(dtype), None
        modulation = nn.Dense(
            x.shape[-1] * 3, kernel_init=nn.initializers.zeros, dtype=dtype
        )(cond)
        scale, shift, gate = jnp.split(modulation[:, None, :], 3, axis=-1)
        return (normed * (1 + scale) + shift).astype(dtype), gate


def tied_table_logits(x, table):
    """Tied-head vocab logits: ``x @ table.T``. The ONE definition of the
    training decode-head math — ``Embedder.decode``'s exact path and the
    chunked language CE (``lap_model.LAP._token_logp_and_pred``) both route
    here, so a future head change (softcap, scaling, untying) cannot leave
    the two computing different logits."""
    return jnp.dot(x, table.T)


class Embedder(nn.Module):
    vocab_size: int
    embed_dim: int
    quant: str | None = None

    def setup(self):
        self.input_embedding_table = self.param(
            "input_embedding",
            nn.initializers.normal(),
            (self.vocab_size, self.embed_dim),
        )
        if lora.quant_enabled(self.quant, None, self.vocab_size * self.embed_dim):
            # Vocab projection for AR decode: [V, D] -> quantized [D, V]. At
            # one token/step this read is ~10% of the whole gemma_2b decode
            # (the single biggest decode matmul: 527M params at PaliGemma
            # vocab size).
            self._decode_quant = lora.quant_vars(
                self, "decode_", self.input_embedding_table, (1, 0), 1, self.quant
            )

    def encode(self, tokens):
        x = self.input_embedding_table[(tokens,)]
        return x * jnp.sqrt(self.embed_dim).astype(x.dtype)

    def decode(self, x):
        if self.quant is not None and hasattr(self, "_decode_quant"):
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            if rows <= lora.QUANT_MAX_ROWS:
                w_i8, scale = self._decode_quant
                return lora.quant_matmul(
                    x, w_i8, scale, (*x.shape[:-1], self.vocab_size)
                )
        return tied_table_logits(x, self.input_embedding_table)


def init_cache(k, v, cache_size, cache_dtype=None):
    """Pad fresh K/V to ``cache_size``; idx marks the filled prefix length."""
    prefill = k.shape[1]
    pad = ((0, 0), (0, cache_size - prefill), (0, 0), (0, 0))
    dtype = cache_dtype or k.dtype
    idx = jnp.full((k.shape[0],), prefill, dtype=jnp.int32)
    return idx, jnp.pad(k.astype(dtype), pad), jnp.pad(v.astype(dtype), pad)


def update_cache(k, v, idx, k_cache, v_cache, cache_dtype=None):
    """Write a single decode step's K/V at each batch row's own index.

    Per-row scatter (vmapped dynamic_update_slice) so rows with different
    filled lengths stay correct — right-align-padded prefills keep idx
    uniform, but nothing silently corrupts if that invariant breaks.
    """
    if k.shape[1] != 1:
        raise ValueError("KV-cache updates must be single-token")
    dtype = cache_dtype or k.dtype

    def write(cache, new):
        return jax.vmap(
            lambda c, n, i: jax.lax.dynamic_update_slice(c, n.astype(dtype), (i, 0, 0))
        )(cache, new, idx)

    return idx + 1, write(k_cache, k), write(v_cache, v)


class Attention(nn.Module):
    """Joint attention over the concatenated expert sequences."""

    configs: Sequence[Config]
    stop_action_to_vlm_grad: bool = False
    cache_dtype: str | None = None
    attn_impl: str = "auto"
    quant: str | None = None

    @nn.compact
    def __call__(self, xs, positions, attn_mask, kv_cache):
        cfg0 = self.configs[0]
        if not all(
            (c.head_dim, c.num_heads, c.num_kv_heads)
            == (cfg0.head_dim, cfg0.num_heads, cfg0.num_kv_heads)
            for c in self.configs
        ):
            raise ValueError("experts must share head geometry")

        qs, ks, vs = [], [], []
        for i, (x, config) in enumerate(zip(xs, self.configs, strict=True)):
            if x is None:
                continue
            if config.num_kv_heads == config.num_heads:
                qkv = lora.Einsum(
                    shape=(3, config.num_heads, config.width, config.head_dim),
                    name=_name("qkv_einsum", i),
                    init_fn=nn.initializers.lecun_normal(
                        in_axis=-2, out_axis=-1, batch_axis=(0, 1)
                    ),
                    lora_config=config.lora_configs.get("attn"),
                    quant=self.quant,
                )("BSD,3KDH->3BSKH", x)
                q, k, v = qkv[0], qkv[1], qkv[2]
            else:
                q = lora.Einsum(
                    shape=(config.num_heads, config.width, config.head_dim),
                    name=_name("q_einsum", i),
                    init_fn=nn.initializers.lecun_normal(
                        in_axis=-2, out_axis=-1, batch_axis=(0,)
                    ),
                    lora_config=config.lora_configs.get("attn"),
                    quant=self.quant,
                )("BTD,NDH->BTNH", x)
                kv = lora.Einsum(
                    shape=(2, config.num_kv_heads, config.width, config.head_dim),
                    name=_name("kv_einsum", i),
                    init_fn=nn.initializers.lecun_normal(
                        in_axis=-2, out_axis=-1, batch_axis=(0, 1)
                    ),
                    lora_config=config.lora_configs.get("attn"),
                    quant=self.quant,
                )("BSD,2KDH->2BSKH", x)
                k, v = kv[0], kv[1]
            qs.append(q)
            ks.append(k)
            vs.append(v)

        q = jnp.concatenate(qs, axis=1)
        k = jnp.concatenate(ks, axis=1)
        v = jnp.concatenate(vs, axis=1)

        from lap_tpu.ops.rope import apply_rope

        q = apply_rope(q, positions)
        q = q * cfg0.head_dim**-0.5
        k = apply_rope(k, positions)

        if kv_cache is not None:
            idx, cache_k, cache_v = kv_cache
            if xs[0] is not None:
                # Single-token AR decode step.
                idx, k, v = update_cache(k, v, idx, cache_k, cache_v)
            else:
                # Suffix decode (e.g. flow-matching action expert): fresh
                # suffix K/V appended after the cached prefix. Measured on
                # v5e (round 4): this concat is FREE at LAP-3B shape — XLA
                # fuses the concatenated K/V into the attention reads
                # without materializing it. An explicit preallocated-cache
                # dynamic_update_slice variant (threaded through the Euler
                # carry) was tried and REGRESSED latency ~1-8% because the
                # update forces a materialized copy; don't re-attempt.
                idx = idx + k.shape[1]
                k = jnp.concatenate([cache_k, k], axis=1)
                v = jnp.concatenate([cache_v, v], axis=1)
        else:
            idx, k, v = init_cache(k, v, attn_mask.shape[-1], self.cache_dtype)

        stop_grad = (
            self.stop_action_to_vlm_grad and xs[0] is not None and kv_cache is None
        )
        if stop_grad:
            # Queries from experts != 0 must not backprop into expert-0 K/V.
            # Split query rows at the expert-0 boundary; the second call sees
            # stop_gradient'd expert-0 keys/values. Forward values identical
            # to the reference's logit-surgery formulation.
            l0 = xs[0].shape[1]
            k_sg = jnp.concatenate([jax.lax.stop_gradient(k[:, :l0]), k[:, l0:]], axis=1)
            v_sg = jnp.concatenate([jax.lax.stop_gradient(v[:, :l0]), v[:, l0:]], axis=1)
            out0 = attention(
                q[:, :l0], k, v, attn_mask[:, :l0], scale=1.0, impl=self.attn_impl
            )
            out1 = attention(
                q[:, l0:], k_sg, v_sg, attn_mask[:, l0:], scale=1.0, impl=self.attn_impl
            )
            encoded = jnp.concatenate([out0, out1], axis=1)
        else:
            encoded = attention(q, k, v, attn_mask, scale=1.0, impl=self.attn_impl)

        out = []
        start = 0
        for i, (x, config) in enumerate(zip(xs, self.configs, strict=True)):
            if x is None:
                out.append(None)
                continue
            end = start + x.shape[1]
            proj = lora.Einsum(
                shape=(config.num_heads, config.head_dim, config.width),
                name=_name("attn_vec_einsum", i),
                init_fn=nn.initializers.lecun_normal(in_axis=(-3, -2), out_axis=-1),
                lora_config=config.lora_configs.get("attn"),
                quant=self.quant,
            )
            out.append(proj("BTNH,NHD->BTD", encoded[:, start:end]))
            start = end
        return out, (idx, k, v)


def _gated_residual(x, y, gate):
    if x is None:
        return None
    return x + y if gate is None else x + y * gate


class Block(nn.Module):
    configs: tuple[Config, ...]
    stop_action_to_vlm_grad: bool = False
    cache_dtype: str | None = None
    dropout: float = 0.0
    attn_impl: str = "auto"
    quant: str | None = None

    @nn.compact
    def __call__(self, xs, kv_cache, positions, attn_mask, adarms_cond, deterministic=True):
        xs = activation_sharding_constraint(xs)
        drop = (
            nn.Dropout(self.dropout)
            if self.dropout
            else (lambda x, _det: x)
        )

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
        )(pre, positions, attn_mask, kv_cache)
        post = jax.tree.map(lambda x: drop(x, deterministic), post)
        xs = [_gated_residual(x, y, g) for x, y, g in zip(xs, post, gates, strict=True)]
        xs = activation_sharding_constraint(xs)

        outs, gates = [], []
        for i, (x, config) in enumerate(zip(xs, self.configs, strict=True)):
            gate = None
            if x is not None:
                x, gate = RMSNorm(name=_name("pre_ffw_norm", i))(x, adarms_cond[i])
                x = lora.FeedForward(
                    features=config.width,
                    hidden_dim=config.mlp_dim,
                    name=_name("mlp", i),
                    lora_config=config.lora_configs.get("ffn"),
                    quant=self.quant,
                )(x)
            outs.append(x)
            gates.append(gate)
        outs = jax.tree.map(lambda x: drop(x, deterministic), outs)
        xs = [_gated_residual(x, y, g) for x, y, g in zip(xs, outs, gates, strict=True)]
        xs = activation_sharding_constraint(xs)
        return xs, kv_cache


def pipelined_block_stack(
    pipe, *, block, stacked, xs, static, apply_block, dropout, deterministic, remat
):
    """Shared GPipe routing for the gemma/gemma3 backbones.

    One pipeline stage is a plain (unscanned, un-remat'd) detached ``block``
    applied functionally on per-layer slices of ``stacked`` (params plus any
    extra per-layer scanned inputs — gemma3's global/sliding flags);
    ``pipeline_apply`` re-applies remat per layer. The per-expert hidden
    states ``xs`` are the ppermute carry; masks/positions/adaRMS/image-mask
    go through ``static`` (read per tick, never permuted). Activation
    sharding constraints inside the blocks are suspended: per-device code
    inside ``shard_map`` has no global view for them to act on.
    ``apply_block(block, layer_slice, xs, static) -> xs`` adapts each
    backbone's ``Block.__call__`` signature.
    """
    if dropout and not deterministic:
        raise ValueError(
            "pipeline parallelism supports deterministic forwards only "
            "(dropout rngs cannot thread through the stage shard_map)"
        )

    def stage(layer, xs_mb, st):
        with suspend_mesh():
            return apply_block(block, layer, xs_mb, st)

    return pipeline_apply(
        stage,
        stacked,
        xs,
        static=static,
        mesh=pipe.mesh,
        n_microbatches=pipe.n_microbatches,
        remat=remat,
    )


class Module(nn.Module):
    """The multi-expert transformer: scanned, rematerialized blocks."""

    configs: Sequence[Config]
    embed_dtype: str = "bfloat16"
    dropout: float = 0.0
    adarms: bool = False
    stop_action_to_vlm_grad: bool = False
    cache_dtype: str | None = None
    attn_impl: str = "auto"
    vocab_size: int = PALIGEMMA_VOCAB_SIZE
    # Layer-scan unroll factor. 1 for training (smallest compile + remat
    # memory); higher for latency-critical decode so XLA can overlap layer
    # N+1's weight prefetch with layer N's compute.
    scan_unroll: int = 1
    # Rematerialization policy for the scanned blocks: "nothing_saveable"
    # (recompute everything in backward — smallest memory, reference
    # behavior), "dots_with_no_batch_dims_saveable", or "none" (no remat —
    # fastest backward, highest activation memory; fits small models/meshes
    # with generous HBM).
    remat_policy: str = "nothing_saveable"
    # Layers as one nn.scan over stacked params (training / checkpoint
    # layout) vs depth separate blocks "layers_{i}" (serving-only). The
    # unscanned form exists for the int8 decode path: Pallas kernels cannot
    # fuse the scan's per-layer weight slice (it would materialize a copy
    # per layer), so quantized weights must be real per-layer arrays. Use
    # ``unstack_layer_params`` to convert a scan-stacked checkpoint.
    scan_layers: bool = True
    # Weight-only quantization of the decode matmuls ("int8", "int4" or
    # None). Serving-only and opt-in: requires a populated "quant" variable
    # collection (see lap_model.LAP.quantize_fn / policy_config).
    quant: str | None = None

    def setup(self):
        if not all(c.depth == self.configs[0].depth for c in self.configs):
            raise ValueError("experts must share depth")
        self.embedder = Embedder(
            vocab_size=self.vocab_size,
            embed_dim=self.configs[0].width,
            quant=self.quant,
            name="embedder",
        )
        block_kwargs = dict(
            configs=tuple(self.configs),
            dropout=self.dropout,
            stop_action_to_vlm_grad=self.stop_action_to_vlm_grad,
            cache_dtype=self.cache_dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
        )
        if not self.scan_layers:
            # Serving-only: plain per-layer blocks, no remat (no backward).
            self.blocks = [
                Block(**block_kwargs, name=f"layers_{i}")
                for i in range(self.configs[0].depth)
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
                    # __call__ args counting self at 0: deterministic is 6.
                    # (5 would mark adarms_cond, leaving the deterministic
                    # bool traced — a TracerBoolConversionError the moment
                    # dropout > 0 puts a Python `if` on it.)
                    static_argnums=(6,),
                    policy=getattr(jax.checkpoint_policies, self.remat_policy),
                )
            self.layers = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.configs[0].depth,
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
        positions: jnp.ndarray,
        mask: jnp.ndarray,
        adarms_cond: Sequence[jnp.ndarray | None] | None = None,
        *,
        kv_cache=None,
        deterministic: bool = True,
    ):
        """Run the stack.

        Args:
            embedded: per-expert [B, T_i, D_i] embeddings (None = skip expert).
            positions: [B, T_total] token positions.
            mask: [B, T_total, S] boolean attention mask.
            adarms_cond: per-expert conditioning vectors for adaptive RMSNorm.
            kv_cache: (idx, k, v) from a previous call, or None.

        Returns:
            (per-expert final-normed outputs, kv_cache)
        """
        embedded = jax.tree.map(lambda e: e.astype(self.embed_dtype), embedded)
        if adarms_cond is None:
            adarms_cond = [None] * len(self.configs)
        # Pin the [B, W] conditioning vectors to the data axes: without this
        # GSPMD tries to honor the fsdp-sharded modulation-Dense kernels on
        # the activation side in the scan backward and falls into involuntary
        # full rematerializations (norm reduce_sum / silu add_any reshards).
        adarms_cond = activation_sharding_constraint(adarms_cond)
        pipe = (
            current_pipeline()
            if self.scan_layers and kv_cache is None and not self.is_initializing()
            else None
        )
        if pipe is not None:
            # GPipe pipeline parallelism (set_pipeline context active):
            # the scanned block stack runs stage-sharded over the mesh's pp
            # axis. Training forward only — no KV cache is materialized
            # (decode paths never run under a pipeline context).
            embedded = self._pipelined_layers(
                pipe, embedded, positions, mask, adarms_cond, deterministic
            )
            kv_cache = None
        elif self.scan_layers:
            embedded, kv_cache = self.layers(
                embedded, kv_cache, positions, mask, adarms_cond, deterministic
            )
        else:
            layer_caches = []
            for i, block in enumerate(self.blocks):
                layer_in = (
                    None
                    if kv_cache is None
                    else jax.tree.map(lambda c, i=i: c[i], kv_cache)
                )
                embedded, layer_out = block(
                    embedded, layer_in, positions, mask, adarms_cond, deterministic
                )
                layer_caches.append(layer_out)
            # Same stacked [L, ...] cache layout as the scanned form.
            kv_cache = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_caches)
        out = [
            f(e, a)[0] if e is not None else None
            for f, e, a in zip(self.final_norms, embedded, adarms_cond, strict=True)
        ]
        return out, kv_cache

    def _pipelined_layers(
        self, pipe, embedded, positions, mask, adarms_cond, deterministic
    ):
        """Run the block stack as a GPipe pipeline over ``pipe.mesh``'s pp axis.

        The scan-stacked ``layers`` params (leading ``[depth]`` axis — exactly
        the layout ``pipeline_apply`` wants) are read from this module's
        variables and fed through the shared ``pipelined_block_stack``
        routing; see that helper for the stage construction and the
        carry-vs-static split.
        """
        block = Block(
            configs=tuple(self.configs),
            dropout=0.0,
            stop_action_to_vlm_grad=self.stop_action_to_vlm_grad,
            cache_dtype=self.cache_dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            # Detached standalone module (not a registered submodule): the
            # stage applies it functionally on per-layer param slices.
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
                True,
            )
            return out

        return pipelined_block_stack(
            pipe,
            block=block,
            stacked={"params": self.variables["params"]["layers"]},
            xs=list(embedded),
            static={
                "positions": positions,
                "mask": mask,
                "adarms": list(adarms_cond),
            },
            apply_block=apply_block,
            dropout=self.dropout,
            deterministic=deterministic,
            remat=self.remat_policy != "none",
        )

    def init_params(self, use_adarms: Sequence[bool]):
        """Initialize every parameter (linen requires touching all paths)."""
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
