"""LAPGemma3: the Gemma3-backbone LAP variant.

Capability parity with lihzha/lap ``src/lap/models/lap_gemma3.py``: images
enter the token sequence as 256 IMAGE_TOKEN (262145) placeholders that are
replaced post-embedding by SigLIP outputs; an ``image_mask`` drives
bidirectional image attention inside the Gemma3 blocks; sampling overrides
thread the image mask and right-align with it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.models import gemma3 as _gemma3
from lap_tpu.models import siglip as _siglip
from lap_tpu.models.lap_model import LAP, put_along_last_axis
from lap_tpu.models.preprocessing import preprocess_observation
from lap_tpu.parallel.mesh import activation_sharding_constraint
from lap_tpu.models.tokenizer import (
    GEMMA3_EOS_TOKEN,
    GEMMA3_IMAGE_TOKEN,
)
from lap_tpu.ops.masks import make_attn_mask

SIGLIP_PATCH_SIZE = 14


def left_to_right_align_with_image_mask(x, input_mask, attn_mask, image_mask):
    """Right-align sequences, rolling the image mask along
    (reference lap_gemma3.py:44-63)."""
    size = x.shape[1]
    # Reference rolls by -(last valid index + 1) == left shift by seqlen,
    # which wraps valid tokens to the right end.
    seqlen = jnp.max(
        input_mask * jnp.arange(size)[None, :], axis=1
    ) + 1
    idx = (jnp.arange(size)[None, :] + seqlen[:, None]) % size
    x_al = jnp.take_along_axis(x, idx[..., None], axis=1)
    mask_al = jnp.take_along_axis(input_mask, idx, axis=1)
    img_al = jnp.take_along_axis(image_mask, idx, axis=1)
    attn_al = jnp.take_along_axis(attn_mask, idx[:, :, None], axis=1)
    attn_al = jnp.take_along_axis(attn_al, idx[:, None, :], axis=2)
    attn_al = attn_al & mask_al[:, None, :] & mask_al[:, :, None]
    return x_al, mask_al, attn_al, img_al


class LAPGemma3(LAP):
    """LAP on a Gemma3 multi-expert backbone with inline image tokens."""

    EOS_TOKEN: int = GEMMA3_EOS_TOKEN
    VOCAB_SIZE: int = _gemma3.GEMMA3_VOCAB_SIZE
    IMAGE_TOKEN: int = GEMMA3_IMAGE_TOKEN

    def setup(self):
        cfg = self.config
        if "gemma3" not in cfg.paligemma_variant or "gemma3" not in cfg.action_expert_variant:
            raise ValueError("LAPGemma3 requires gemma3 variants for both experts")
        paligemma_config = _gemma3.get_config(cfg.paligemma_variant)
        action_cfg = _gemma3.get_config(cfg.action_expert_variant)
        configs = [paligemma_config]
        if cfg.enable_action_training:
            configs.append(action_cfg)
            self.action_in_proj = nn.Dense(action_cfg.width, name="action_in_proj")
            if cfg.pi05:
                self.time_mlp_in = nn.Dense(action_cfg.width, name="time_mlp_in")
                self.time_mlp_out = nn.Dense(action_cfg.width, name="time_mlp_out")
            else:
                self.state_proj = nn.Dense(action_cfg.width, name="state_proj")
                self.action_time_mlp_in = nn.Dense(action_cfg.width, name="action_time_mlp_in")
                self.action_time_mlp_out = nn.Dense(action_cfg.width, name="action_time_mlp_out")
            self.action_out_proj = nn.Dense(cfg.action_dim, name="action_out_proj")
            self._action_width = action_cfg.width
        self.llm = _gemma3.Module(
            configs=configs,
            embed_dtype=cfg.dtype,
            adarms=cfg.pi05,
            stop_action_to_vlm_grad=cfg.stop_action_to_vlm_grad,
            cache_dtype=cfg.dtype,
            attn_impl=cfg.attn_impl,
            scan_unroll=cfg.scan_unroll,
            remat_policy=cfg.remat_policy,
            scan_layers=cfg.scan_layers,
            quant=cfg.quant,
            name="llm",
        )
        # Gemma3 SigLIP: RMS soft-embedding norm, average pooling to 256
        # tokens, bias-free head to the LLM width.
        h, w = cfg.image_resolution
        grid = (h // SIGLIP_PATCH_SIZE) * (w // SIGLIP_PATCH_SIZE)
        pool_to = min(256, grid)
        self.img = _siglip.SigLIP(
            config=_siglip.get_config(
                cfg.siglip_variant,
                pool_to_tokens=pool_to,
                head_dim_out=paligemma_config.width,
                head_bias=False,
                soft_embedding_norm=True,
            ),
            dtype=cfg.dtype,
            attn_impl=cfg.attn_impl,
            name="img",
        )
        self._num_experts = len(configs)
        self._image_tokens_per_cam = pool_to

    # ------------------------------------------------------------------
    def _embed_images(self, obs):
        names = list(obs.images.keys())
        b = obs.state.shape[0]
        stacked = jnp.concatenate([obs.images[n] for n in names], axis=0)
        tokens_all = self.img(stacked, train=False)
        # Route each per-camera slice through activation_sharding_constraint
        # (batch over data axes; token dim over tp under sequence
        # parallelism): the sp-constrained ViT output otherwise meets a
        # batch-axis dynamic-slice and SPMD falls back to involuntary full
        # rematerialization of the slice (same fix as LAP.embed_prefix).
        # Under a pipeline context the pins are skipped for the same reason
        # as there: pp never composes with tp/sp, and on a (dp, pp, fsdp)
        # mesh the pins themselves become the conflict site between the ViT
        # backward's propagated sharding and the batch layout.
        from lap_tpu.parallel.pipeline import current_pipeline

        pin = (lambda t: t) if current_pipeline() else activation_sharding_constraint
        per_cam = [pin(t) for t in jnp.split(tokens_all, len(names), axis=0)]
        toks, masks = [], []
        for name, tok in zip(names, per_cam, strict=True):
            toks.append(tok)
            masks.append(jnp.broadcast_to(obs.image_masks[name][:, None], (b, tok.shape[1])))
        return jnp.concatenate(toks, axis=1), jnp.concatenate(masks, axis=1)

    def _replace_placeholders(
        self, token_embeddings, token_mask, token_ar_mask, tokenized, image_embeddings, image_mask
    ):
        is_placeholder = tokenized == self.IMAGE_TOKEN
        b = token_embeddings.shape[0]
        n_patches = image_mask.shape[1]
        placeholder_idx = jnp.clip(jnp.cumsum(is_placeholder, axis=1) - 1, 0, n_patches - 1)
        batch_idx = jnp.arange(b)[:, None]
        sel_emb = image_embeddings[batch_idx, placeholder_idx]
        sel_mask = image_mask[batch_idx, placeholder_idx]
        out_emb = jnp.where(is_placeholder[..., None], sel_emb.astype(token_embeddings.dtype), token_embeddings)
        out_mask = jnp.where(is_placeholder, sel_mask, token_mask)
        out_ar = jnp.where(is_placeholder, False, token_ar_mask)
        return out_emb, out_mask, out_ar

    def embed_prefix(self, obs):
        """Returns (tokens, mask, ar_mask, image_mask)."""
        tokenized_safe = jnp.where(obs.tokenized_prompt == self.IMAGE_TOKEN, 0, obs.tokenized_prompt)
        token_embeddings = self.llm.embed(tokenized_safe)
        token_mask = obs.tokenized_prompt_mask
        if obs.tokenized_langact_mask is not None:
            token_ar_mask = obs.tokenized_langact_mask
        else:
            token_ar_mask = jnp.zeros_like(token_mask, dtype=bool)
        image_embeddings, siglip_mask = self._embed_images(obs)
        prefix_tokens, prefix_mask, prefix_ar = self._replace_placeholders(
            token_embeddings, token_mask, token_ar_mask, obs.tokenized_prompt,
            image_embeddings, siglip_mask,
        )
        image_mask = obs.tokenized_prompt == self.IMAGE_TOKEN
        return prefix_tokens, prefix_mask, prefix_ar, image_mask

    def _build_prefix_action_mask(self, prefix_mask, obs):
        if obs.tokenized_langact_mask is None:
            return prefix_mask
        return prefix_mask & ~obs.tokenized_langact_mask

    def _embed_prefix_for_loss(self, observation, suffix_inputs):
        prefix_tokens, prefix_mask, prefix_ar, image_mask = self.embed_prefix(observation)
        if suffix_inputs is not None:
            suffix_len = suffix_inputs["suffix_tokens"].shape[1]
            image_mask = jnp.concatenate(
                [image_mask, jnp.zeros((image_mask.shape[0], suffix_len), bool)], axis=1
            )
        return prefix_tokens, prefix_mask, prefix_ar, {"image_mask": image_mask}

    # ------------------------------------------------------------------
    def sample_actions(self, rng, observation, *, num_steps: int = 10, noise=None):
        cfg = self.config
        observation = preprocess_observation(
            None, observation, train=False, image_keys=cfg.image_keys,
            image_resolution=cfg.image_resolution, aug_wrist_image=cfg.aug_wrist_image,
        )
        dt = np.float32(-1.0 / num_steps)
        batch_size = observation.state.shape[0]
        if noise is None:
            noise = jax.random.normal(rng, (batch_size, cfg.action_horizon, cfg.action_dim))

        prefix_tokens, prefix_mask, prefix_ar, image_mask = self.embed_prefix(observation)
        prefix_attn = make_attn_mask(prefix_mask, prefix_ar)
        positions = jnp.cumsum(prefix_mask, axis=1) - 1
        _, kv_cache = self.llm(
            [prefix_tokens, None], positions, prefix_attn, [None, None],
            image_mask=image_mask,
        )
        prefix_len = prefix_tokens.shape[1]

        def step(carry):
            x_t, time = carry
            suffix_tokens, suffix_mask, suffix_ar, adarms_cond = self.embed_suffix(
                observation, x_t, jnp.broadcast_to(time, (batch_size,))
            )
            suffix_ar_b = jnp.broadcast_to(suffix_ar[None], suffix_mask.shape)
            suffix_attn = make_attn_mask(suffix_mask, suffix_ar_b)
            prefix_rows = jnp.broadcast_to(
                prefix_mask[:, None, :], (batch_size, suffix_tokens.shape[1], prefix_len)
            )
            full_mask = jnp.concatenate([prefix_rows, suffix_attn], axis=-1)
            pos = jnp.sum(prefix_mask, axis=-1)[:, None] + jnp.cumsum(suffix_mask, -1) - 1
            suffix_image_mask = jnp.zeros(suffix_mask.shape, bool)
            (_, suffix_out), _ = self.llm(
                [None, suffix_tokens], pos, full_mask, [None, adarms_cond],
                image_mask=suffix_image_mask, kv_cache=kv_cache,
            )
            v_t = self.action_out_proj(suffix_out[:, -cfg.action_horizon :].astype(jnp.float32))
            return x_t + dt * v_t, time + dt

        # Static trip count -> unrolled straight-line XLA (see lap_model.py:
        # removes while_loop launch overhead, enables cross-step prefetch).
        x_t, time = noise, np.float32(1.0)
        for _ in range(num_steps):
            x_t, time = step((x_t, time))
        return x_t

    def sample_tokens(self, rng, observation, *, max_decoding_steps: int = 390, temperature: float = 0.0, stop_on_eos: bool = True):
        cfg = self.config
        observation = preprocess_observation(
            None, observation, train=False, image_keys=list(observation.images.keys()),
            image_resolution=cfg.image_resolution, aug_wrist_image=cfg.aug_wrist_image,
        )
        prefix_tokens, prefix_mask, prefix_ar, image_mask = self.embed_prefix(observation)
        prefix_attn = make_attn_mask(prefix_mask, prefix_ar)
        prefix_tokens, prefix_mask, prefix_attn, image_mask = (
            left_to_right_align_with_image_mask(prefix_tokens, prefix_mask, prefix_attn, image_mask)
        )
        b = prefix_tokens.shape[0]
        prefill_size = prefix_tokens.shape[1]
        prefill_len = jnp.sum(prefix_mask, axis=-1)
        prefix_start = prefill_size - prefill_len
        n_exp = self._num_experts

        prefix_attn = jnp.pad(prefix_attn, ((0, 0), (0, 0), (0, max_decoding_steps)))
        positions = jnp.cumsum(prefix_mask, axis=-1) - 1
        pre_logits, kv_cache = self.llm(
            [prefix_tokens] + [None] * (n_exp - 1), positions, prefix_attn,
            [None] * n_exp, image_mask=image_mask,
        )
        last_logit = self.llm.decode_logits(pre_logits[0][:, -1:])
        output_tokens = jnp.zeros((b, max_decoding_steps), jnp.int32)
        decode_image_mask = jnp.zeros((b, 1), bool)

        def step(carry):
            rng, last_logit, output_tokens, cache, eos_mask, step_i = carry
            rng, rng_step = jax.random.split(rng)
            token = jax.lax.cond(
                temperature > 0.0,
                lambda: jax.random.categorical(
                    rng_step, last_logit / jnp.maximum(temperature, 1e-6), axis=-1
                ).astype(jnp.int32),
                lambda: jnp.argmax(last_logit, axis=-1).astype(jnp.int32),
            )
            # Rows that already emitted EOS must stop writing: in a coalesced
            # batch the while_loop keeps running until *every* row finishes,
            # and unmasked writes would fill early-finishing rows with
            # continuation text (same fix as LAP.sample_tokens).
            token = jnp.where(eos_mask[:, None], jnp.zeros_like(token), token)
            output_tokens = put_along_last_axis(
                output_tokens, jnp.broadcast_to(step_i, (b, 1)), token
            )
            eos_mask = eos_mask | (jnp.squeeze(token, -1) == self.EOS_TOKEN)
            token_embedding = self.llm.embed(token)
            pos = prefill_len[:, None] + step_i
            total = prefill_size + max_decoding_steps
            col = jnp.arange(total)[None, None, :]
            mask = (col >= prefix_start[:, None, None]) & (col < (prefill_size + step_i + 1))
            last_prelogit, cache = self.llm(
                [token_embedding] + [None] * (n_exp - 1), pos, mask, [None] * n_exp,
                image_mask=decode_image_mask, kv_cache=cache,
            )
            last_logit = self.llm.decode_logits(last_prelogit[0])
            return rng, last_logit, output_tokens, cache, eos_mask, step_i + 1

        def cond(carry):
            *_, eos_mask, step_i = carry
            not_done = ~jnp.all(eos_mask) if stop_on_eos else jnp.bool_(True)
            return not_done & (step_i < max_decoding_steps)

        _, _, output_tokens, _, _, _ = jax.lax.while_loop(
            cond, step, (rng, last_logit, output_tokens, kv_cache, jnp.zeros((b,), bool), 0)
        )
        return output_tokens
