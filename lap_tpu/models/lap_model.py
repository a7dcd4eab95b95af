"""LAP: the language-action pretraining policy model, TPU-native.

Capability parity with lihzha/lap ``src/lap/models/lap.py`` (which subclasses
openpi's Pi0): a SigLIP ViT + multi-expert Gemma VLM whose expert 0 carries
images + prompt + chain-of-thought "language actions" (cross-entropy loss)
and whose expert 1 is a small action expert decoding continuous action chunks
by flow matching (MSE on the velocity field), with pi0.5-style adaptive
RMSNorm time conditioning.

Implemented as a single flax.linen module with a plain params pytree (the
reference wraps linen in an NNX bridge); all sampling loops are
``lax.while_loop`` over a KV cache, jit-compiled end to end.

Behavioral contract preserved (reference line references in method docs):
- attention pattern: images+prompt bidirectional; langact causal; action
  tokens attend images+prompt but NOT langact; langact does not attend
  actions (lap.py:303-364)
- flow matching: x_t = t*noise + (1-t)*a, target u_t = noise - a,
  t ~ Beta(1.5, 1)*0.999+0.001 (lap.py:185-207)
- sample_actions: prefix prefill then 10 Euler steps in a while_loop
  (lap.py:604-675); sample_tokens: right-aligned prefill + greedy/temperature
  AR decode with EOS tracking (lap.py:677-766)
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.models import gemma as _gemma
from lap_tpu.models import metrics as _metrics
from lap_tpu.models import siglip as _siglip
from lap_tpu.models.preprocessing import preprocess_observation
from lap_tpu.models.types import (
    IMAGE_RESOLUTION,
    CoTObservation,
    fake_obs,
)
from lap_tpu.ops.masks import make_attn_mask
from lap_tpu.parallel.mesh import activation_sharding_constraint

PALIGEMMA_VOCAB_SIZE = _gemma.PALIGEMMA_VOCAB_SIZE


@dataclasses.dataclass(frozen=True)
class LAPConfig:
    """Model configuration (mirrors lihzha/lap lap_config.py:23-111)."""

    dtype: str = "bfloat16"
    paligemma_variant: str = "gemma_2b"
    action_expert_variant: str = "gemma_300m"
    siglip_variant: str = "So400m/14"

    action_dim: int = 7
    action_horizon: int = 16
    max_token_len: int = 220

    verbose_mode: bool = False
    pi05: bool = True
    discrete_state_input: bool = True
    prompt_format: str = "lap"
    prediction_format: str = "default"
    use_fast: bool = False

    aug_wrist_image: bool = True
    enable_image_augmentation: bool = True
    use_bimanual: bool = False

    enable_action_training: bool = False
    enable_langact_training: bool = True
    enable_prediction_training: bool = False
    enable_vqa_training: bool = False
    language_loss_weight: float = 1.0
    action_loss_weight: float = 1.0
    prediction_loss_weight: float = 1.0
    vqa_loss_weight: float = 0.1
    vqa_loss_weights: dict | None = None

    state_dropout: float = 0.0
    reasoning_mask_prob: float = 0.0
    stop_action_to_vlm_grad: bool = False

    # Attention implementation override ("auto" / "flash" / "xla").
    attn_impl: str = "auto"
    # Layer-scan unroll factor for the LLM backbone. Keep 1 for training
    # (smallest compile + remat memory); raise for latency-critical serving
    # so XLA overlaps layer N+1's weight prefetch with layer N's compute.
    scan_unroll: int = 1
    # Block remat policy ("nothing_saveable" / "none" / any
    # jax.checkpoint_policies name). See gemma.Module.remat_policy.
    remat_policy: str = "nothing_saveable"
    # Serving-only knobs (set by policy_config when quantized serving is
    # requested): scan_layers=False builds per-layer blocks whose weights
    # are real arrays (required for the Pallas dequant kernels; see
    # gemma.Module.scan_layers), quant="int8"/"int4" streams decode-shaped
    # matmuls through quantized weight copies in the "quant" collection.
    scan_layers: bool = True
    quant: str | None = None

    @property
    def image_keys(self) -> tuple[str, ...]:
        if self.use_bimanual:
            return ("base_0_rgb", "left_wrist_0_rgb", "right_wrist_0_rgb")
        return ("base_0_rgb", "left_wrist_0_rgb")

    # (224, 224) in the reference; configurable here so unit tests can run a
    # small ViT on small frames.
    image_resolution: tuple[int, int] = IMAGE_RESOLUTION

    @property
    def model_type(self) -> str:
        return "lap_fast" if self.use_fast else "lap"

    @property
    def backbone_depth(self) -> int:
        """Layer count of the VLM backbone (= full scan_unroll value)."""
        if "gemma3" in self.paligemma_variant:
            from lap_tpu.models import gemma3 as _gemma3

            return _gemma3.get_config(self.paligemma_variant).num_layers
        return _gemma.get_config(self.paligemma_variant).depth

    def create_module(self) -> "LAP":
        if "gemma3" in self.paligemma_variant:
            from lap_tpu.models.lap_gemma3 import LAPGemma3

            return LAPGemma3(config=self)
        return LAP(config=self)

    def fake_obs(self, batch_size: int = 1) -> CoTObservation:
        return fake_obs(
            batch_size=batch_size,
            image_keys=self.image_keys,
            action_dim=self.action_dim,
            max_token_len=self.max_token_len,
            resolution=self.image_resolution,
        )

    def fake_actions(self, batch_size: int = 1):
        return jnp.zeros((batch_size, self.action_horizon, self.action_dim))

    def inputs_spec(self, *, batch_size: int = 1):
        obs = self.fake_obs(batch_size)
        actions = self.fake_actions(batch_size)
        return (
            jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), obs),
            jax.ShapeDtypeStruct(actions.shape, actions.dtype),
        )


def posemb_sincos(
    pos, embedding_dim: int, min_period: float, max_period: float
) -> jnp.ndarray:
    """Sine-cosine time embedding (openpi pi0 semantics)."""
    if embedding_dim % 2 != 0:
        raise ValueError("embedding_dim must be even")
    fraction = jnp.linspace(0.0, 1.0, embedding_dim // 2)
    period = min_period * (max_period / min_period) ** fraction
    angles = jnp.einsum(
        "i,j->ij", pos, 1.0 / period * 2 * jnp.pi, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def left_to_right_align(x, input_mask, attn_mask):
    """Right-align valid tokens (padding moves to the left).

    Equivalent to openpi pi0_fast.left_to_right_align as used at
    lap.py:699: assumes valid tokens are currently left-aligned.
    """
    size = x.shape[1]
    shift = size - jnp.sum(input_mask, axis=1)
    idx = (jnp.arange(size)[None, :] - shift[:, None]) % size
    x_al = jnp.take_along_axis(x, idx[..., None], axis=1)
    mask_al = jnp.take_along_axis(input_mask, idx, axis=1)
    attn_al = jnp.take_along_axis(attn_mask, idx[:, :, None], axis=1)
    attn_al = jnp.take_along_axis(attn_al, idx[:, None, :], axis=2)
    # Padding (wrapped-around) keys must stay unattendable.
    valid = mask_al
    attn_al = attn_al & valid[:, None, :] & valid[:, :, None]
    return x_al, mask_al, attn_al


def put_along_last_axis(arr, idx, vals):
    """Scatter ``vals`` into ``arr`` at last-axis positions ``idx``."""
    iota = jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)
    return jnp.where(iota == idx, vals.astype(arr.dtype), arr)


class LAP(nn.Module):
    """Flow-matching + language-action policy on a 2-expert Gemma."""

    config: LAPConfig

    EOS_TOKEN: int = 1
    VOCAB_SIZE: int = PALIGEMMA_VOCAB_SIZE

    def setup(self):
        cfg = self.config
        paligemma_config = _gemma.get_config(cfg.paligemma_variant)
        configs = [paligemma_config]
        if cfg.enable_action_training:
            action_cfg = _gemma.get_config(cfg.action_expert_variant)
            configs.append(action_cfg)
            self.action_in_proj = nn.Dense(action_cfg.width, name="action_in_proj")
            if cfg.pi05:
                self.time_mlp_in = nn.Dense(action_cfg.width, name="time_mlp_in")
                self.time_mlp_out = nn.Dense(action_cfg.width, name="time_mlp_out")
            else:
                self.state_proj = nn.Dense(action_cfg.width, name="state_proj")
                self.action_time_mlp_in = nn.Dense(
                    action_cfg.width, name="action_time_mlp_in"
                )
                self.action_time_mlp_out = nn.Dense(
                    action_cfg.width, name="action_time_mlp_out"
                )
            self.action_out_proj = nn.Dense(cfg.action_dim, name="action_out_proj")
            self._action_width = action_cfg.width
        self.llm = _gemma.Module(
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
        # big_vision ViT head: per-token Dense projecting to the LLM width
        # (the reference builds siglip with num_classes=paligemma width and
        # pool "none", lap.py:77-85).
        self.img = _siglip.SigLIP(
            config=_siglip.get_config(
                cfg.siglip_variant, head_dim_out=paligemma_config.width
            ),
            dtype=cfg.dtype,
            attn_impl=cfg.attn_impl,
            name="img",
        )
        self._num_experts = len(configs)

    # ------------------------------------------------------------------
    # Embedding
    # ------------------------------------------------------------------

    def embed_prefix(self, obs: CoTObservation):
        """Image tokens (all cameras, one fused ViT pass) + text embeds.

        AR pattern (lap.py:118-170): images and prompt bidirectional; langact
        tokens causal (segment starts from tokenized_langact_mask).
        """
        names = list(obs.images.keys())
        b = obs.state.shape[0]
        stacked = jnp.concatenate([obs.images[n] for n in names], axis=0)
        img_tokens_all = self.img(stacked, train=False)
        # Route each per-camera slice through activation_sharding_constraint
        # (batch over the data axes; token dim over tp under sequence
        # parallelism when it divides): without this, the sp-constrained ViT
        # output meets a batch-axis dynamic-slice and SPMD falls back to
        # involuntary full rematerialization of the slice. Under a pipeline
        # context the pins are skipped: pp never composes with tp/sp (the
        # case they fix), and on a pp mesh the pins themselves become the
        # conflict site between the ViT backward's propagated sharding and
        # the (dp, fsdp) batch layout.
        from lap_tpu.parallel.pipeline import current_pipeline

        pin = (lambda t: t) if current_pipeline() else activation_sharding_constraint
        per_cam = [pin(t) for t in jnp.split(img_tokens_all, len(names), axis=0)]

        tokens, input_mask, ar_mask = [], [], []
        for name, img_tokens in zip(names, per_cam, strict=True):
            s = img_tokens.shape[1]
            tokens.append(img_tokens)
            input_mask.append(jnp.broadcast_to(obs.image_masks[name][:, None], (b, s)))
            ar_mask.append(jnp.zeros((b, s), dtype=bool))

        tokens.append(self.llm.embed(obs.tokenized_prompt))
        input_mask.append(obs.tokenized_prompt_mask)
        if obs.tokenized_langact_mask is not None:
            ar_mask.append(obs.tokenized_langact_mask)
        else:
            ar_mask.append(jnp.zeros(obs.tokenized_prompt.shape, dtype=bool))

        return (
            jnp.concatenate(tokens, axis=1),
            jnp.concatenate(input_mask, axis=1),
            jnp.concatenate(ar_mask, axis=1),
        )

    def embed_suffix(self, obs: CoTObservation, noisy_actions, timestep):
        """Action-expert tokens + adaRMS time conditioning (pi0/pi0.5)."""
        cfg = self.config
        b = noisy_actions.shape[0]
        tokens, input_mask, ar_flags = [], [], []
        if not cfg.pi05:
            state_token = self.state_proj(obs.state)[:, None, :]
            tokens.append(state_token)
            input_mask.append(jnp.ones((b, 1), dtype=bool))
            ar_flags += [True]
        action_tokens = self.action_in_proj(noisy_actions)
        time_emb = posemb_sincos(
            timestep, self._action_width, min_period=4e-3, max_period=4.0
        )
        if cfg.pi05:
            # Pin the [B, W] time-MLP activations to the data axes: the
            # fsdp-sharded Dense kernels otherwise pull the swish backward
            # into an involuntary full rematerialization under (dp,fsdp,tp).
            y = activation_sharding_constraint(nn.swish(self.time_mlp_in(time_emb)))
            adarms_cond = nn.swish(self.time_mlp_out(y))
            expert_tokens = action_tokens
        else:
            time_tokens = jnp.broadcast_to(
                time_emb[:, None, :], (b, cfg.action_horizon, time_emb.shape[-1])
            )
            y = jnp.concatenate([action_tokens, time_tokens], axis=-1)
            y = nn.swish(self.action_time_mlp_in(y))
            expert_tokens = self.action_time_mlp_out(y)
            adarms_cond = None
        tokens.append(expert_tokens)
        input_mask.append(jnp.ones(expert_tokens.shape[:2], dtype=bool))
        # First action token starts a new AR segment; the rest are mutually
        # bidirectional within the chunk.
        ar_flags += [True] + [False] * (cfg.action_horizon - 1)
        return (
            jnp.concatenate(tokens, axis=1),
            jnp.concatenate(input_mask, axis=1),
            jnp.array(ar_flags, dtype=bool),
            adarms_cond,
        )

    def prepare_suffix(self, obs, actions, noise_rng, time_rng):
        """Flow-matching corruption (lap.py:185-207)."""
        batch_shape = actions.shape[:-2]
        noise = jax.random.normal(noise_rng, actions.shape)
        # Beta(1.5, 1) sampled by exact inverse CDF (U^(1/1.5)): identical
        # distribution to jax.random.beta but without the gamma rejection
        # sampler, whose XLA graph takes minutes to compile on TPU.
        time = (
            jax.random.uniform(time_rng, batch_shape) ** (1.0 / 1.5)
        ) * 0.999 + 0.001
        t = time[..., None, None]
        x_t = t * noise + (1 - t) * actions
        u_t = noise - actions
        suffix_tokens, suffix_mask, suffix_ar, adarms_cond = self.embed_suffix(
            obs, x_t, time
        )
        suffix_ar = jnp.broadcast_to(suffix_ar[None, :], suffix_mask.shape)
        return dict(
            suffix_tokens=suffix_tokens,
            suffix_mask=suffix_mask,
            suffix_ar_mask=suffix_ar,
            adarms_cond=adarms_cond,
            u_t=u_t,
        )

    def _embed_prefix_for_loss(self, observation, suffix_inputs):
        """Hook: prefix embedding for compute_loss; subclasses may attach
        extra backbone kwargs (e.g. Gemma3's image_mask)."""
        del suffix_inputs
        tokens, mask, ar_mask = self.embed_prefix(observation)
        return tokens, mask, ar_mask, {}

    # ------------------------------------------------------------------
    # Masks / positions
    # ------------------------------------------------------------------

    def _build_prefix_action_mask(self, prefix_mask, obs):
        """Prefix keys visible to action tokens: images + prompt, not langact."""
        if obs.tokenized_langact_mask is None:
            return prefix_mask
        img_len = prefix_mask.shape[1] - obs.tokenized_langact_mask.shape[1]
        b = prefix_mask.shape[0]
        langact_full = jnp.concatenate(
            [jnp.zeros((b, img_len), dtype=bool), obs.tokenized_langact_mask], axis=1
        )
        return prefix_mask & ~langact_full

    def _build_combined_attention_mask(
        self, prefix_mask, prefix_ar_mask, prefix_mask_action, suffix_mask, suffix_ar_mask
    ):
        prefix_attn = make_attn_mask(prefix_mask, prefix_ar_mask)
        if suffix_mask is None:
            return prefix_attn
        b, p = prefix_mask.shape
        s = suffix_mask.shape[1]
        input_mask = jnp.concatenate([prefix_mask_action, suffix_mask], axis=1)
        ar_mask = jnp.concatenate(
            [jnp.zeros_like(prefix_mask_action), suffix_ar_mask], axis=1
        )
        action_rows = make_attn_mask(input_mask, ar_mask)[:, p:, :]
        prefix_rows = jnp.pad(prefix_attn, ((0, 0), (0, 0), (0, s)))
        return jnp.concatenate([prefix_rows, action_rows], axis=1)

    def _build_combined_positions(self, prefix_mask, prefix_mask_action, suffix_mask):
        prefix_positions = jnp.cumsum(prefix_mask, axis=1) - 1
        if suffix_mask is None:
            return prefix_positions.astype(jnp.int32)
        suffix_positions = (
            jnp.sum(prefix_mask_action, axis=-1, keepdims=True)
            + jnp.cumsum(suffix_mask, axis=-1)
            - 1
        )
        return jnp.concatenate([prefix_positions, suffix_positions], axis=1).astype(
            jnp.int32
        )

    # ------------------------------------------------------------------
    # Losses
    # ------------------------------------------------------------------

    # Token-chunk size for the language CE. Above this many positions the
    # [B, T, V] logits tensor is never materialized: the vocab projection +
    # logsumexp + label gather run per chunk under jax.checkpoint (lax.map),
    # bounding peak CE memory at [B, CHUNK, V] in both passes. At Gemma3's
    # 800-token budget x 262k vocab this is the difference between 6.7 GB of
    # f32 logits (x ~3 live copies in the softmax backward — an OOM on a
    # 16 GB v5e next to params+grads) and ~1 GB. Below the threshold the
    # single-shot path is kept: one chunk under remat would only re-pay the
    # vocab matmul in the backward for no memory win. The value is NOT
    # latency-sensitive: 128/256/512 all measure 541-545 ms on the gemma3_1b
    # 800-token train step (v5e, round 5) — the chunk matmuls stay MXU-bound
    # at [8, 128, V] already, so 256 is chosen for headroom on wider models.
    CE_CHUNK: int = 256

    def _token_logp_and_pred(self, pre_logits, labels, *, need_pred: bool):
        """Per-token label log-prob (f32) and argmax predictions, chunked
        over the token axis (see CE_CHUNK). Numerically identical to the
        single-shot log_softmax + take_along_axis: each token's logsumexp is
        a full-vocab reduction either way. Both branches compute logits via
        ``gemma.tied_table_logits`` — the table is fetched OUTSIDE the
        lax.map body (flax cannot create/read params inside a mapped body
        at init time), and training never takes ``Embedder.decode``'s int8
        fast path (that is decode-shape serving only)."""
        from lap_tpu.models.gemma import tied_table_logits

        table = self.llm.embedder.input_embedding_table  # [V, D] (tied head)
        b, t, d = pre_logits.shape
        chunk = self.CE_CHUNK

        if t <= chunk:
            logits = tied_table_logits(pre_logits, table).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            token_logp = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            pred = jnp.argmax(logits, axis=-1) if need_pred else None
            return token_logp, pred

        n_chunks = -(-t // chunk)
        pad = n_chunks * chunk - t
        pl = jnp.pad(pre_logits, ((0, 0), (0, pad), (0, 0)))
        lb = jnp.pad(labels, ((0, 0), (0, pad)))
        pl = pl.reshape(b, n_chunks, chunk, d).transpose(1, 0, 2, 3)
        lb = lb.reshape(b, n_chunks, chunk).transpose(1, 0, 2)

        def one(args):
            pl_c, lb_c = args
            logits = tied_table_logits(pl_c, table).astype(jnp.float32)  # [B, C, V]
            logz = jax.nn.logsumexp(logits, axis=-1)
            lab = jnp.take_along_axis(logits, lb_c[..., None], axis=-1)[..., 0]
            pred = (
                jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if need_pred
                else jnp.zeros_like(lb_c)
            )
            return lab - logz, pred

        logp, pred = jax.lax.map(jax.checkpoint(one), (pl, lb))
        logp = logp.transpose(1, 0, 2).reshape(b, n_chunks * chunk)[:, :t]
        pred = pred.transpose(1, 0, 2).reshape(b, n_chunks * chunk)[:, :t]
        return logp, (pred if need_pred else None)

    def _compute_language_loss(
        self, obs, prefix_pre_logits, sample_mask=None, *, verbose_mode=False
    ):
        """Shifted CE over langact tokens (lap.py:209-289)."""
        labels = obs.tokenized_prompt[:, 1:]
        pre_logits = prefix_pre_logits[:, :-1]
        pre_logits = pre_logits[:, -labels.shape[1] :]

        loss_mask = (
            obs.tokenized_langact_mask[:, 1:]
            & obs.tokenized_prompt_mask[:, 1:]
            & obs.token_loss_mask[:, 1:]
        )
        ex_mask = None
        if sample_mask is not None:
            ex_mask = jnp.asarray(sample_mask)[..., None]
            loss_mask = loss_mask * ex_mask

        token_logp, predictions = self._token_logp_and_pred(
            pre_logits, labels, need_pred=verbose_mode
        )
        per_sample = -jnp.sum(token_logp * loss_mask, axis=-1) / jnp.clip(
            jnp.sum(loss_mask, -1), 1
        )
        metrics = {"lang_loss": jnp.mean(per_sample)}

        if verbose_mode:
            def prep(m):
                if m is None:
                    return None
                m = m[:, 1:]
                return m * ex_mask if ex_mask is not None else m
            metrics.update(
                _metrics.compute_token_accuracy_metrics(
                    predictions=predictions,
                    labels=labels,
                    per_token_loss=-token_logp * loss_mask,
                    token_mask=loss_mask,
                    critical_mask=prep(obs.critical_token_mask),
                    number_mask=prep(obs.number_token_mask),
                    direction_mask=prep(obs.direction_token_mask),
                )
            )
        return per_sample, metrics

    def _compute_action_loss(self, suffix_out, u_t):
        v_t = self.action_out_proj(
            suffix_out[:, -self.config.action_horizon :].astype(jnp.float32)
        )
        per_sample = jnp.mean(jnp.square(v_t - u_t), axis=(-1, -2))
        return per_sample, {"action_loss": jnp.mean(per_sample)}

    def compute_loss(
        self,
        rng,
        observation: CoTObservation,
        actions,
        *,
        train: bool = False,
        verbose_mode: bool | None = None,
        return_augmented_images: bool = False,
    ):
        """Fused forward for both experts + weighted loss mix (lap.py:379-602)."""
        cfg = self.config
        preprocess_rng, _, noise_rng, time_rng = jax.random.split(rng, 4)
        verbose = cfg.verbose_mode if verbose_mode is None else verbose_mode
        batch_size = observation.tokenized_prompt.shape[0]

        vqa_mask = None
        if cfg.enable_vqa_training and observation.is_vqa_sample is not None:
            vqa_mask = jnp.asarray(observation.is_vqa_sample, dtype=bool)
        pred_mask = None
        if cfg.enable_prediction_training and observation.is_prediction_sample is not None:
            pred_mask = jnp.asarray(observation.is_prediction_sample, dtype=bool)

        observation = preprocess_observation(
            preprocess_rng,
            observation,
            train=train,
            image_keys=cfg.image_keys,
            image_resolution=cfg.image_resolution,
            aug_wrist_image=cfg.aug_wrist_image,
            enable_image_augmentation=cfg.enable_image_augmentation,
            vqa_mask=vqa_mask,
        )
        augmented_images = observation.images if return_augmented_images else None

        suffix = (
            self.prepare_suffix(observation, actions, noise_rng, time_rng)
            if cfg.enable_action_training
            else None
        )
        prefix_tokens, prefix_mask, prefix_ar_mask, forward_kwargs = (
            self._embed_prefix_for_loss(observation, suffix)
        )
        prefix_mask_action = (
            self._build_prefix_action_mask(prefix_mask, observation)
            if cfg.enable_action_training
            else prefix_mask
        )
        combined_mask = self._build_combined_attention_mask(
            prefix_mask,
            prefix_ar_mask,
            prefix_mask_action,
            suffix["suffix_mask"] if suffix else None,
            suffix["suffix_ar_mask"] if suffix else None,
        )
        positions = self._build_combined_positions(
            prefix_mask, prefix_mask_action, suffix["suffix_mask"] if suffix else None
        )

        pre_logits, _ = self.llm(
            [prefix_tokens, suffix["suffix_tokens"]] if suffix else [prefix_tokens],
            positions,
            combined_mask,
            adarms_cond=[None, suffix["adarms_cond"]] if suffix else [None],
            **forward_kwargs,
        )

        metrics = {}
        lang_per_sample = jnp.zeros(batch_size, dtype=jnp.float32)
        action_per_sample = jnp.zeros(batch_size, dtype=jnp.float32)
        action_sample_mask_f = jnp.ones(batch_size, dtype=jnp.float32)

        if cfg.enable_langact_training:
            sample_mask = observation.sample_mask
            lang_loss, lang_metrics = self._compute_language_loss(
                observation, pre_logits[0], sample_mask=sample_mask, verbose_mode=verbose
            )
            metrics.update(lang_metrics)

            if cfg.enable_vqa_training or cfg.enable_prediction_training:
                vqa_m = vqa_mask if vqa_mask is not None else jnp.zeros(batch_size, bool)
                pred_m = pred_mask if pred_mask is not None else jnp.zeros(batch_size, bool)
                lang_m = ~(vqa_m | pred_m)
                if sample_mask is not None:
                    vqa_m = vqa_m & sample_mask
                    pred_m = pred_m & sample_mask
                    lang_m = lang_m & sample_mask
                    active = jnp.maximum(jnp.sum(sample_mask), 1.0)
                else:
                    active = jnp.asarray(batch_size, jnp.float32)
                metrics["active_num_samples"] = (
                    jnp.sum(sample_mask) if sample_mask is not None else active
                )
                metrics["vqa_num_samples"] = jnp.sum(vqa_m)
                metrics["pred_num_samples"] = jnp.sum(pred_m)
                metrics["langact_num_samples"] = jnp.sum(lang_m)
                metrics["vqa_sample_portion"] = metrics["vqa_num_samples"] / active
                metrics["pred_sample_portion"] = metrics["pred_num_samples"] / active
                metrics["langact_sample_portion"] = metrics["langact_num_samples"] / active

                if cfg.enable_vqa_training:
                    metrics.update(
                        _metrics.compute_sample_specific_metrics(lang_loss, vqa_m, "vqa_")
                    )
                if cfg.enable_prediction_training:
                    metrics.update(
                        _metrics.compute_sample_specific_metrics(lang_loss, pred_m, "pred_")
                    )
                metrics.update(
                    _metrics.compute_sample_specific_metrics(lang_loss, lang_m, "langact_")
                )

                vqa_weights = jnp.full(batch_size, cfg.vqa_loss_weight, jnp.float32)
                if cfg.vqa_loss_weights and observation.vqa_dataset_id is not None:
                    from lap_tpu.data.registry import VQA_DATASET_ID_MAP

                    ids = jnp.asarray(observation.vqa_dataset_id, jnp.int32)
                    for name, weight in cfg.vqa_loss_weights.items():
                        if name in VQA_DATASET_ID_MAP:
                            vqa_weights = jnp.where(
                                ids == VQA_DATASET_ID_MAP[name], weight, vqa_weights
                            )
                lang_per_sample += (
                    vqa_weights * lang_loss * vqa_m
                    + cfg.prediction_loss_weight * lang_loss * pred_m
                    + cfg.language_loss_weight * lang_loss * lang_m
                )
            else:
                metrics.update(
                    _metrics.compute_sample_specific_metrics(
                        lang_loss,
                        sample_mask if sample_mask is not None else jnp.ones(batch_size, bool),
                        "langact_",
                    )
                )
                lang_per_sample += cfg.language_loss_weight * lang_loss

        if cfg.enable_action_training:
            action_loss, action_metrics = self._compute_action_loss(
                pre_logits[1], suffix["u_t"]
            )
            action_sample_mask = jnp.ones(batch_size, dtype=bool)
            if vqa_mask is not None:
                action_sample_mask &= ~vqa_mask
            if pred_mask is not None:
                action_sample_mask &= ~pred_mask
            action_sample_mask_f = action_sample_mask.astype(jnp.float32)
            action_per_sample += cfg.action_loss_weight * action_loss * action_sample_mask_f
            action_metrics["action_loss"] = jnp.sum(
                action_loss * action_sample_mask_f
            ) / jnp.maximum(jnp.sum(action_sample_mask_f), 1.0)
            metrics.update(action_metrics)

        total_per_sample = lang_per_sample + action_per_sample
        if verbose:
            metrics["per_sample_loss"] = total_per_sample

        if cfg.enable_action_training:
            action_term = jnp.sum(action_per_sample) / jnp.maximum(
                jnp.sum(action_sample_mask_f), 1.0
            )
            if cfg.enable_langact_training:
                if observation.sample_mask is not None:
                    lang_term = jnp.sum(lang_per_sample) / jnp.maximum(
                        jnp.sum(observation.sample_mask), 1.0
                    )
                else:
                    lang_term = jnp.mean(lang_per_sample)
            else:
                lang_term = 0.0
            final_loss = lang_term + action_term
        elif cfg.enable_langact_training and observation.sample_mask is not None:
            final_loss = jnp.sum(total_per_sample) / jnp.maximum(
                jnp.sum(observation.sample_mask), 1.0
            )
        else:
            final_loss = jnp.mean(total_per_sample)

        if augmented_images is not None:
            metrics["augmented_images"] = augmented_images
        return final_loss, metrics

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------

    def sample_actions(self, rng, observation: CoTObservation, *, num_steps: int = 10, noise=None):
        """Prefill, then Euler-integrate the flow from t=1 to 0 (lap.py:604)."""
        cfg = self.config
        observation = preprocess_observation(
            None,
            observation,
            train=False,
            image_keys=cfg.image_keys,
            image_resolution=cfg.image_resolution,
            aug_wrist_image=cfg.aug_wrist_image,
        )
        dt = np.float32(-1.0 / num_steps)
        batch_size = observation.state.shape[0]
        if noise is None:
            noise = jax.random.normal(
                rng, (batch_size, cfg.action_horizon, cfg.action_dim)
            )

        prefix_tokens, prefix_mask, prefix_ar_mask = self.embed_prefix(observation)
        prefix_attn_mask = make_attn_mask(prefix_mask, prefix_ar_mask)
        positions = jnp.cumsum(prefix_mask, axis=1) - 1
        _, kv_cache = self.llm(
            [prefix_tokens, None], positions, prefix_attn_mask, [None, None]
        )

        def step(carry):
            x_t, time = carry
            suffix_tokens, suffix_mask, suffix_ar, adarms_cond = self.embed_suffix(
                observation, x_t, jnp.broadcast_to(time, (batch_size,))
            )
            suffix_ar_b = jnp.broadcast_to(suffix_ar[None], suffix_mask.shape)
            suffix_attn = make_attn_mask(suffix_mask, suffix_ar_b)
            prefix_attn = jnp.broadcast_to(
                prefix_mask[:, None, :],
                (batch_size, suffix_tokens.shape[1], prefix_mask.shape[1]),
            )
            full_mask = jnp.concatenate([prefix_attn, suffix_attn], axis=-1)
            pos = (
                jnp.sum(prefix_mask, axis=-1)[:, None]
                + jnp.cumsum(suffix_mask, axis=-1)
                - 1
            )
            (out0, suffix_out), _ = self.llm(
                [None, suffix_tokens],
                pos,
                full_mask,
                [None, adarms_cond],
                kv_cache=kv_cache,
            )
            v_t = self.action_out_proj(
                suffix_out[:, -cfg.action_horizon :].astype(jnp.float32)
            )
            return x_t + dt * v_t, time + dt

        # ``num_steps`` is static, so the Euler chain is unrolled into
        # straight-line XLA instead of a while_loop: the scheduler can then
        # overlap weight prefetch across steps and the loop-carry launch
        # overhead disappears (measured ~0.2 ms/step on v5e). Time accumulates
        # in float32 to match the while_loop carry numerics bit-for-bit.
        x_t, time = noise, np.float32(1.0)
        for _ in range(num_steps):
            x_t, time = step((x_t, time))
        return x_t

    def sample_tokens(
        self,
        rng,
        observation: CoTObservation,
        *,
        max_decoding_steps: int = 390,
        temperature: float = 0.0,
        stop_on_eos: bool = True,
    ):
        """Right-aligned prefill + cached AR decode (lap.py:677-766).

        ``stop_on_eos=False`` forces the full token budget (benchmarking:
        deterministic work independent of what the weights emit)."""
        cfg = self.config
        observation = preprocess_observation(
            None,
            observation,
            train=False,
            image_keys=list(observation.images.keys()),
            image_resolution=cfg.image_resolution,
            aug_wrist_image=cfg.aug_wrist_image,
        )
        prefix_tokens, prefix_mask, prefix_ar_mask = self.embed_prefix(observation)
        prefix_attn_mask = make_attn_mask(prefix_mask, prefix_ar_mask)
        prefix_tokens, prefix_mask, prefix_attn_mask = left_to_right_align(
            prefix_tokens, prefix_mask, prefix_attn_mask
        )
        b = prefix_tokens.shape[0]
        prefill_size = prefix_tokens.shape[1]
        prefill_len = jnp.sum(prefix_mask, axis=-1)
        prefix_start = prefill_size - prefill_len

        n_exp = self._num_experts
        prefix_attn_mask = jnp.pad(
            prefix_attn_mask, ((0, 0), (0, 0), (0, max_decoding_steps))
        )
        prefix_positions = jnp.cumsum(prefix_mask, axis=-1) - 1
        embedded = [prefix_tokens] + [None] * (n_exp - 1)
        pre_logits, kv_cache = self.llm(
            embedded, prefix_positions, prefix_attn_mask, [None] * n_exp
        )

        last_logit = self.llm.decode_logits(pre_logits[0][:, -1:])
        output_tokens = jnp.zeros((b, max_decoding_steps), dtype=jnp.int32)

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
            # Rows that already emitted EOS write 0 (matching the unwritten
            # trailing slots of a row that finishes last): with batch > 1 the
            # loop runs until EVERY row finishes, and unmasked writes would
            # fill early-finishing rows with post-EOS continuation text.
            token = jnp.where(eos_mask[:, None], jnp.zeros_like(token), token)
            output_tokens = put_along_last_axis(
                output_tokens, jnp.broadcast_to(step_i, (b, 1)), token
            )
            eos_mask = eos_mask | (jnp.squeeze(token, axis=-1) == self.EOS_TOKEN)

            token_embedding = self.llm.embed(token)
            pos = prefill_len[:, None] + step_i
            total = prefill_size + max_decoding_steps
            col = jnp.arange(total)[None, None, :]
            mask = (col >= prefix_start[:, None, None]) & (
                col < (prefill_size + step_i + 1)
            )
            emb = [token_embedding] + [None] * (n_exp - 1)
            last_prelogit, cache = self.llm(
                emb, pos, mask, [None] * n_exp, kv_cache=cache
            )
            last_logit = self.llm.decode_logits(last_prelogit[0])
            return rng, last_logit, output_tokens, cache, eos_mask, step_i + 1

        def cond(carry):
            *_, eos_mask, step_i = carry
            not_done = ~jnp.all(eos_mask) if stop_on_eos else jnp.bool_(True)
            return not_done & (step_i < max_decoding_steps)

        _, _, output_tokens, _, _, _ = jax.lax.while_loop(
            cond,
            step,
            (rng, last_logit, output_tokens, kv_cache, jnp.zeros((b,), bool), 0),
        )
        return output_tokens

    # ------------------------------------------------------------------

    def init_params_fn(self, rng):
        """Touch every parameter path (loss covers the full model)."""
        obs = self.config.fake_obs(1)
        actions = self.config.fake_actions(1)
        self.compute_loss(rng, obs, actions, train=False)
        # sample_tokens uses decode on the embedder (already created by
        # compute_loss's language path when enabled; force it otherwise).
        # Width from the constructed backbone config: works for both the
        # gemma and gemma3 variants (LAPGemma3 inherits this method).
        if not self.config.enable_langact_training:
            self.llm.decode_logits(jnp.zeros((1, 1, self.llm.configs[0].width)))
        return ()


# Freeze-filter helpers (reference lap_config.py:132-189): predicates over
# flattened param path strings, consumed by the optimizer's masking.


def path_matches(path: str, pattern: str) -> bool:
    import re

    return re.search(pattern, path) is not None


def get_freeze_filter(config: LAPConfig):
    """Returns predicate(path)->bool for params to FREEZE, or None."""
    pali_lora = "lora" in config.paligemma_variant
    expert_lora = "lora" in config.action_expert_variant
    if not (pali_lora or expert_lora):
        return None

    def frozen(path: str) -> bool:
        if path_matches(path, r"lora"):
            return False
        if pali_lora and expert_lora:
            return path_matches(path, r"llm")
        if pali_lora:
            return path_matches(path, r"llm") and not path_matches(path, r"_1")
        return path_matches(path, r"llm") and path_matches(path, r"_1")

    return frozen


def get_vlm_freeze_filter(config: LAPConfig):
    """Freeze the VLM (llm minus the `_1` action expert) and image encoder."""

    def frozen(path: str) -> bool:
        if path_matches(path, r"img"):
            return True
        return path_matches(path, r"llm") and not path_matches(path, r"_1")

    return frozen
