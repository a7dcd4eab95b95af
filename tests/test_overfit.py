"""Overfit a fixed batch: the full training math must actually learn.

Stronger than the 6-step loss-decrease check (test_train_step.py): a model
that merely shrinks its outputs also passes that. Here the language CE must
collapse toward zero on memorized reasoning tokens (the model CAN represent
the answer exactly), and the flow-matching MSE must drop by a large factor
while the model learns the (x_t, t) -> u_t map for one fixed action chunk.
This is the strongest offline proxy for BASELINE.md's loss-curve-parity
north star (the real curve needs real data + released weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.training.optimizer import AdamW, CosineDecaySchedule, create_optimizer
from lap_tpu.training.train_step import make_step_functions

TINY = LAPConfig(
    dtype="float32",
    paligemma_variant="dummy",
    action_expert_variant="dummy",
    siglip_variant="dummy",
    action_dim=7,
    action_horizon=4,
    max_token_len=16,
    image_resolution=(28, 28),
    enable_action_training=True,
    enable_langact_training=True,
)


def _make_tx():
    return create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=10, peak_lr=2e-3, decay_steps=10_000),
    )


def _fixed_batch(cfg, b=4):
    rng_np = np.random.default_rng(0)
    obs = cfg.fake_obs(b)
    obs = obs.replace(
        tokenized_prompt=jnp.asarray(rng_np.integers(3, 100, (b, cfg.max_token_len)), jnp.int32),
        tokenized_langact_mask=jnp.asarray(np.tile(np.arange(cfg.max_token_len) >= 8, (b, 1))),
        token_loss_mask=jnp.ones((b, cfg.max_token_len), bool),
    )
    actions = jnp.asarray(rng_np.normal(size=(b, cfg.action_horizon, cfg.action_dim)), jnp.float32)
    return (obs, actions)


def test_overfit_fixed_batch():
    cfg = TINY
    model = cfg.create_module()
    steps = make_step_functions(model, _make_tx())
    state = jax.jit(steps.init_fn)(jax.random.PRNGKey(0))
    batch = _fixed_batch(cfg)

    train = jax.jit(steps.train_step, donate_argnums=(1,))
    # Fixed rng: the flow-matching (noise, t) draw still varies per step via
    # fold_in(rng, state.step) inside the step — memorizing the answer must
    # survive fresh corruption draws, which is exactly what training does.
    rng = jax.random.PRNGKey(1)
    first = None
    metrics = {}
    for _ in range(300):
        state, metrics = train(rng, state, batch)
        if first is None:
            first = {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}

    lang0, lang1 = first["lang_loss"], float(metrics["lang_loss"])
    act0, act1 = first["action_loss"], float(metrics["action_loss"])
    # Language CE: from ~ln(257k) ~ 12.5 down to near-memorized.
    assert lang1 < 0.5, f"language CE did not collapse: {lang0} -> {lang1}"
    assert lang1 < 0.05 * lang0
    # Flow MSE: large-factor drop (the target varies with the (noise, t)
    # draw, so the floor is nonzero on finite steps).
    assert act1 < 0.35 * act0, f"action MSE did not drop enough: {act0} -> {act1}"
    # Token accuracy on the memorized reasoning must be essentially perfect.
    if "token_accuracy" in metrics:
        assert float(metrics["token_accuracy"]) > 0.95


def test_overfit_partitioned_freeze():
    """Partitioned freezing must still LEARN through the trainable subset
    while frozen tensors stay BITWISE identical (catches merge/partition
    bugs the loss curve alone would hide). Freeze the VLM+ViT; the action
    expert must still drive the flow MSE down on a fixed batch."""
    from lap_tpu.models.lap_model import get_vlm_freeze_filter
    from lap_tpu.training.optimizer import freeze_mask_for_model

    cfg = TINY
    model = cfg.create_module()
    mask = freeze_mask_for_model(model, get_vlm_freeze_filter(cfg))
    assert any(jax.tree.leaves(mask)) and not all(jax.tree.leaves(mask))

    steps = make_step_functions(model, _make_tx(), freeze_mask=mask)
    state = jax.jit(steps.init_fn)(jax.random.PRNGKey(0))
    frozen_before = jax.tree.map(
        lambda p, m: np.asarray(p) if m else None, state.params, mask
    )
    batch = _fixed_batch(cfg)

    train = jax.jit(steps.train_step, donate_argnums=(1,))
    rng = jax.random.PRNGKey(1)
    first, metrics = None, {}
    for _ in range(150):
        state, metrics = train(rng, state, batch)
        if first is None:
            first = {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}

    # The trainable action expert still learns the fixed chunk.
    assert float(metrics["action_loss"]) < 0.5 * first["action_loss"]
    # Every frozen tensor is bitwise untouched by 150 optimizer steps.
    jax.tree.map(
        lambda before, after, m: (
            np.testing.assert_array_equal(before, np.asarray(after)) if m else None
        ),
        frozen_before,
        state.params,
        mask,
        is_leaf=lambda x: x is None,
    )


def test_overfit_lora_partitioned_freeze():
    """LoRA fine-tuning through the partitioned-freeze path (reference
    lap_config.py:132-189 `paligemma_variant="*_lora"`): the frozen base
    llm weights stay BITWISE identical while gradient still flows through
    the low-rank residuals. With pali-LoRA only, the `_1` action expert
    is fully trainable, so the flow MSE must drop hard; the language CE
    has NO trainable full-rank tensor on its path (embedder + VLM base
    all frozen), so any decrease at all is proof the rank-4 adapters
    carry signal — asserting a large CE collapse would test adapter
    capacity, not the freeze partition."""
    import dataclasses

    from lap_tpu.models.lap_model import get_freeze_filter
    from lap_tpu.training.optimizer import freeze_mask_for_model

    cfg = dataclasses.replace(TINY, paligemma_variant="dummy_lora")
    model = cfg.create_module()
    predicate = get_freeze_filter(cfg)
    assert predicate is not None
    mask = freeze_mask_for_model(model, predicate)
    leaves = jax.tree.leaves(mask)
    assert any(leaves) and not all(leaves)

    # LoRA fine-tunes run hotter than full pre-train (lora_b starts at 0).
    tx = create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=10, peak_lr=1e-2, decay_steps=10_000),
    )
    steps = make_step_functions(model, tx, freeze_mask=mask)
    state = jax.jit(steps.init_fn)(jax.random.PRNGKey(0))
    frozen_before = jax.tree.map(
        lambda p, m: np.asarray(p) if m else None, state.params, mask
    )
    batch = _fixed_batch(cfg)

    train = jax.jit(steps.train_step, donate_argnums=(1,))
    rng = jax.random.PRNGKey(1)
    first, metrics = None, {}
    for _ in range(150):
        state, metrics = train(rng, state, batch)
        if first is None:
            first = {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}

    # The fully-trainable action expert still learns the fixed chunk.
    assert float(metrics["action_loss"]) < 0.5 * first["action_loss"], (
        first["action_loss"], float(metrics["action_loss"]))
    # Language CE decreases measurably through the LoRA residuals alone
    # (every full-rank tensor on the CE path is frozen; measured drop at
    # this shape is ~0.45 nats over 150 steps).
    assert float(metrics["lang_loss"]) < first["lang_loss"] - 0.25, (
        first["lang_loss"], float(metrics["lang_loss"]))
    # Base llm weights bitwise untouched.
    jax.tree.map(
        lambda before, after, m: (
            np.testing.assert_array_equal(before, np.asarray(after)) if m else None
        ),
        frozen_before,
        state.params,
        mask,
        is_leaf=lambda x: x is None,
    )
