"""Flagship-shape 3-D lowering: the LAP-3B train step must lower for the
(dp=2, fsdp=2, tp=2) mesh from abstract values only.

Round-2 gap: the multi-chip dryrun only ever lowered the dummy config; the
LAP-3B tp-sharded graph had never been traced against a mesh. This test
traces + lowers (no XLA compile, no parameter materialization) the full
train step at the real model shape, so sharding-rule regressions at
flagship scale surface on CPU in seconds-to-minutes instead of on a pod.
"""

import jax
import jax.numpy as jnp

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.parallel import data_sharding, fsdp_sharding, make_mesh, replicated
from lap_tpu.training.optimizer import AdamW, CosineDecaySchedule, create_optimizer
from lap_tpu.training.train_step import make_step_functions


def test_lap3b_train_step_lowers_on_2x2x2_mesh():
    cfg = LAPConfig(
        paligemma_variant="gemma_2b",
        action_expert_variant="gemma_300m",
        action_dim=32,
        action_horizon=10,
        max_token_len=180,
        enable_action_training=True,
        enable_langact_training=True,
    )
    model = cfg.create_module()
    tx = create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=10, peak_lr=1e-4, decay_steps=100),
    )
    steps = make_step_functions(model, tx, param_dtype=jnp.bfloat16)
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)

    state_shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    state_sharding = fsdp_sharding(state_shapes, mesh)

    # Every big parameter must actually be sharded at this scale, and the tp
    # axis must be in use (heads/mlp rules) — otherwise the lowering below
    # validates a layout nobody would run.
    flat = jax.tree_util.tree_flatten_with_path(state_sharding)[0]
    specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
    assert any("tp" in str(s) for s in specs.values()), "tp axis unused"
    assert any("fsdp" in str(s) for s in specs.values()), "fsdp axis unused"

    batch = 8
    obs, actions = jax.eval_shape(
        lambda: (cfg.fake_obs(batch), cfg.fake_actions(batch))
    )
    batch_spec = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=data_sharding(mesh)),
        (obs, actions),
    )
    state_spec = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes,
        state_sharding,
    )
    rng_spec = jax.ShapeDtypeStruct((), jnp.uint32)
    rng_spec = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    lowered = jax.jit(
        steps.train_step,
        in_shardings=(replicated(mesh), state_sharding, data_sharding(mesh)),
        out_shardings=(state_sharding, replicated(mesh)),
        donate_argnums=(1,),
    ).lower(rng_spec, state_spec, batch_spec)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # GSPMD annotations made it into the module


def test_lap_gemma3_4b_train_step_lowers_on_2x2x2_mesh():
    """The Gemma3-backbone flagship (lap_gemma3_4b shape) must also lower
    for the 3-D mesh: sliding-window attention, dual RoPE, QK-norm, and the
    image-placeholder scatter all trace through the tp/fsdp sharding rules."""
    cfg = LAPConfig(
        paligemma_variant="gemma3_4b",
        action_expert_variant="gemma3_300m",
        action_dim=32,
        action_horizon=16,
        max_token_len=800,
        enable_action_training=True,
        enable_langact_training=True,
    )
    model = cfg.create_module()
    tx = create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=10, peak_lr=1e-4, decay_steps=100),
    )
    steps = make_step_functions(model, tx, param_dtype=jnp.bfloat16)
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)

    state_shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    state_sharding = fsdp_sharding(state_shapes, mesh)
    flat = jax.tree_util.tree_flatten_with_path(state_sharding)[0]
    specs = [s.spec for _, s in flat]
    assert any("tp" in str(s) for s in specs), "tp axis unused"
    assert any("fsdp" in str(s) for s in specs), "fsdp axis unused"

    batch = 8
    obs_shape, act_shape = jax.eval_shape(
        lambda: (cfg.fake_obs(batch), cfg.fake_actions(batch))
    )
    batch_spec = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=data_sharding(mesh)),
        (obs_shape, act_shape),
    )
    state_spec = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes,
        state_sharding,
    )
    rng_spec = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    lowered = jax.jit(
        steps.train_step,
        in_shardings=(replicated(mesh), state_sharding, data_sharding(mesh)),
        out_shardings=(state_sharding, replicated(mesh)),
        donate_argnums=(1,),
    ).lower(rng_spec, state_spec, batch_spec)
    assert "sharding" in lowered.as_text()
