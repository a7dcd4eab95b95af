"""Shared flagship-shape lowering harness (not a test module).

Used by tests/test_flagship_lowering.py (LAP-3B and Gemma3-4B on the
in-process 2x2x2 mesh) and tests/multiprocess_worker.py (LAP-3B on a mesh
spanning a real 2-process gloo cluster, with the batch supplied as
multi-host global arrays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lap_tpu.parallel import data_sharding, fsdp_sharding, replicated
from lap_tpu.training.optimizer import AdamW, CosineDecaySchedule, create_optimizer
from lap_tpu.training.train_step import make_step_functions


def lower_train_step_on_mesh(
    cfg, mesh, *, batch: int = 8, batch_arrays=None, freeze_predicate=None, ema=False
):
    """Trace + lower (no execution, no weights) the full train step for
    ``cfg`` against ``mesh``; assert the tp/fsdp axes are actually used and
    GSPMD annotations reach the module. Returns the lowered computation.

    ``batch_arrays``: optional concrete (obs, actions) global arrays (the
    multi-process path) — defaults to abstract ShapeDtypeStructs.
    ``freeze_predicate``: optional path->bool freeze predicate (e.g.
    get_vlm_freeze_filter(cfg)); exercises the PARTITIONED freeze path
    (trainable-subset opt_state) under the mesh shardings.
    """
    model = cfg.create_module()
    tx = create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=10, peak_lr=1e-4, decay_steps=100),
    )
    freeze_mask = None
    if freeze_predicate is not None:
        from lap_tpu.training.optimizer import freeze_mask_for_model

        freeze_mask = freeze_mask_for_model(model, freeze_predicate)
        leaves = jax.tree.leaves(freeze_mask)
        assert any(leaves), "freeze mask froze nothing"
        assert not all(leaves), "freeze mask froze EVERYTHING (no-op train step)"
    ema_schedule = None
    if ema:
        from lap_tpu.training.optimizer import EmaSchedule, EmaStage

        ema_schedule = EmaSchedule(stages=(EmaStage(0, None, 0.999),))
    steps = make_step_functions(
        model,
        tx,
        param_dtype=jnp.bfloat16,
        freeze_mask=freeze_mask,
        ema_schedule=ema_schedule,
    )

    state_shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    state_sharding = fsdp_sharding(state_shapes, mesh)
    # Every big parameter must actually be sharded at this scale, and the tp
    # axis must be in use (heads/mlp rules) — otherwise the lowering below
    # validates a layout nobody would run.
    specs = [
        s.spec for _, s in jax.tree_util.tree_flatten_with_path(state_sharding)[0]
    ]
    assert any("tp" in str(s) for s in specs), "tp axis unused at flagship shape"
    assert any("fsdp" in str(s) for s in specs), "fsdp axis unused at flagship shape"

    if batch_arrays is None:
        batch_arrays = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=data_sharding(mesh)
            ),
            jax.eval_shape(lambda: (cfg.fake_obs(batch), cfg.fake_actions(batch))),
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
    ).lower(rng_spec, state_spec, batch_arrays)
    assert "sharding" in lowered.as_text()  # GSPMD annotations present
    return lowered
