"""Sequence parallelism: residual-stream activations token-sharded over tp.

Megatron-SP style layout (rebuild addition; the reference implements only
DP+FSDP, SURVEY.md §2.6): under ``set_mesh(..., sequence_parallel=True)``
rank-3 ``[B, T, D]`` activations at Block boundaries are constrained to
``[B@(dp,fsdp), T@tp, D]``, so GSPMD places reduce-scatter/all-gather pairs
around the per-token norm regions instead of tp all-reduces. Numerics must
be identical to the tp-only layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.parallel import (
    activation_sharding_constraint,
    data_sharding,
    fsdp_sharding,
    make_mesh,
    replicated,
    sequence_parallel_enabled,
    set_mesh,
)
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


def _fake_batch(batch: int):
    rng = np.random.default_rng(0)
    obs = TINY.fake_obs(batch)
    obs = obs.replace(
        tokenized_prompt=jnp.asarray(rng.integers(3, 100, (batch, 16)), jnp.int32),
        tokenized_langact_mask=jnp.asarray(np.tile(np.arange(16) >= 8, (batch, 1))),
        token_loss_mask=jnp.ones((batch, 16), bool),
    )
    actions = jnp.asarray(rng.normal(size=(batch, 4, 7)), jnp.float32)
    return obs, actions


def test_sp_constraint_places_token_dim_on_tp():
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    x = jnp.ones((8, 4, 6))  # T=4 divisible by tp=2
    with set_mesh(mesh, sequence_parallel=True):
        assert sequence_parallel_enabled()
        out = jax.jit(lambda v: activation_sharding_constraint(v))(x)
    assert out.sharding == NamedSharding(mesh, PartitionSpec(("dp", "fsdp"), "tp"))


def test_sp_constraint_skips_non_divisible_and_low_rank():
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    batch_only = NamedSharding(mesh, PartitionSpec(("dp", "fsdp")))
    with set_mesh(mesh, sequence_parallel=True):
        # T=5 does not divide tp=2: suffix-style leaf keeps batch-only spec.
        odd = jax.jit(lambda v: activation_sharding_constraint(v))(jnp.ones((8, 5, 6)))
        # Rank-2 (e.g. adaRMS cond embedding): never token-sharded.
        r2 = jax.jit(lambda v: activation_sharding_constraint(v))(jnp.ones((8, 6)))
    assert odd.sharding == batch_only
    assert r2.sharding == batch_only


def test_sp_disabled_without_tp_axis():
    mesh = make_mesh(fsdp_devices=4)  # tp=1
    with set_mesh(mesh, sequence_parallel=True):
        assert not sequence_parallel_enabled()
        out = jax.jit(lambda v: activation_sharding_constraint(v))(jnp.ones((8, 4, 6)))
    assert out.sharding == NamedSharding(mesh, PartitionSpec(("dp", "fsdp")))


def test_sp_train_step_matches_unsharded():
    """dp2 x fsdp2 x tp2 with sequence parallelism: same loss as 1-device."""
    model = TINY.create_module()
    tx = create_optimizer(
        AdamW(), CosineDecaySchedule(warmup_steps=2, peak_lr=1e-3, decay_steps=10)
    )
    steps = make_step_functions(model, tx)
    obs, actions = _fake_batch(8)

    state0 = steps.init_fn(jax.random.PRNGKey(0))
    _, base_metrics = jax.jit(steps.train_step)(
        jax.random.PRNGKey(1), state0, (obs, actions)
    )
    base_loss = float(base_metrics["loss"])

    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    sharding = fsdp_sharding(shapes, mesh, min_size_bytes=1024)
    with set_mesh(mesh, sequence_parallel=True):
        state = jax.jit(steps.init_fn, out_shardings=sharding)(jax.random.PRNGKey(0))
        batch = jax.device_put((obs, actions), data_sharding(mesh))
        train = jax.jit(
            steps.train_step,
            in_shardings=(replicated(mesh), sharding, data_sharding(mesh)),
            out_shardings=(sharding, replicated(mesh)),
        )
        _, metrics = train(jax.random.PRNGKey(1), state, batch)
    sp_loss = float(metrics["loss"])
    np.testing.assert_allclose(sp_loss, base_loss, rtol=2e-4)


def test_sp_lowering_annotates_token_sharding():
    """The lowered train step must carry a sharding annotation that splits
    the token dim over tp — proof the constraint survives into the HLO that
    the SPMD partitioner consumes."""
    model = TINY.create_module()
    tx = create_optimizer(
        AdamW(), CosineDecaySchedule(warmup_steps=2, peak_lr=1e-3, decay_steps=10)
    )
    steps = make_step_functions(model, tx)
    obs, actions = _fake_batch(8)
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    sharding = fsdp_sharding(shapes, mesh, min_size_bytes=1024)
    with set_mesh(mesh, sequence_parallel=True):
        state = jax.jit(steps.init_fn, out_shardings=sharding)(jax.random.PRNGKey(0))
        batch = jax.device_put((obs, actions), data_sharding(mesh))
        lowered = jax.jit(
            steps.train_step,
            in_shardings=(replicated(mesh), sharding, data_sharding(mesh)),
            out_shardings=(sharding, replicated(mesh)),
        ).lower(jax.random.PRNGKey(1), state, batch)
    text = lowered.as_text()
    # Shardy annotation for [B@(dp,fsdp), T@tp, D].
    assert (
        '[{"dp", "fsdp"}, {"tp"}, {}]' in text
    ), "no token-dim tp sharding annotation in lowered HLO"
