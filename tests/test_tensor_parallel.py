"""Tensor-parallel sharding over the tp mesh axis (rebuild addition; the
reference implements only DP+FSDP, SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.parallel import data_sharding, fsdp_sharding, make_mesh, replicated, set_mesh
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


def test_tp_rules_place_heads_and_mlp():
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    model = TINY.create_module()
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn)
    )
    sh = fsdp_sharding(params, mesh, min_size_bytes=1 << 62)  # isolate TP
    flat = {jax.tree_util.keystr(p): s for p, s in jax.tree_util.tree_flatten_with_path(sh)[0]}
    q_key = next(k for k in flat if "q_einsum" in k and k.endswith("['w']"))
    assert "tp" in str(flat[q_key].spec), flat[q_key].spec
    mlp_key = next(k for k in flat if "gating_einsum" in k and "llm" in k)
    assert "tp" in str(flat[mlp_key].spec)
    # The embedding table is deliberately NOT tp-sharded (encode-gather /
    # scatter-add backward would involuntarily rematerialize); FSDP covers it.
    emb_key = next(k for k in flat if "input_embedding" in k)
    assert "tp" not in str(flat[emb_key].spec)


def test_tp_train_step_runs_and_matches_replicated():
    """2x2x2 (dp, fsdp, tp) train step must execute and produce the same
    loss as the unsharded step."""
    model = TINY.create_module()
    tx = create_optimizer(AdamW(), CosineDecaySchedule(warmup_steps=2, peak_lr=1e-3, decay_steps=10))
    steps = make_step_functions(model, tx)

    rng = np.random.default_rng(0)
    obs = TINY.fake_obs(8)
    obs = obs.replace(
        tokenized_prompt=jnp.asarray(rng.integers(3, 100, (8, 16)), jnp.int32),
        tokenized_langact_mask=jnp.asarray(np.tile(np.arange(16) >= 8, (8, 1))),
        token_loss_mask=jnp.ones((8, 16), bool),
    )
    actions = jnp.asarray(rng.normal(size=(8, 4, 7)), jnp.float32)

    # Baseline on a single device.
    state0 = steps.init_fn(jax.random.PRNGKey(0))
    _, base_metrics = jax.jit(steps.train_step)(jax.random.PRNGKey(1), state0, (obs, actions))
    base_loss = float(base_metrics["loss"])

    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    sharding = fsdp_sharding(shapes, mesh, min_size_bytes=1024)
    with set_mesh(mesh):
        state = jax.jit(steps.init_fn, out_shardings=sharding)(jax.random.PRNGKey(0))
        batch = jax.device_put((obs, actions), data_sharding(mesh))
        train = jax.jit(
            steps.train_step,
            in_shardings=(replicated(mesh), sharding, data_sharding(mesh)),
            out_shardings=(sharding, replicated(mesh)),
        )
        _, metrics = train(jax.random.PRNGKey(1), state, batch)
    tp_loss = float(metrics["loss"])
    np.testing.assert_allclose(tp_loss, base_loss, rtol=2e-4)
