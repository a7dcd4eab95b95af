"""Pipeline parallelism integrated into the trainer (VERDICT round-4 ask #1).

The FULL LAP model — SigLIP ViT prefix, both Gemma experts, language +
flow-matching losses — trains through ``pipeline_apply``: under a
``set_mesh(..., pipeline_microbatches=M)`` scope on a pp mesh,
``gemma.Module.__call__`` routes its scanned block stack through the GPipe
executor, and the resulting losses/updates must match the serial (no-mesh)
train step. Also covers pp x fsdp-within-stage (round-4 ask #5) and the
stage-memory checker.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.parallel import (
    check_pp_memory,
    data_sharding,
    fsdp_sharding,
    make_mesh,
    replicated,
    set_mesh,
)
from lap_tpu.training.optimizer import AdamW, CosineDecaySchedule, create_optimizer
from lap_tpu.training.train_step import make_step_functions


def _tiny_config():
    return LAPConfig(
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


def _batch(cfg, batch_size):
    obs = cfg.fake_obs(batch_size)
    obs = obs.replace(
        tokenized_prompt=jnp.tile(
            jnp.arange(cfg.max_token_len, dtype=jnp.int32)[None], (batch_size, 1)
        ),
        tokenized_langact_mask=jnp.tile(
            (jnp.arange(cfg.max_token_len) >= 8)[None], (batch_size, 1)
        ),
        token_loss_mask=jnp.ones((batch_size, cfg.max_token_len), bool),
    )
    return obs, cfg.fake_actions(batch_size)


def _steps(cfg):
    model = cfg.create_module()
    tx = create_optimizer(
        AdamW(clip_gradient_norm=1.0),
        CosineDecaySchedule(warmup_steps=10, peak_lr=1e-3, decay_steps=100),
    )
    return make_step_functions(model, tx)


def _serial_losses(cfg, batch, n_steps=2):
    steps = _steps(cfg)
    state = jax.jit(steps.init_fn)(jax.random.PRNGKey(0))
    train = jax.jit(steps.train_step)
    losses = []
    for i in range(n_steps):
        state, metrics = train(jax.random.PRNGKey(1 + i), state, batch)
        losses.append(float(metrics["loss"]))
    return losses


def _pp_losses(cfg, batch, mesh, microbatches, n_steps=2):
    steps = _steps(cfg)
    shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(0))
    state_sharding = fsdp_sharding(shapes, mesh, min_size_bytes=1024)
    losses = []
    with set_mesh(mesh, pipeline_microbatches=microbatches):
        state = jax.jit(steps.init_fn, out_shardings=state_sharding)(
            jax.random.PRNGKey(0)
        )
        batch = jax.device_put(batch, data_sharding(mesh))
        train = jax.jit(
            steps.train_step,
            in_shardings=(replicated(mesh), state_sharding, data_sharding(mesh)),
            out_shardings=(state_sharding, replicated(mesh)),
            donate_argnums=(1,),
        )
        for i in range(n_steps):
            state, metrics = train(jax.random.PRNGKey(1 + i), state, batch)
            losses.append(float(metrics["loss"]))
    return losses, state


def test_full_lap_train_step_pp_matches_serial():
    """(dp=2, pp=4): two optimizer steps of the full LAP train step through
    the pipeline match the serial step — forward AND gradients are exact
    through the GPipe schedule (step 2's loss depends on step 1's update)."""
    cfg = _tiny_config()
    batch = _batch(cfg, 8)
    mesh = make_mesh(pp_devices=4, devices=jax.devices("cpu")[:8])
    assert dict(mesh.shape) == {"dp": 2, "pp": 4, "fsdp": 1, "tp": 1}
    want = _serial_losses(cfg, batch)
    got, state = _pp_losses(cfg, batch, mesh, microbatches=2)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # The stacked layer params really live pp-sharded.
    spec = str(state.params["llm"]["layers"]["attn"]["q_einsum"]["w"].sharding.spec)
    assert "pp" in spec, spec


def test_full_lap_train_step_pp_fsdp_within_stage():
    """(dp=2, pp=2, fsdp=2): within-stage ZeRO-3 — each stage's layer slices
    are additionally fsdp-sharded and gathered per layer inside the stage;
    losses still match serial."""
    cfg = _tiny_config()
    batch = _batch(cfg, 8)
    mesh = make_mesh(fsdp_devices=2, pp_devices=2, devices=jax.devices("cpu")[:8])
    assert dict(mesh.shape) == {"dp": 2, "pp": 2, "fsdp": 2, "tp": 1}
    want = _serial_losses(cfg, batch)
    got, state = _pp_losses(cfg, batch, mesh, microbatches=2)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # Stacked leaves carry BOTH the pp layer axis and a within-stage fsdp dim.
    spec = str(state.params["llm"]["layers"]["mlp"]["gating_einsum"].sharding.spec)
    assert "pp" in spec and "fsdp" in spec, spec


def test_make_mesh_rejects_pp_with_tp():
    with pytest.raises(ValueError, match="does not compose"):
        make_mesh(tp_devices=2, pp_devices=2, devices=jax.devices("cpu")[:8])


def test_check_pp_memory_arithmetic():
    """The honest capacity bound (round-4 ask #5): a stage that cannot fit
    raises with the arithmetic instead of letting XLA OOM opaquely."""
    stacked = {"w": jax.ShapeDtypeStruct((16, 4096, 4096), jnp.float32)}
    other = {"emb": jax.ShapeDtypeStruct((1024, 4096), jnp.float32)}
    # 16*4096*4096*4 B = 1 GiB of layers; pp=2, fsdp=1 -> 0.5 GiB + one
    # layer 64 MiB + other 16 MiB, x4 state = ~2.3 GiB.
    fp = check_pp_memory(
        stacked, other, pp=2, fsdp=1, hbm_bytes=4 * 2**30
    )
    assert fp["per_device_bytes"] < 4 * 2**30
    with pytest.raises(ValueError, match="does not fit device HBM"):
        check_pp_memory(stacked, other, pp=2, fsdp=1, hbm_bytes=2**30)
    # fsdp within the stage shrinks the resident slice below the same bound.
    fp = check_pp_memory(stacked, other, pp=2, fsdp=4, hbm_bytes=2**30)
    assert fp["per_device_bytes"] < 2**30


def test_pipeline_requires_deterministic_dropout():
    """Dropout rngs cannot thread through the stage shard_map: the pipelined
    path must refuse non-deterministic forwards instead of silently skipping
    dropout."""
    from lap_tpu.models import gemma
    from lap_tpu.parallel import set_pipeline

    cfg = gemma.get_config("dummy")
    module = gemma.Module(configs=(cfg,), dropout=0.1, embed_dtype="float32")
    x = jnp.zeros((4, 4, cfg.width))
    positions = jnp.zeros((4, 4), jnp.int32)
    mask = jnp.ones((4, 4, 4), bool)
    params = module.init(
        jax.random.PRNGKey(0), [x], positions, mask, deterministic=True
    )
    mesh = make_mesh(pp_devices=4, devices=jax.devices("cpu")[:4])
    with set_pipeline(mesh, 2), pytest.raises(ValueError, match="deterministic"):
        module.apply(
            params,
            [x],
            positions,
            mask,
            deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )


def test_full_lapgemma3_train_step_pp_matches_serial():
    """The Gemma3 backbone (sliding windows, per-layer global/local flags as
    SCANNED inputs, image-placeholder scatter) through the pipeline: losses
    match the serial step. The 12b/27b family is pp's actual use case, so
    the gemma3 routing must be proven, not assumed."""
    from lap_tpu.models.tokenizer import GEMMA3_IMAGE_TOKEN

    cfg = LAPConfig(
        dtype="float32",
        paligemma_variant="gemma3_dummy",
        action_expert_variant="gemma3_dummy",
        siglip_variant="dummy",
        action_dim=7,
        action_horizon=4,
        max_token_len=48,
        image_resolution=(28, 28),
        enable_action_training=True,
        enable_langact_training=True,
    )
    b = 8
    obs = cfg.fake_obs(b)
    tok = np.full((b, cfg.max_token_len), 5, np.int32)
    tok[:, 0] = 2
    # 28x28 at patch 14 -> 4 ViT tokens per camera, two cameras.
    tok[:, 4:8] = GEMMA3_IMAGE_TOKEN
    tok[:, 10:14] = GEMMA3_IMAGE_TOKEN
    langact = np.zeros((b, cfg.max_token_len), bool)
    langact[:, 24:] = True
    obs = obs.replace(
        tokenized_prompt=jnp.asarray(tok),
        tokenized_langact_mask=jnp.asarray(langact),
        token_loss_mask=jnp.asarray(langact),
    )
    batch = (obs, cfg.fake_actions(b))

    # gemma3_dummy has 6 layers: pp=2 -> 3 layers/stage.
    mesh = make_mesh(fsdp_devices=2, pp_devices=2, devices=jax.devices("cpu")[:8])
    want = _serial_losses(cfg, batch)
    got, state = _pp_losses(cfg, batch, mesh, microbatches=2)
    np.testing.assert_allclose(got, want, rtol=1e-4)
    spec = str(
        jax.tree.leaves(state.params["llm"]["layers"])[0].sharding.spec
    )
    assert "pp" in spec, spec
