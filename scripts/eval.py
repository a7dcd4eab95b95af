"""Offline checkpoint evaluation.

Capability parity with lihzha/lap ``scripts/eval.py``: restore each
checkpoint (optionally its EMA params), run teacher-forced validation loss
and action-prediction loss (sample actions, L2 vs ground truth) over the
validation split, and log aggregate scalars.

Usage:
    python scripts/eval.py <config-name> --exp_name my_run [--field value...]
"""

from __future__ import annotations

# Allow `python scripts/...` straight from a checkout: put the repo root on
# sys.path without requiring an installed package.
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import logging

import jax
import jax.numpy as jnp
import numpy as np

from lap_tpu.parallel import (
    data_sharding,
    fsdp_sharding,
    make_mesh,
    pick_fsdp_devices,
    replicated,
    set_mesh,
)
from lap_tpu.training import checkpoints as _checkpoints
from lap_tpu.training import config as _config
from lap_tpu.training.metrics_logging import MetricsLogger, reduce_metrics

logger = logging.getLogger("lap_tpu.eval")


def make_evaluators(model, mesh, params_sharding):
    shardings = dict(
        in_shardings=(params_sharding, replicated(mesh), data_sharding(mesh)),
        out_shardings=replicated(mesh),
    )

    def val_loss(params, rng, batch):
        obs, actions = batch
        loss, metrics = model.apply(
            {"params": params}, rng, obs, actions, train=False, method=model.compute_loss
        )
        return {"val_loss": loss, **metrics}

    def action_prediction_loss(params, rng, batch):
        obs, actions = batch
        sampled = model.apply(
            {"params": params}, rng, obs, num_steps=10, method=model.sample_actions
        )
        l2 = jnp.sqrt(jnp.sum((sampled - actions) ** 2, axis=-1)).mean()
        return {"action_prediction_l2": l2}

    return jax.jit(val_loss, **shardings), jax.jit(action_prediction_loss, **shardings)


def _params_sharding(config, model, mesh):
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
        )
    )["params"]
    return fsdp_sharding(shapes, mesh)


def restore_eval_params(config, ckpt_mgr, step: int, mesh, params_sharding):
    """Pick EMA or raw params per ``eval_use_ema`` (reference eval.py:353-361)
    and restore them sharded over the mesh (no full host-memory staging)."""
    from lap_tpu.training.checkpoints import restore_params_sharded

    if config.eval_use_ema or not config.has_ema:
        # The ``params`` item holds the EMA weights when EMA is enabled,
        # the raw weights otherwise (CheckpointManager.save).
        params_dir = ckpt_mgr.directory / str(step) / "params"
        return restore_params_sharded(params_dir, params_sharding)
    # eval_use_ema=False with EMA enabled: the raw weights live in the
    # train_state item; partial restore skips the optimizer state. The
    # {'params': ...} wrapper is unwrapped by restore_params_sharded.
    params_dir = ckpt_mgr.directory / str(step) / "train_state"
    return restore_params_sharded(params_dir, {"params": params_sharding}, partial=True)


def evaluate_checkpoint(
    config, model, ckpt_mgr, step: int, loader, *, num_batches, mesh, params_sharding
):
    params = restore_eval_params(config, ckpt_mgr, step, mesh, params_sharding)
    val_fn, pred_fn = make_evaluators(model, mesh, params_sharding)
    rng = jax.random.PRNGKey(config.seed)

    all_metrics: list[dict] = []
    it = iter(loader)
    for i in range(num_batches or 10**9):
        try:
            batch = next(it)
        except StopIteration:
            break
        rng, step_rng = jax.random.split(rng)
        m = dict(val_fn(params, step_rng, batch))
        if config.model.enable_action_training:
            m.update(pred_fn(params, step_rng, batch))
        all_metrics.append(reduce_metrics(jax.device_get(m)))
    if not all_metrics:
        return {}
    keys = all_metrics[0].keys()
    return {k: float(np.mean([m[k] for m in all_metrics if k in m])) for k in keys}


def main(config: _config.TrainConfig) -> None:
    logging.basicConfig(level=logging.INFO, force=True)
    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "LAP_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/lap_tpu/xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    # Pod-GCS hardening (reference eval.py:90-92): see scripts/train.py.
    from lap_tpu.utils.download import cache_home, maybe_prevent_cross_region

    maybe_prevent_cross_region(
        config.data.rlds_data_dir, str(config.checkpoint_base_dir), cache_home()
    )
    mesh = make_mesh(
        fsdp_devices=pick_fsdp_devices(config.fsdp_devices),
        tp_devices=config.tp_devices,
    )
    ckpt_mgr = _checkpoints.CheckpointManager(
        config.checkpoint_dir, keep_period=config.keep_period
    )
    steps = ckpt_mgr.all_steps()
    if config.eval_checkpoint_step is not None:
        steps = [config.eval_checkpoint_step]
    elif config.eval_checkpoint_steps:
        steps = list(config.eval_checkpoint_steps)
    elif not config.eval_all_checkpoints and steps:
        steps = [steps[-1]]
    if config.eval_start_from_step is not None:
        steps = [s for s in steps if s >= config.eval_start_from_step]
    if not steps:
        raise FileNotFoundError(f"no checkpoints found under {config.checkpoint_dir}")

    model = config.model.create_module()
    params_sharding = _params_sharding(config, model, mesh)
    from lap_tpu.data.loader import create_data_loader

    # Dataset configurations to evaluate, loaders built once upfront
    # (reference eval.py:285-360): the run's own mixture plus, when a
    # mixture is configured, the held-out demo mixture at val_fraction=1.
    import dataclasses as _dc

    dataset_configs = [("original", config)]
    if config.data.data_mix is not None:
        dataset_configs.append(
            (
                "eval_demo_dataset",
                _dc.replace(
                    config,
                    data=_dc.replace(
                        config.data, data_mix="eval_demo_dataset", val_fraction=1.0
                    ),
                ),
            )
        )
    loaders = {}
    for ds_name, ds_cfg in dataset_configs:
        try:
            loaders[ds_name] = create_data_loader(ds_cfg, mesh, split=ds_cfg.eval_split)
        except Exception as e:  # noqa: BLE001 - optional mixtures may be absent
            # The run's own mixture must evaluate; only the optional held-out
            # demo mixture may legitimately be missing — and even then say so
            # loudly (reference eval.py:285-360 evaluates both).
            if ds_name == "original":
                raise
            logger.warning(
                "SKIPPING eval dataset config %r (data_mix=%r): %s — "
                "register the mixture in lap_tpu/data/mixtures.py or point "
                "rlds_data_dir at it to evaluate the held-out demo split.",
                ds_name,
                ds_cfg.data.data_mix,
                e,
            )
    if not loaders:
        raise RuntimeError("no eval dataset configuration could be constructed")

    metrics_logger = MetricsLogger(
        log_dir=config.checkpoint_dir, wandb_enabled=config.wandb_enabled,
        project=config.project_name, exp_name=f"{config.exp_name}-eval",
    )
    with set_mesh(mesh, sequence_parallel=config.sequence_parallel):
        for step in steps:
            for ds_name, loader in loaders.items():
                scalars = evaluate_checkpoint(
                    config, model, ckpt_mgr, step, loader,
                    num_batches=config.num_eval_batches,
                    mesh=mesh, params_sharding=params_sharding,
                )
                scalars = {f"{ds_name}/{k}": v for k, v in scalars.items()}
                logger.info("checkpoint %d [%s]: %s", step, ds_name, scalars)
                metrics_logger.log(step, scalars, prefix="eval")
    metrics_logger.close()


if __name__ == "__main__":
    main(_config.cli())
