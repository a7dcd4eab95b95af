"""Training entry point.

Capability parity with lihzha/lap ``scripts/train.py``: TPU/distributed
init, mesh construction, checkpoint dir init with resume, train-state init
with partial-weight merge under jit with FSDP out-shardings, the jitted
train step with donated state, periodic checkpointing / logging / validation.

Usage:
    python scripts/train.py <config-name> --exp_name my_run [--field value...]
    python scripts/train.py debug          # tiny model + synthetic data
"""

from __future__ import annotations

# Allow `python scripts/...` straight from a checkout: put the repo root on
# sys.path without requiring an installed package.
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import dataclasses
import logging
import sys

import jax
import jax.numpy as jnp

from lap_tpu.parallel import (
    check_pp_memory,
    data_sharding,
    fsdp_sharding,
    make_mesh,
    pick_fsdp_devices,
    replicated,
    set_mesh,
    set_pipeline,
)
from lap_tpu.training import checkpoints as _checkpoints
from lap_tpu.training import config as _config
from lap_tpu.training import weight_loaders as _weight_loaders
from lap_tpu.training.metrics_logging import MetricsLogger
from lap_tpu.training.optimizer import create_optimizer
from lap_tpu.training.train_step import make_step_functions

logger = logging.getLogger("lap_tpu")


def _mesh_scope(config, mesh):
    """Ambient-parallelism scope for traces: mesh + sp + (with pp_devices > 1)
    the GPipe pipeline context that routes gemma layer stacks through
    ``parallel.pipeline.pipeline_apply``."""
    return set_mesh(
        mesh,
        sequence_parallel=config.sequence_parallel,
        pipeline_microbatches=(
            config.pp_microbatches if getattr(config, "pp_devices", 1) > 1 else None
        ),
    )


def init_distributed(config) -> None:
    """Initialize multi-host JAX when running on a pod (train.py:110-154)."""
    if config.fsdp_devices > jax.local_device_count() and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # noqa: BLE001 - single-host runs land here
            logger.info("jax.distributed.initialize skipped: %s", e)


def _check_pp_fit(config, params_shapes, mesh) -> None:
    """Fail fast with arithmetic when a pipeline stage cannot fit device HBM
    (instead of an opaque XLA OOM hours into weight loading)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm = int(stats.get("bytes_limit", 0))
    except Exception:  # noqa: BLE001 - CPU/virtual backends have no stats
        hbm = 0
    if hbm <= 0:
        return
    llm = params_shapes.get("llm", {})
    stacked = llm.get("layers")
    if stacked is None:
        return
    other = {k: v for k, v in params_shapes.items() if k != "llm"}
    other["llm"] = {k: v for k, v in llm.items() if k != "layers"}
    check_pp_memory(
        stacked,
        other,
        pp=mesh.shape["pp"],
        fsdp=mesh.shape["fsdp"],
        hbm_bytes=hbm,
        # params + grads + Adam mu/nu at param dtype.
        state_multiplier=4.0,
    )


def init_train_state(config, steps, mesh, resuming: bool):
    """eval_shape -> FSDP shardings -> (load partial weights) -> jit init."""
    shapes = jax.eval_shape(steps.init_fn, jax.random.PRNGKey(config.seed))
    if getattr(config, "pp_devices", 1) > 1:
        _check_pp_fit(config, shapes.params, mesh)
    state_sharding = fsdp_sharding(shapes, mesh, log=False)
    if resuming:
        # Structure only; values restored from the checkpoint.
        abstract = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            shapes,
            state_sharding,
        )
        return abstract, state_sharding

    loader = config.weight_loader.build()
    init = jax.jit(steps.init_fn, out_shardings=state_sharding)
    with _mesh_scope(config, mesh):
        state = init(jax.random.PRNGKey(config.seed))
    if loader is not None:
        params_shape = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.params
        )
        loaded = loader.load(params_shape)
        # Put loaded leaves onto their FSDP shardings, keep fresh init where
        # the loader returned the ShapeDtypeStruct placeholder.
        params_sharding = fsdp_sharding(params_shape, mesh)

        def place(new, cur, sh):
            if isinstance(new, jax.ShapeDtypeStruct):
                return cur
            return jax.device_put(jnp.asarray(new, dtype=cur.dtype), sh)

        params = jax.tree.map(place, loaded, state.params, params_sharding)
        state = dataclasses.replace(state, params=params)
        if state.ema_params is not None:
            # Re-seed EMA from the merged weights, preserving the partial
            # structure (None leaves = frozen params, partitioned EMA).
            state = dataclasses.replace(
                state,
                ema_params=jax.tree.map(
                    lambda e, p: None if e is None else p,
                    state.ema_params,
                    params,
                    is_leaf=lambda x: x is None,
                ),
            )
        logger.info("merged pretrained weights from %s", config.weight_loader)
    return state, state_sharding


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (reference train.py:153): repeat
    runs of the same graphs skip the multi-minute compile."""
    import os

    cache_dir = os.environ.get(
        "LAP_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/lap_tpu/xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        logger.info("compilation cache disabled: %s", e)


def main(config: _config.TrainConfig) -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
        force=True,
    )
    _enable_compilation_cache()
    init_distributed(config)
    # Pod-GCS hardening (reference train.py:126-128): data streaming and
    # checkpoint writes must not straddle GCS regions — at pod scale that
    # pays egress on every batch and every save. No-op for local paths.
    from lap_tpu.utils.download import cache_home, maybe_prevent_cross_region

    maybe_prevent_cross_region(
        config.data.rlds_data_dir, str(config.checkpoint_base_dir), cache_home()
    )
    fsdp = pick_fsdp_devices(config.fsdp_devices)
    mesh = make_mesh(
        fsdp_devices=fsdp,
        tp_devices=config.tp_devices,
        pp_devices=config.pp_devices,
    )
    logger.info("mesh: %s over %d devices", dict(mesh.shape), jax.device_count())

    ckpt_mgr, resuming = _checkpoints.initialize_checkpoint_dir(
        config.checkpoint_dir,
        keep_period=config.keep_period,
        overwrite=config.overwrite,
        resume=config.resume,
    )

    model = config.model.create_module()
    freeze_mask = None
    from lap_tpu.models.lap_model import get_freeze_filter, get_vlm_freeze_filter
    from lap_tpu.training.optimizer import freeze_mask_for_model

    predicate = get_vlm_freeze_filter(config.model) if config.freeze_vlm else get_freeze_filter(config.model)
    if predicate is not None:
        freeze_mask = freeze_mask_for_model(config.model.create_module(), predicate)
        n_frozen = sum(jax.tree.leaves(freeze_mask))
        logger.info("freezing %d parameter tensors", n_frozen)
    # Plain tx: freezing is PARTITIONED inside the step functions (frozen
    # params are non-differentiated arguments, so their gradient buffers
    # never exist) rather than masked-to-zero in the optimizer.
    tx = create_optimizer(config.optimizer, config.lr_schedule)

    ema_schedule = None
    if config.has_ema:
        from lap_tpu.training.optimizer import EmaSchedule, EmaStage

        # Wrap the TrainConfig's dynamic schedule into the step-fn interface.
        class _Sched:
            has_ema = lambda self: True  # noqa: E731
            get_decay_for_step = lambda self, step: config.get_ema_decay_for_step(step)  # noqa: E731

        ema_schedule = _Sched()

    steps = make_step_functions(
        model,
        tx,
        ema_schedule=ema_schedule,
        param_dtype=jnp.dtype(config.param_dtype),
        freeze_mask=freeze_mask,
    )

    state, state_sharding = init_train_state(config, steps, mesh, resuming)
    if resuming:
        state = ckpt_mgr.restore(None, state)
        logger.info("resumed from step %d", int(state.step))

    loader = create_loader(config, mesh)
    if resuming:
        saved = ckpt_mgr.load_assets(
            int(state.step), f"dataloader_process_{jax.process_index()}/dataloader_state.json"
        ) or ckpt_mgr.load_assets(int(state.step), "dataloader_process_0/dataloader_state.json")
        if saved and hasattr(loader, "load_state_dict"):
            loader.load_state_dict(saved)
            logger.info("restored dataloader state: %s", saved)
    data_iter = iter(loader)

    train_step = jax.jit(
        steps.train_step,
        in_shardings=(replicated(mesh), state_sharding, data_sharding(mesh)),
        out_shardings=(state_sharding, replicated(mesh)),
        donate_argnums=(1,),
    )

    metrics_logger = MetricsLogger(
        log_dir=config.checkpoint_dir,
        wandb_enabled=config.wandb_enabled,
        project=config.project_name,
        exp_name=config.exp_name,
        config=dataclasses.asdict(config),
        resume=resuming,
        # Rewind the wandb run to the restored step so a resume from an
        # older checkpoint does not leave a gap of un-overwritable steps
        # (reference train.py:88-97).
        rewind_to_step=int(state.step) if resuming else None,
    )

    val_iter = None
    val_step = None
    if config.use_validation:
        from lap_tpu.data.loader import create_data_loader

        val_loader = create_data_loader(config, mesh, split="val")
        val_iter = iter(val_loader)
        val_step = jax.jit(
            steps.val_step,
            in_shardings=(replicated(mesh), state_sharding, data_sharding(mesh)),
            out_shardings=replicated(mesh),
        )

    import os

    trace_dir = os.environ.get("LAP_TPU_TRACE_DIR")

    # Graceful preemption: on SIGTERM (the TPU-VM eviction signal) finish the
    # in-flight step, save a checkpoint, and exit 0 so the resumed run loses
    # no work. TPU maintenance events signal every host of a slice, so the
    # per-host flag reaches the (barriered) save on all hosts together.
    import signal
    import threading

    preempted = threading.Event()

    def _on_sigterm(signum, frame):  # noqa: ARG001
        logger.warning("SIGTERM received: checkpointing and exiting after this step")
        preempted.set()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:  # not the main thread (e.g. under a test harness)
        pass

    rng = jax.random.PRNGKey(config.seed)
    start_step = int(state.step)
    first_batch_visualized = False
    with _mesh_scope(config, mesh):
        for step in range(start_step, config.num_train_steps):
            if trace_dir and step == start_step + 3:
                jax.profiler.start_trace(trace_dir)
            batch = next(data_iter)
            if not first_batch_visualized and jax.process_index() == 0:
                first_batch_visualized = True
                try:
                    from lap_tpu.training.batch_visualization import vis_batch

                    vis_batch(batch[0], out_dir=config.checkpoint_dir / "viz", step=step)
                except Exception as e:  # noqa: BLE001 - viz is best-effort
                    logger.info("batch visualization skipped: %s", e)
            state, metrics = train_step(rng, state, batch)
            if step == start_step:
                from lap_tpu.training.metrics_logging import log_device_mem

                jax.block_until_ready(metrics["loss"])
                log_device_mem("post-first-step")
            if trace_dir and step == start_step + 5:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                logger.info("wrote profiler trace to %s", trace_dir)
            if (step + 1) % config.log_interval == 0 or step == start_step:
                metrics_logger.log(step + 1, jax.device_get(metrics))
            if val_iter is not None and (step + 1) % config.val_interval == 0:
                try:
                    val_batch = next(val_iter)
                    val_metrics = val_step(rng, state, val_batch)
                    metrics_logger.log(step + 1, jax.device_get(val_metrics), prefix="val")
                except StopIteration:
                    val_iter = iter(val_loader)
            if (
                (step + 1) % config.save_interval == 0
                or step + 1 == config.num_train_steps
                or preempted.is_set()
            ):
                assets = _collect_assets(config, loader)
                ckpt_mgr.save(step + 1, state, assets=assets)
                logger.info("saved checkpoint at step %d", step + 1)
            if preempted.is_set():
                ckpt_mgr.wait_until_finished()
                metrics_logger.close()
                logger.warning("exiting after preemption checkpoint at step %d", step + 1)
                return

    ckpt_mgr.wait_until_finished()
    metrics_logger.close()
    logger.info("training complete at step %d", config.num_train_steps)


def create_loader(config, mesh):
    from lap_tpu.data.loader import create_data_loader

    shards = mesh.shape["dp"] * mesh.shape["fsdp"]
    if config.batch_size % shards != 0:
        raise ValueError(
            f"batch_size {config.batch_size} not divisible by data shards {shards}"
        )
    if config.pp_devices > 1 and (config.batch_size // shards) % config.pp_microbatches != 0:
        raise ValueError(
            f"per-shard batch {config.batch_size // shards} not divisible by "
            f"pp_microbatches={config.pp_microbatches}"
        )
    return create_data_loader(config, mesh, split="train")


def _collect_assets(config, loader) -> dict:
    assets = {}
    stats = getattr(loader, "norm_stats", None)
    if stats:
        assets[f"{config.data.asset_id}/norm_stats.json"] = {
            "norm_stats": {k: v.to_dict() for k, v in stats.items()}
        }
    state_dict = getattr(loader, "state_dict", lambda: None)()
    if state_dict:
        # Gather every host's dataloader cursor so the (process-0-written)
        # assets item holds all of them; each process restores its own key.
        from lap_tpu.training.array_utils import gather_host_json

        for i, st in enumerate(gather_host_json(state_dict)):
            assets[f"dataloader_process_{i}/dataloader_state.json"] = st
    return assets


if __name__ == "__main__":
    main(_config.cli())
