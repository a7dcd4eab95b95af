"""Checkpoint management.

Capability parity with lihzha/lap ``training/checkpoints.py``: orbax
CheckpointManager with three items per step —

- ``train_state``: the full TrainState (params, opt state, EMA, step),
- ``params``: inference weights, with EMA split out when present
  (reference ``_split_params``, checkpoints.py:529-547),
- ``assets``: norm-stats JSON + per-process dataloader state,

async save with retention (``keep_period``), resume detection, and explicit
sharding trees on restore.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def _state_dict(state) -> dict:
    # NOT dataclasses.asdict: that deep-copies leaves, and ShapeDtypeStructs
    # carrying NamedShardings (devices) are not deep-copyable.
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
    }

from lap_tpu.training.state import TrainState

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CheckpointManager:
    """Orbax manager with three items per step plus production robustness:

    - assets (norm stats, per-process dataloader state) ride the same async
      composite save as the arrays (``ocp.args.JsonSave``), so saves stay
      fully asynchronous and every step directory is atomic (orbax tmp-dir
      rename) — a kill mid-save never leaves a half-written latest step.
    - save retries with exponential backoff, then falls back to a
      synchronous manager (reference checkpoints.py:163-339 semantics).
    - cross-host barriers around save/restore (reference :293-294,427-430).
    """

    directory: Path
    keep_period: int | None = None
    max_to_keep: int = 1
    async_save: bool = True
    save_retries: int = 2

    def __post_init__(self):
        self.directory = Path(self.directory).resolve()
        self._mgr = self._make_mgr(self.async_save)

    def _make_mgr(self, async_save: bool) -> ocp.CheckpointManager:
        options = ocp.CheckpointManagerOptions(
            max_to_keep=self.max_to_keep,
            keep_period=self.keep_period,
            create=True,
            enable_async_checkpointing=async_save,
        )
        return ocp.CheckpointManager(
            self.directory,
            options=options,
            item_names=("train_state", "params", "assets"),
        )

    # -- queries ------------------------------------------------------------
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    # -- save ---------------------------------------------------------------
    def save(self, step: int, state: TrainState, *, assets: dict | None = None) -> None:
        """Save train_state + inference params + assets at ``step``."""
        import time

        from lap_tpu.training.array_utils import sync_global_devices

        from lap_tpu.training.state import inference_params

        # Merged EMA view (partitioned EMA holds only trainable leaves).
        infer_params = inference_params(state)
        args = ocp.args.Composite(
            train_state=ocp.args.PyTreeSave(_state_dict(_as_saveable(state))),
            params=ocp.args.PyTreeSave({"params": infer_params}),
            assets=ocp.args.JsonSave(assets or {}),
        )
        sync_global_devices(f"checkpoint_save_start_{step}")
        delay = 1.0
        for attempt in range(self.save_retries + 1):
            try:
                self._mgr.save(step, args=args, force=attempt > 0)
                return
            except Exception as e:  # noqa: BLE001
                logger.warning(
                    "checkpoint save at step %d failed (attempt %d/%d): %s",
                    step, attempt + 1, self.save_retries + 1, e,
                )
                try:
                    self._mgr.wait_until_finished()
                except Exception:  # noqa: BLE001 - the failed async task itself
                    pass
                if attempt == self.save_retries:
                    break
                time.sleep(delay)
                delay *= 2
        # Last resort: a fresh synchronous manager (async machinery may be
        # wedged; a blocking save still lands the checkpoint).
        logger.warning("falling back to synchronous checkpoint save at step %d", step)
        self._mgr = self._make_mgr(async_save=False)
        self._mgr.save(step, args=args, force=True)

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    # -- restore ------------------------------------------------------------
    def restore(self, step: int | None, state_template: TrainState) -> TrainState:
        """Restore a TrainState; template supplies structure/sharding."""
        from lap_tpu.training.array_utils import sync_global_devices

        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        template = _state_dict(_as_saveable(state_template))
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                train_state=ocp.args.PyTreeRestore(
                    jax.tree.map(_restore_spec, template)
                )
            ),
        )["train_state"]
        sync_global_devices(f"checkpoint_restore_{step}")
        if restored.get("ema_params") == {}:  # saved placeholder for "no EMA"
            restored["ema_params"] = None
        return TrainState(**restored)

    def load_assets(self, step: int, rel_path: str) -> Any | None:
        """Read one asset payload saved at ``step`` (None when absent)."""
        try:
            assets = self._mgr.restore(
                step, args=ocp.args.Composite(assets=ocp.args.JsonRestore())
            )["assets"]
            if isinstance(assets, dict) and rel_path in assets:
                return assets[rel_path]
        except Exception:  # noqa: BLE001 - checkpoints from older layouts
            pass
        # Legacy layout: plain JSON files under {step}/assets/{rel_path}.
        path = self.directory / str(step) / "assets" / rel_path
        if not path.exists():
            return None
        return json.loads(path.read_text())


def _as_saveable(state: TrainState) -> TrainState:
    # Drop None ema (orbax requires concrete leaves); encode as empty dict.
    if state.ema_params is None:
        return dataclasses.replace(state, ema_params={})
    return state


def _restore_spec(x):
    if hasattr(x, "sharding") or hasattr(x, "shape"):
        return ocp.type_handlers.ArrayRestoreArgs(
            sharding=getattr(x, "sharding", None)
        )
    return x


def initialize_checkpoint_dir(
    checkpoint_dir: Path, *, keep_period: int | None, overwrite: bool, resume: bool
) -> tuple[CheckpointManager, bool]:
    """Create/inspect the checkpoint dir; returns (manager, resuming)
    (reference checkpoints.py:67-127 semantics)."""
    checkpoint_dir = Path(checkpoint_dir).resolve()
    resuming = False
    if checkpoint_dir.exists() and any(checkpoint_dir.iterdir()):
        if overwrite:
            shutil.rmtree(checkpoint_dir)
            checkpoint_dir.mkdir(parents=True, exist_ok=True)
            logger.info("wiped checkpoint dir %s", checkpoint_dir)
        elif resume:
            resuming = True
        else:
            raise FileExistsError(
                f"{checkpoint_dir} exists; pass resume=True or overwrite=True"
            )
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    mgr = CheckpointManager(checkpoint_dir, keep_period=keep_period)
    if resuming and mgr.latest_step() is None:
        logger.info("resume requested but no checkpoint found; starting fresh")
        resuming = False
    return mgr, resuming


def restore_params(params_dir: str | Path, *, dtype=None) -> dict:
    """Load inference params saved by CheckpointManager (``.../{step}/params``)
    or by the reference's nnx trainer.

    Handles both released-checkpoint layouts (reference
    weight_loaders.py:150-189): plain pytrees, and nnx.State trees where
    every leaf path ends in a ``value`` key (stripped here, returning what
    NNX calls a "pure dict").
    """
    path = Path(params_dir).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        # Restore as host numpy arrays (no sharding requirement); the caller
        # device_puts / shards them as needed.
        import numpy as np

        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.type_handlers.RestoreArgs(restore_type=np.ndarray), meta
        )
        restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    params = restored["params"] if isinstance(restored, dict) and "params" in restored else restored
    params = _strip_nnx_value_suffix(params)
    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params)
    return params


def restore_params_sharded(params_dir: str | Path, shardings, *, partial: bool = False) -> dict:
    """Restore a params checkpoint directly onto device shardings.

    ``shardings`` is a pytree of NamedShardings matching the (pure-dict)
    parameter tree; arrays land sharded without staging the full f32 model in
    host memory — required to evaluate a >single-chip model (reference
    eval.py restores the train state with its sharding tree).

    ``partial=True`` restores ONLY the leaves covered by ``shardings`` (e.g.
    just the ``params`` subtree of a train_state item, skipping optimizer
    state entirely).

    Handles the same layouts as :func:`restore_params` (plain, ``params``
    wrapper, nnx ``value`` suffix).
    """
    import numpy as np

    path = Path(params_dir).resolve()
    flat_sh = {}

    def _keys(keypath):
        return tuple(str(getattr(k, "key", getattr(k, "idx", None))) for k in keypath)

    def collect(keypath, leaf):
        flat_sh[_keys(keypath)] = leaf

    jax.tree_util.tree_map_with_path(collect, shardings)

    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata

        def arg(keypath, _leaf):
            keys = _keys(keypath)
            candidates = [keys]
            if keys and keys[-1] == "value":  # nnx.State leaf suffix
                candidates.append(keys[:-1])
            for c in list(candidates):
                if c and c[0] == "params":  # {'params': tree} wrapper
                    candidates.append(c[1:])
            for c in candidates:
                sharding = flat_sh.get(c)
                if sharding is not None:
                    return ocp.type_handlers.ArrayRestoreArgs(sharding=sharding)
            return None if partial else ocp.type_handlers.RestoreArgs(restore_type=np.ndarray)

        if partial:
            # Build pruned (item, restore_args) trees holding ONLY the leaves
            # covered by `shardings`, so orbax never reads the rest.
            def build(node, prefix):
                if isinstance(node, dict):
                    items, args_ = {}, {}
                    for k, v in node.items():
                        sub = build(v, prefix + (str(k),))
                        if sub is not None:
                            items[k], args_[k] = sub
                    return (items, args_) if items else None
                a = arg_for(prefix)
                return (node, a) if a is not None else None

            def arg_for(keys):
                candidates = [keys]
                if keys and keys[-1] == "value":
                    candidates.append(keys[:-1])
                for c in list(candidates):
                    if c and c[0] == "params":
                        candidates.append(c[1:])
                for c in candidates:
                    sharding = flat_sh.get(c)
                    if sharding is not None:
                        return ocp.type_handlers.ArrayRestoreArgs(sharding=sharding)
                return None

            # item_metadata is a TreeMetadata wrapper; recurse over its dict.
            built = build(getattr(meta, "tree", meta), ())
            if built is None:
                raise KeyError(f"no checkpoint leaves match the sharding tree under {path}")
            item, restore_args = built
            restored = ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item=item, restore_args=restore_args, partial_restore=True
                ),
            )
        else:
            restore_args = jax.tree_util.tree_map_with_path(arg, meta)
            restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    params = restored["params"] if isinstance(restored, dict) and "params" in restored else restored
    return _strip_nnx_value_suffix(params)


def _strip_nnx_value_suffix(params: dict) -> dict:
    """nnx.State trees end every key path with "value"; strip to a pure dict."""
    if not isinstance(params, dict) or not params:
        return params
    flat = {}

    def walk(node, path):
        if isinstance(node, dict) and node:
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[path] = node

    walk(params, ())
    if not flat or not all(kp and kp[-1] == "value" for kp in flat):
        return params
    out: dict = {}
    for kp, v in flat.items():
        node = out
        for k in kp[:-2]:
            node = node.setdefault(k, {})
        node[kp[-2]] = v
    return out


def load_norm_stats(assets_dir: str | Path, asset_id: str) -> dict | None:
    """Read ``{assets_dir}/{asset_id}/norm_stats.json`` into NormStats
    (reference checkpoints.py:477-497)."""
    from lap_tpu.policies.model_transforms import NormStats

    path = Path(assets_dir) / asset_id / "norm_stats.json"
    if not path.exists():
        return None
    raw = json.loads(path.read_text())
    stats = raw.get("norm_stats", raw)
    return {k: NormStats.from_dict(v) for k, v in stats.items()}
