"""Metric reduction and logging.

Capability parity with lihzha/lap ``training/metrics_logging.py``: stack
per-step metric dicts, reduce scalars, and log to console + JSONL (+ wandb
when importable and enabled).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

try:
    import wandb as _wandb
except ImportError:  # wandb is optional
    _wandb = None


class MetricsLogger:
    def __init__(self, *, log_dir: str | Path | None = None, wandb_enabled: bool = False,
                 project: str = "lap_tpu", exp_name: str = "default", config: dict | None = None,
                 resume: bool = True, rewind_to_step: int | None = None):
        # Only process 0 writes files / talks to wandb; other hosts would
        # create duplicate runs and race on the shared run-id/jsonl files
        # (reference train.py:80-81 disables wandb off-host-0).
        import jax

        if jax.process_index() != 0:
            log_dir = None
            wandb_enabled = False
        self._jsonl = None
        if log_dir is not None:
            path = Path(log_dir)
            path.mkdir(parents=True, exist_ok=True)
            self._jsonl = (path / "metrics.jsonl").open("a")
        self._wandb = None
        if wandb_enabled and _wandb is not None:
            # Run-id persistence for preemption-safe resume + optional rewind
            # (reference train.py:88-97).
            kwargs = dict(project=project, name=exp_name, config=config or {})
            run_id_file = Path(log_dir) / "wandb_run_id.txt" if log_dir else None
            if resume and run_id_file is not None and run_id_file.exists():
                kwargs["id"] = run_id_file.read_text().strip()
                kwargs["resume"] = "allow"
                if rewind_to_step is not None:
                    kwargs["resume"] = None
                    kwargs["resume_from"] = f"{kwargs['id']}?_step={rewind_to_step}"
            self._wandb = _wandb.init(**kwargs)
            if run_id_file is not None:
                run_id_file.write_text(self._wandb.id)
        self._t_last = time.monotonic()
        self._last_step = 0

    def log(self, step: int, metrics: dict, *, prefix: str = "train") -> dict:
        scalars = reduce_metrics(metrics)
        now = time.monotonic()
        if step > self._last_step:
            scalars["steps_per_sec"] = (step - self._last_step) / max(now - self._t_last, 1e-9)
        self._t_last, self._last_step = now, step
        record = {f"{prefix}/{k}": v for k, v in scalars.items()}
        record["step"] = step
        line = " ".join(
            f"{k.split('/')[-1]}={v:.4g}" for k, v in sorted(record.items()) if k != "step"
        )
        logger.info("step %6d | %s", step, line)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(record, step=step)
        return scalars

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


def reduce_metrics(metrics: dict) -> dict:
    """Keep scalar-reducible entries; mean-reduce arrays."""
    out = {}
    for k, v in metrics.items():
        try:
            arr = np.asarray(v)
        except Exception:  # noqa: BLE001
            continue
        if arr.dtype == object or arr.dtype.kind in "US":
            continue
        if arr.size == 0:
            continue
        if arr.ndim == 0:
            out[k] = float(arr)
        elif arr.size <= 4096:
            out[k] = float(arr.mean())
    return out


def stack_metrics(metric_list: list[dict]) -> dict:
    """Stack a window of per-step metric dicts into mean scalars."""
    if not metric_list:
        return {}
    keys = metric_list[0].keys()
    out = {}
    for k in keys:
        vals = [m[k] for m in metric_list if k in m]
        try:
            out[k] = np.mean([np.asarray(v).mean() for v in vals])
        except Exception:  # noqa: BLE001
            continue
    return out


class HostBatchCache:
    """Keep the most recent host-local batch for visualization
    (reference metrics_logging.py:30-47)."""

    def __init__(self):
        self._batch = None

    def update(self, batch):
        import jax

        from lap_tpu.training.array_utils import to_local_array

        self._batch = None if batch is None else jax.tree.map(to_local_array, batch)

    def get(self):
        return self._batch


class DatasetLogTracker:
    """Round-robin selection of per-dataset samples to log
    (reference metrics_logging.py:50-121)."""

    def __init__(self, datasets: list[str], samples_per_dataset: int = 2):
        self.datasets = list(datasets)
        self.samples_per_dataset = samples_per_dataset
        self._cursor = 0

    def next_datasets(self, k: int = 1) -> list[str]:
        if not self.datasets:
            return []
        out = []
        for _ in range(k):
            out.append(self.datasets[self._cursor % len(self.datasets)])
            self._cursor += 1
        return out

    def select_samples(self, dataset_names: list[str], target: str) -> list[int]:
        """Indices of batch entries from `target`, capped per dataset."""
        return [i for i, n in enumerate(dataset_names) if n == target][
            : self.samples_per_dataset
        ]


def log_device_mem(prefix: str = "") -> dict:
    """Device HBM probe (the reference depends on jax-smi for this)."""
    import jax

    out = {}
    try:
        for d in jax.local_devices():
            stats = d.memory_stats() or {}
            used = stats.get("bytes_in_use", 0) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            out[f"hbm_gb_used_d{d.id}"] = round(used, 2)
            logger.info(
                "%sdevice %s HBM: %.2f / %.2f GB", f"{prefix} " if prefix else "",
                d.id, used, limit,
            )
    except Exception:  # noqa: BLE001 - not all backends expose memory_stats
        pass
    return out


def log_mem(prefix: str = "") -> dict:
    """Host RAM probe (reference metrics_logging.py:124-128)."""
    try:
        import resource

        rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    except Exception:  # noqa: BLE001
        rss_gb = float("nan")
    logger.info("%shost RSS: %.2f GB", f"{prefix} " if prefix else "", rss_gb)
    return {"host_rss_gb": rss_gb}
