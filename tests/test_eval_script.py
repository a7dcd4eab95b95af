"""scripts/eval.py end to end: both dataset configurations really run.

Reference behavior being guarded (lihzha/lap ``scripts/eval.py:285-360``): a
run configured with a data mixture is evaluated on BOTH its own mixture and
the held-out ``eval_demo_dataset`` mixture. A missing demo mixture must be a
loud WARNING naming what was skipped — never a silent disappearance — and a
broken original mixture must abort the eval.
"""

import dataclasses
import importlib
import json
import logging

import jax
import numpy as np
import pytest

import tests.test_transforms_oxe as tto
from lap_tpu.data import rlds
from lap_tpu.data.episode_pipeline import encode_jpeg
from lap_tpu.data.mixtures import OXE_NAMED_MIXTURES

eval_script = importlib.import_module("scripts.eval")


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalds")
    rng = np.random.default_rng(0)
    orig = tto.IMGS
    tto.IMGS = [
        encode_jpeg(rng.integers(0, 255, (32, 32, 3), np.uint8)) for _ in range(tto.T)
    ]
    try:
        fab = tto.FABRICATORS["bridge_dataset"]
        rlds.write_rlds_dataset(root, "bridge_v2_oxe", [fab() for _ in range(4)])
    finally:
        tto.IMGS = orig
    return root


def _make_config(data_dir, ckpt_base):
    from lap_tpu.training import config as _config

    cfg = _config.get_config("debug")
    return dataclasses.replace(
        cfg,
        exp_name="evaltest",
        checkpoint_base_dir=str(ckpt_base),
        batch_size=8,
        num_eval_batches=1,
        eval_split="val",
        model=dataclasses.replace(cfg.model, action_dim=16),
        data=dataclasses.replace(
            cfg.data,
            repo_id="evalds",
            data_mix="eval_orig_mix",
            rlds_data_dir=str(data_dir),
            val_fraction=1.0,
            shuffle_buffer_size=16,
        ),
    )


def _write_checkpoint(cfg):
    import jax.numpy as jnp

    from lap_tpu.training.checkpoints import CheckpointManager
    from lap_tpu.training.state import TrainState

    model = cfg.model.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )["params"]
    state = TrainState(
        step=jnp.asarray(1),
        params=params,
        opt_state={"count": jnp.zeros(())},
        ema_params=None,
    )
    mgr = CheckpointManager(cfg.checkpoint_dir)
    mgr.save(1, state)
    mgr.wait_until_finished()


def _logged_prefixes(cfg):
    path = cfg.checkpoint_dir / "metrics.jsonl"
    prefixes = set()
    for line in path.read_text().splitlines():
        rec = json.loads(line)
        for key in rec:
            if "/" in key:
                prefixes.add(key.split("/")[1])  # eval/<ds_name>/<metric>
    return prefixes


def test_eval_runs_both_dataset_configs(data_dir, tmp_path):
    cfg = _make_config(data_dir, tmp_path)
    _write_checkpoint(cfg)
    OXE_NAMED_MIXTURES["eval_orig_mix"] = [("bridge_v2_oxe", 1.0)]
    OXE_NAMED_MIXTURES["eval_demo_dataset"] = [("bridge_v2_oxe", 1.0)]
    try:
        eval_script.main(cfg)
    finally:
        OXE_NAMED_MIXTURES.pop("eval_orig_mix", None)
        OXE_NAMED_MIXTURES.pop("eval_demo_dataset", None)
    prefixes = _logged_prefixes(cfg)
    assert "original" in prefixes
    assert "eval_demo_dataset" in prefixes


def test_eval_missing_demo_mixture_warns_loudly(data_dir, tmp_path):
    cfg = _make_config(data_dir, tmp_path)
    _write_checkpoint(cfg)
    # main() calls logging.basicConfig(force=True), which strips root handlers
    # (including pytest's caplog handler) — capture on the module logger.
    records: list[logging.LogRecord] = []
    handler = logging.Handler()
    handler.emit = records.append
    logging.getLogger("lap_tpu.eval").addHandler(handler)
    OXE_NAMED_MIXTURES["eval_orig_mix"] = [("bridge_v2_oxe", 1.0)]
    try:
        eval_script.main(cfg)
    finally:
        OXE_NAMED_MIXTURES.pop("eval_orig_mix", None)
        logging.getLogger("lap_tpu.eval").removeHandler(handler)
    warnings = [r for r in records if "SKIPPING" in r.getMessage()]
    assert warnings, "missing demo mixture must produce a WARNING"
    assert "eval_demo_dataset" in warnings[0].getMessage()
    prefixes = _logged_prefixes(cfg)
    assert "original" in prefixes
    assert "eval_demo_dataset" not in prefixes


def test_eval_runs_on_tp_mesh(data_dir, tmp_path):
    """Offline eval over a (dp, fsdp, tp) mesh: the checkpoint restores
    sharded and the jitted loss evaluators execute with tp axes in play."""
    cfg = _make_config(data_dir, tmp_path)
    cfg = dataclasses.replace(cfg, fsdp_devices=2, tp_devices=2)
    _write_checkpoint(cfg)
    OXE_NAMED_MIXTURES["eval_orig_mix"] = [("bridge_v2_oxe", 1.0)]
    try:
        eval_script.main(cfg)
    finally:
        OXE_NAMED_MIXTURES.pop("eval_orig_mix", None)
    assert "original" in _logged_prefixes(cfg)
