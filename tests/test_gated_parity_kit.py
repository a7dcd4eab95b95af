"""The one-command gated parity kit on fabricated stand-ins (VERDICT r4 #9).

Real assets (tokenizer .model, FAST export, released weights) are absent in
this image; these tests prove the KIT itself works — record/replay through
``scripts/compare_served_outputs.py`` round-trips on a fabricated checkpoint,
mismatches are detected, and ``run_gated_parity.sh`` degrades to explicit
SKIP lines when no assets are present.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import orbax.checkpoint as ocp
import pytest

from lap_tpu.policies import policy_config
from lap_tpu.policies.policy import PolicyRecorder, unflatten_record
from lap_tpu.training import config as config_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def recorded(tmp_path_factory):
    """Fabricated checkpoint + records produced by serving it."""
    tmp = tmp_path_factory.mktemp("parity_kit")
    train_config = config_mod.get_config("debug")
    model = train_config.model.create_module()
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
    )["params"]
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save((tmp / "ckpt" / "params").resolve(), {"params": params})

    policy = policy_config.create_trained_policy(
        train_config, tmp / "ckpt", allow_test_vocab=True, num_steps=2
    )
    recorder = PolicyRecorder(policy, str(tmp / "records"))
    rng = np.random.default_rng(0)
    for i in range(2):
        recorder.infer(
            {
                "observation": {
                    "base_0_rgb": rng.integers(0, 255, (56, 56, 3), np.uint8),
                    "left_wrist_0_rgb": rng.integers(0, 255, (56, 56, 3), np.uint8),
                    "state": np.linspace(-0.5, 0.5, 7).astype(np.float32),
                },
                "prompt": f"pick up the cup {i}",
            }
        )
    return tmp


def test_recorder_roundtrips_nested_observation(recorded):
    files = sorted((recorded / "records").glob("step_*.npz"))
    assert len(files) == 2
    with np.load(files[0], allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    req = unflatten_record(flat, "obs")
    assert req["observation"]["base_0_rgb"].shape == (56, 56, 3)
    assert str(req["prompt"]) == "pick up the cup 0"
    assert flat["out/actions"].shape == (4, 7)


def _compare(recorded, extra=()):
    return subprocess.run(
        [
            sys.executable,
            "scripts/compare_served_outputs.py",
            "--config",
            "debug",
            "--checkpoint_dir",
            str(recorded / "ckpt"),
            "--records_dir",
            str(recorded / "records"),
            "--allow_test_vocab",
            "--num_steps",
            "2",
            *extra,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )


def test_compare_served_outputs_matches(recorded):
    """Replaying the records against the same checkpoint matches. The policy
    noise key depends on the per-policy request counter, so replay determinism
    (counter restarts at 1, same as recording) is part of what's proven."""
    proc = _compare(recorded)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "2/2 records matched" in proc.stdout


def test_compare_served_outputs_detects_mismatch(recorded, tmp_path):
    """A corrupted expected-actions record must fail the comparison."""
    import shutil

    bad = tmp_path / "records"
    shutil.copytree(recorded / "records", bad)
    f = sorted(bad.glob("step_*.npz"))[0]
    with np.load(f, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    flat["out/actions"] = flat["out/actions"] + 10.0
    np.savez(f, **flat)
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/compare_served_outputs.py",
            "--config",
            "debug",
            "--checkpoint_dir",
            str(recorded / "ckpt"),
            "--records_dir",
            str(bad),
            "--allow_test_vocab",
            "--num_steps",
            "2",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "MISMATCH" in proc.stdout


def test_record_flattening_roundtrips_slash_keys():
    """openpi-style flat request keys ('observation/state') contain the
    flattener's separator; they must round-trip as themselves, not as
    nesting."""
    from lap_tpu.policies.policy import _flatten_record

    req = {
        "observation/exterior_image_1_left": np.zeros((2, 2), np.uint8),
        "nested": {"a/b": np.float32(1.5), "plain": np.int32(7)},
    }
    flat: dict = {}
    _flatten_record("obs", req, flat)
    back = unflatten_record(flat, "obs")
    assert set(back) == {"observation/exterior_image_1_left", "nested"}
    assert back["nested"]["a/b"] == np.float32(1.5)
    assert back["nested"]["plain"] == 7


def test_run_gated_parity_rejects_missing_asset_path(tmp_path):
    """A SET-but-nonexistent asset path is a user error (typo), not a skip:
    the kit must exit 2 instead of reporting success past it."""
    env = {k: v for k, v in os.environ.items() if not k.startswith("LAP_TPU_")}
    env["LAP_TPU_TOKENIZER_MODEL"] = str(tmp_path / "typo.model")
    proc = subprocess.run(
        ["bash", "scripts/run_gated_parity.sh"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "ERROR: LAP_TPU_TOKENIZER_MODEL is set but" in proc.stdout


def test_run_gated_parity_skips_cleanly_without_assets():
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("LAP_TPU_")
    }
    proc = subprocess.run(
        ["bash", "scripts/run_gated_parity.sh"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert proc.stdout.count("== SKIP") == 3, proc.stdout
    assert "nothing ran" in proc.stdout
