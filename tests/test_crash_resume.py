"""Real preemption: SIGKILL a training process mid-run, then resume.

The simulated variant (tests/test_resume.py) fabricates an orbax tmp dir;
this one kills an actual `scripts/train.py` subprocess at an arbitrary
moment and asserts the restart either resumes from an intact checkpoint or
starts fresh — never crashes on leftover state.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    "LAP_TPU_MESH_PLATFORM": "cpu",
}
ENV.pop("PALLAS_AXON_POOL_IPS", None)


def _train_cmd(ckpt_dir, steps, resume):
    return [
        sys.executable, "scripts/train.py", "debug",
        "--checkpoint_base_dir", str(ckpt_dir),
        "--num_train_steps", str(steps),
        "--save_interval", "1",
        "--log_interval", "1",
        "--resume", str(resume).lower(),
    ]


def test_sigkill_mid_training_then_resume(tmp_path):
    ckpt = tmp_path / "ck"
    proc = subprocess.Popen(
        _train_cmd(ckpt, steps=50, resume=False),
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # Wait until at least one checkpoint save began, then kill hard at an
    # arbitrary moment (mid-save more often than not with save_interval=1).
    deadline = time.time() + 700  # generous: first XLA compile under CPU contention
    run_dir = ckpt / "debug" / "default"
    saw_step = False
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read()
            raise AssertionError(f"train exited early:\n{out[-3000:]}")
        if run_dir.exists() and any(p.name.isdigit() for p in run_dir.iterdir()):
            saw_step = True
            break
        time.sleep(1.0)
    assert saw_step, "no checkpoint appeared before deadline"
    time.sleep(0.3)  # let a save be in flight
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)

    # Restart with resume: must come up cleanly whatever state the kill left.
    out = subprocess.run(
        _train_cmd(ckpt, steps=3, resume=True),
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=800,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "training complete" in (out.stdout + out.stderr)


def test_sigterm_saves_and_exits_cleanly(tmp_path):
    """Graceful preemption: SIGTERM -> checkpoint -> exit 0 -> resume."""
    ckpt = tmp_path / "ck"
    proc = subprocess.Popen(
        _train_cmd(ckpt, steps=500, resume=False),
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    run_dir = ckpt / "debug" / "default"
    deadline = time.time() + 700  # generous: first XLA compile under CPU contention
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(f"train exited early:\n{proc.stdout.read()[-3000:]}")
        if run_dir.exists() and any(p.name.isdigit() for p in run_dir.iterdir()):
            break
        time.sleep(1.0)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-3000:]
    assert "exiting after preemption checkpoint" in out

    resumed = subprocess.run(
        _train_cmd(ckpt, steps=3, resume=True),
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=800,
    )
    assert resumed.returncode == 0, resumed.stdout[-2000:] + resumed.stderr[-2000:]
