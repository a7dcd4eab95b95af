"""Pod-correctness: 2 real jax.distributed CPU processes.

Spawns two subprocesses (4 virtual CPU devices each -> 8 global) running
tests/multiprocess_worker.py, which asserts the per-host data path, the
assembled global batch, and cross-host asset gathering.
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_path():
    port = _free_port()
    worker = REPO / "tests" / "multiprocess_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous: each worker also traces+lowers the LAP-3B train step
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MPWORKER_FLAGSHIP_OK {i}" in out, out[-3000:]
        assert f"MPWORKER_OK {i}" in out, out[-3000:]
