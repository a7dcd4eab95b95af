"""serve_policy.py CLI surface: boot the DEBUG preset as a real subprocess
and drive it over the websocket client (metadata + inference + recorder)."""

import os
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    "LAP_TPU_MESH_PLATFORM": "cpu",
}
ENV.pop("PALLAS_AXON_POOL_IPS", None)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _boot_server(*extra_args):
    """Start serve_policy.py (DEBUG preset) on a free port and wait until a
    client can connect. Returns (proc, port)."""
    from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy

    port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable, "scripts/serve_policy.py",
            "--env", "DEBUG", "--host", "127.0.0.1", "--port", str(port),
            "--default_prompt", "pick up the block",
            *extra_args,
        ],
        cwd=REPO, env=ENV,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + 300
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(f"server died:\n{proc.stdout.read()[-3000:]}")
        try:
            WebsocketClientPolicy(host="127.0.0.1", port=port).close()
            return proc, port
        except Exception:  # noqa: BLE001 - still booting
            time.sleep(1.0)
    proc.kill()
    raise AssertionError("server never became reachable")


def _obs():
    rng = np.random.default_rng(0)
    return {
        "observation": {
            "base_0_rgb": rng.integers(0, 255, (56, 56, 3), np.uint8),
            "left_wrist_0_rgb": rng.integers(0, 255, (56, 56, 3), np.uint8),
            "state": np.zeros(7, np.float32),
        },
        "prompt": "pick up the cup",
    }


def test_serve_policy_cli_debug(tmp_path):
    from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy

    record = tmp_path / "rec"
    proc, port = _boot_server("--record_dir", str(record))
    try:
        client = WebsocketClientPolicy(host="127.0.0.1", port=port)
        meta = client.get_server_metadata()
        assert meta.get("config") == "debug"

        result = client.infer(_obs())
        assert np.isfinite(result["actions"]).all()
        assert result["policy_timing"]["infer_ms"] > 0
        client.close()
        # The recorder wrote the request/response pair.
        time.sleep(0.5)
        assert record.exists() and any(record.iterdir())
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)


def test_serve_policy_cli_batched():
    """--max_batch 2: two concurrent clients through the micro-batcher."""
    from concurrent.futures import ThreadPoolExecutor

    from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy

    proc, port = _boot_server("--max_batch", "2", "--batch_window_ms", "1000")
    try:
        def one_client(n):
            c = WebsocketClientPolicy(host="127.0.0.1", port=port)
            outs = [c.infer(_obs()) for _ in range(n)]
            c.close()
            return outs

        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(one_client, 3) for _ in range(2)]
            results = [f.result() for f in futs]
        batch_sizes = []
        for outs in results:
            for r in outs:
                assert np.isfinite(r["actions"]).all()
                batch_sizes.append(r["policy_timing"]["batch_size"])
        # Two clients in lockstep with a 1 s window: at least one call
        # must have coalesced both requests.
        assert max(batch_sizes) == 2
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)


def test_bench_serving_cli():
    """scripts/bench_serving.py drives a live batched server and reports
    per-robot rates + batch-size histogram."""
    import json

    proc, port = _boot_server("--max_batch", "2", "--batch_window_ms", "200")
    try:
        bench = subprocess.run(
            [
                sys.executable, "scripts/bench_serving.py",
                "--host", "127.0.0.1", "--port", str(port),
                "--robots", "2", "--seconds", "5",
                "--image_size", "56",
            ],
            cwd=REPO, env=ENV, capture_output=True, text=True, timeout=600,
        )
        assert bench.returncode == 0, bench.stdout + bench.stderr
        record = json.loads(bench.stdout.strip().splitlines()[-1])
        assert record["robots"] == 2
        assert record["requests"] >= 2
        assert record["hz_aggregate"] > 0
        assert record["latency_ms_p50"] > 0
        # Two lockstep robots with a 200 ms window coalesce.
        assert "2" in record["batch_sizes"]
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
