"""End-to-end serving benchmark: drive a RUNNING policy server like N robots.

Measures what a deployment actually gets — websocket + msgpack + host
transforms + device inference — unlike bench.py's model-level numbers.
Spawns one client thread per simulated robot, each sending observations
back-to-back for --seconds, then prints ONE JSON line:

    {"robots": N, "hz_per_robot": ..., "hz_aggregate": ...,
     "latency_ms_p50": ..., "latency_ms_p95": ..., "batch_sizes": {...}}

Usage:
    python scripts/serve_policy.py --env LAP --max_batch 2 &   # the server
    python scripts/bench_serving.py --robots 2 --seconds 30
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time
from collections import Counter
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _fake_obs(rng, image_size: int, state_dim: int, prompt: str) -> dict:
    return {
        "observation": {
            "base_0_rgb": rng.integers(0, 255, (image_size, image_size, 3), np.uint8),
            "left_wrist_0_rgb": rng.integers(
                0, 255, (image_size, image_size, 3), np.uint8
            ),
            "state": rng.standard_normal(state_dim).astype(np.float32),
        },
        "prompt": prompt,
    }


def _robot_loop(
    host: str, port: int, seconds: float, args
) -> tuple[list[tuple[float, int]], float]:
    """One simulated robot: request, wait for the chunk, repeat. Returns
    ((latency_s, batch_size) per completed request, measured_span_s). The
    span starts AFTER the warmup request (whose first-shape compile can take
    tens of seconds) so throughput is counted over the same window as the
    requests it divides."""
    from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy

    rng = np.random.default_rng(port)
    client = WebsocketClientPolicy(host=host, port=port)
    obs = _fake_obs(rng, args.image_size, args.state_dim, args.prompt)
    # Warmup request (first-shape compile happens here, off the clock).
    client.infer(obs)
    out = []
    start = time.monotonic()
    deadline = start + seconds
    while time.monotonic() < deadline:
        t0 = time.monotonic()
        result = client.infer(obs)
        dt = time.monotonic() - t0
        timing = result.get("policy_timing", {})
        out.append((dt, int(timing.get("batch_size", 1))))
    span = time.monotonic() - start
    client.close()
    return out, span


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--robots", type=int, default=1)
    parser.add_argument("--seconds", type=float, default=30.0)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--state_dim", type=int, default=7)
    parser.add_argument("--prompt", default="pick up the cup")
    args = parser.parse_args()

    with ThreadPoolExecutor(args.robots) as ex:
        futs = [
            ex.submit(_robot_loop, args.host, args.port, args.seconds, args)
            for _ in range(args.robots)
        ]
        results = [f.result() for f in futs]
    per_robot = [r for r, _ in results]

    latencies = np.array([dt for robot in per_robot for dt, _ in robot])
    sizes = Counter(bs for robot in per_robot for _, bs in robot)
    n = int(latencies.size)
    # Each robot's rate over ITS measured window (post-warmup); connection
    # setup and the first-shape compile are excluded by construction.
    robot_hz = [len(r) / span for r, span in results if span > 0]
    hz_per_robot = float(np.mean(robot_hz)) if robot_hz else 0.0
    record = {
        "robots": args.robots,
        "requests": n,
        "hz_per_robot": round(hz_per_robot, 2),
        "hz_aggregate": round(hz_per_robot * args.robots, 2),
        "latency_ms_p50": round(float(np.percentile(latencies, 50)) * 1e3, 1),
        "latency_ms_p95": round(float(np.percentile(latencies, 95)) * 1e3, 1),
        "batch_sizes": {str(k): v for k, v in sorted(sizes.items())},
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
