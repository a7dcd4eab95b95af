"""Headline benchmark: LAP-3B action-chunk inference rate on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Hz", "vs_baseline": N}

vs_baseline is measured Hz / 15 Hz — the reference's real-robot DROID
control rate (reference scripts/real_robot/shared.py:23) and the north-star
target in BASELINE.md (>= 15 Hz per v5e chip at p50).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_HZ = 15.0


def main():
    from lap_tpu.models.lap_model import LAPConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = LAPConfig(
            paligemma_variant="gemma_2b",
            action_expert_variant="gemma_300m",
            action_dim=32,
            action_horizon=16,
            max_token_len=180,
            enable_action_training=True,
            enable_langact_training=True,
        )
        dtype = jnp.bfloat16
        iters = 30
    else:  # debug fallback so the script runs anywhere
        cfg = LAPConfig(
            dtype="float32",
            paligemma_variant="dummy",
            action_expert_variant="dummy",
            siglip_variant="dummy",
            action_dim=7,
            action_horizon=4,
            max_token_len=16,
            image_resolution=(28, 28),
            enable_action_training=True,
        )
        dtype = jnp.float32
        iters = 3

    model = cfg.create_module()
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(dtype),
            model.init(k, k, method=model.init_params_fn),
        )
    )(rng)
    jax.block_until_ready(params)

    obs = cfg.fake_obs(1)
    # ``noise`` is threaded through so successive calls form a data-dependency
    # chain: on remote-tunnel platforms block_until_ready alone does not
    # reliably fence execution, so we time the whole chain and fetch the final
    # value to host.
    fn = jax.jit(
        lambda p, r, o, n: model.apply(
            p, r, o, num_steps=10, noise=n, method=model.sample_actions
        )
    )
    noise = jax.random.normal(rng, (1, cfg.action_horizon, cfg.action_dim))
    np.asarray(fn(params, rng, obs, noise))  # compile + sync

    def run_chain(k):
        out = noise
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(params, rng, obs, out)
        np.asarray(out)  # materialize -> fences the whole chain
        return time.perf_counter() - t0

    per_iter = []
    for _ in range(3):
        total = run_chain(iters)
        per_iter.append(total / iters)
    p50_s = float(np.percentile(np.array(per_iter), 50))
    hz = 1.0 / p50_s

    print(
        json.dumps(
            {
                "metric": "LAP-3B action chunks/sec per chip (p50)",
                "value": round(hz, 2),
                "unit": "Hz",
                "vs_baseline": round(hz / BASELINE_HZ, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
