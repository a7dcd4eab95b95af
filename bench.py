"""Headline benchmark: LAP-3B on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Hz", "vs_baseline": N, ...extras}

The primary metric is action-chunk inference rate; vs_baseline is measured
Hz / 15 Hz — the reference's real-robot DROID control rate (reference
scripts/real_robot/shared.py:23) and the north-star target in BASELINE.md
(>= 15 Hz per v5e chip at p50). Extras record the train-step wall-clock for
the BASELINE.md second north star (lap_libero fine-tune step time): fwd+bwd
of the full 2-expert loss at the lap_libero operating point (action_horizon
10, max_token_len 180), reported per-example so it scales to any global
batch / chip count.

A persistent XLA compilation cache under .jax_cache keeps repeat runs fast
(the 2-expert loss graph compiles in minutes the first time). If the train
graph cannot compile/fit on this chip, the Hz metric still prints.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_HZ = 15.0

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def _flagship_cfg(on_tpu: bool, *, action_horizon: int = 16):
    from lap_tpu.models.lap_model import LAPConfig

    if on_tpu:
        return LAPConfig(
            paligemma_variant="gemma_2b",
            action_expert_variant="gemma_300m",
            action_dim=32,
            action_horizon=action_horizon,
            max_token_len=180,
            enable_action_training=True,
            enable_langact_training=True,
        )
    return LAPConfig(
        dtype="float32",
        paligemma_variant="dummy",
        action_expert_variant="dummy",
        siglip_variant="dummy",
        action_dim=7,
        action_horizon=4,
        max_token_len=16,
        image_resolution=(28, 28),
        enable_action_training=True,
        enable_langact_training=True,
    )


def _init_params(model, dtype):
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(dtype),
            model.init(k, k, method=model.init_params_fn),
        )
    )(rng)
    jax.block_until_ready(params)
    return params


def bench_inference(on_tpu: bool) -> float:
    """p50 seconds per action chunk (policy inference, batch 1)."""
    cfg = _flagship_cfg(on_tpu)
    iters = 30 if on_tpu else 3
    model = cfg.create_module()
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = _init_params(model, dtype)
    rng = jax.random.PRNGKey(0)
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

    per_iter = []
    for _ in range(3):
        out = noise
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, rng, obs, out)
        np.asarray(out)  # materialize -> fences the whole chain
        per_iter.append((time.perf_counter() - t0) / iters)
    return float(np.percentile(np.array(per_iter), 50))


def bench_train_step(on_tpu: bool) -> dict:
    """Wall-clock of one fwd+bwd of the full 2-expert loss (lap_libero shape).

    Micro-batch 1 in bf16 on one chip; per-example ms is the scalable number
    (global step time = per_example_ms * global_batch / n_chips at the same
    efficiency). Returns {} if the graph cannot compile/fit.
    """
    try:
        cfg = _flagship_cfg(on_tpu, action_horizon=10)  # lap_libero operating point
        model = cfg.create_module()
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        params = _init_params(model, dtype)
        rng = jax.random.PRNGKey(0)
        batch = 1
        obs = cfg.fake_obs(batch)
        obs = obs.replace(
            tokenized_prompt=jnp.tile(
                jnp.arange(cfg.max_token_len, dtype=jnp.int32)[None], (batch, 1)
            ),
            tokenized_langact_mask=jnp.tile(
                (jnp.arange(cfg.max_token_len) >= 8)[None], (batch, 1)
            ),
            token_loss_mask=jnp.ones((batch, cfg.max_token_len), bool),
        )
        actions = cfg.fake_actions(batch)

        # Full-3B grads (13.4 GB params+grads in bf16) exceed one v5e's HBM;
        # measure the frozen-VLM fine-tune instead: grads for the action
        # expert + projections only (reference freeze_filter semantics), the
        # realistic single-chip operating point.
        from lap_tpu.models.lap_model import get_vlm_freeze_filter
        from lap_tpu.training.optimizer import freeze_mask_from_filter

        mask = freeze_mask_from_filter(params["params"], get_vlm_freeze_filter(cfg))
        frozen = {"params": jax.tree.map(lambda p, m: p if m else None, params["params"], mask)}
        trainable = {"params": jax.tree.map(lambda p, m: None if m else p, params["params"], mask)}

        def merge(t, f):
            return jax.tree.map(
                lambda a, b: a if b is None else b, t, f,
                is_leaf=lambda x: x is None,
            )

        def loss_fn(t, f, r, noise_seed):
            loss, _ = model.apply(
                merge(t, f), jax.random.fold_in(r, noise_seed), obs, actions,
                train=True, method=model.compute_loss,
            )
            return loss

        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        loss, grads = grad_fn(trainable, frozen, rng, 0)
        jax.block_until_ready(loss)
        iters = 8 if on_tpu else 2
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            acc = None
            for i in range(iters):
                loss, grads = grad_fn(trainable, frozen, rng, rep * iters + i)
                acc = loss if acc is None else acc + loss
            float(acc)  # fence
            ts.append((time.perf_counter() - t0) / iters)
        step_ms = float(np.median(ts)) * 1e3
        return {
            "train_fwd_bwd_ms_per_example_frozen_vlm": round(step_ms / batch, 2),
            "train_examples_per_sec_per_chip_frozen_vlm": round(1000.0 * batch / step_ms, 2),
        }
    except Exception as e:  # noqa: BLE001 - OOM / compile limits: skip extras
        return {"train_bench_skipped": str(e)[:120]}


def main():
    on_tpu = jax.default_backend() == "tpu"
    p50_s = bench_inference(on_tpu)
    hz = 1.0 / p50_s
    record = {
        "metric": "LAP-3B action chunks/sec per chip (p50)",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / BASELINE_HZ, 3),
    }
    record.update(bench_train_step(on_tpu))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
