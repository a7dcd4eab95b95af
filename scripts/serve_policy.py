"""Policy server CLI.

Capability parity with lihzha/lap ``scripts/serve_policy.py``: environment
presets (LAP / LAP_AR / LAP_LIBERO / DEBUG) with default checkpoint dirs,
optional request recording, and a websocket server on 0.0.0.0:8000.

Usage:
    python scripts/serve_policy.py --env LAP_LIBERO --checkpoint_dir ckpts/... [--port 8000]
    python scripts/serve_policy.py --env DEBUG          # tiny random model
"""

from __future__ import annotations

# Allow `python scripts/...` straight from a checkout: put the repo root on
# sys.path without requiring an installed package.
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))


import argparse
import dataclasses
import enum
import logging


class EnvMode(enum.Enum):
    LAP = "LAP"
    LAP_AR = "LAP_AR"
    LAP_LIBERO = "LAP_LIBERO"
    DEBUG = "DEBUG"


@dataclasses.dataclass
class Preset:
    config_name: str
    checkpoint_dir: str
    ar: bool = False
    default_prompt: str | None = None


PRESETS = {
    EnvMode.LAP: Preset("lap", "checkpoints/lap/params_latest"),
    EnvMode.LAP_AR: Preset("lap", "checkpoints/lap/params_latest", ar=True),
    EnvMode.LAP_LIBERO: Preset("lap_libero", "checkpoints/lap_libero/params_latest"),
    EnvMode.DEBUG: Preset("debug", ""),
}


def create_policy(args):
    from lap_tpu.policies import policy_config
    from lap_tpu.training import config as _config

    preset = PRESETS[EnvMode(args.env)]
    config_name = args.config or preset.config_name
    train_config = _config.get_config(config_name)
    checkpoint_dir = args.checkpoint_dir or preset.checkpoint_dir
    ar = args.ar if args.ar is not None else preset.ar

    if EnvMode(args.env) == EnvMode.DEBUG and not checkpoint_dir:
        # Randomly initialized tiny policy for pipeline debugging. This
        # branch skips the checkpoint-restore plumbing, so restore-time
        # features must not be silently ignored.
        if args.serve_tp > 1 or args.quantize:
            raise SystemExit(
                "--serve_tp/--quantize act at checkpoint restore; the DEBUG "
                "preset without --checkpoint_dir never restores. Fabricate a "
                "checkpoint and pass --checkpoint_dir to exercise them."
            )
        import jax

        from lap_tpu.policies.policy import Policy
        from lap_tpu.policies.policy_config import _build_transform_stacks

        model = train_config.model.create_module()
        params = model.init(
            jax.random.PRNGKey(0), jax.random.PRNGKey(0), method=model.init_params_fn
        )
        inputs, outputs = _build_transform_stacks(
            train_config, None, default_prompt=args.default_prompt, ar=False
        )
        return Policy(
            model, params, input_transforms=inputs, output_transforms=outputs,
            num_steps=2, token_bucket=args.token_bucket,
            metadata={"config": "debug", "mode": "flow"},
        )

    if ar:
        return policy_config.create_trained_policy_ar(
            train_config, checkpoint_dir, default_prompt=args.default_prompt,
            allow_test_vocab=args.allow_test_vocab, quantize=args.quantize,
            tp=args.serve_tp, token_bucket=args.token_bucket,
        )
    return policy_config.create_trained_policy(
        train_config, checkpoint_dir, default_prompt=args.default_prompt,
        allow_test_vocab=args.allow_test_vocab, quantize=args.quantize,
        tp=args.serve_tp, token_bucket=args.token_bucket,
    )


def main():
    logging.basicConfig(level=logging.INFO)
    # Cold-start latency: reuse compiled inference graphs across restarts.
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "LAP_TPU_COMPILATION_CACHE", os.path.expanduser("~/.cache/lap_tpu/xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="LAP", choices=[e.value for e in EnvMode])
    parser.add_argument("--config", default=None, help="override config name")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--default_prompt", default=None)
    parser.add_argument("--ar", action=argparse.BooleanOptionalAction, default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--record_dir", default=None)
    parser.add_argument(
        "--quantize", default=None, choices=["int8", "int4"],
        help="weight-only quantization on the decode path (prefill stays "
        "bf16): int8 ~2x decode bandwidth for ~0.4%% per-matmul weight "
        "rounding; int4 ~4x for ~2%% (group-wise scales)",
    )
    parser.add_argument(
        "--token_bucket", type=int, default=None,
        help="prompt-length bucketing: trim trailing token padding to the "
        "next multiple of N before prefill (the tokenizer pads to "
        "max_token_len; short robot prompts then pay full-length prefill). "
        "One cached XLA executable per bucket. Unset = reference behavior",
    )
    parser.add_argument(
        "--serve_tp", type=int, default=1,
        help="tensor-parallel serving over N chips (attention heads + MLP "
        "hidden dims sharded over a tp mesh axis; checkpoint restores "
        "directly onto device shardings). For models larger than one "
        "chip's HBM (gemma3_12b/27b). 1 = single-chip",
    )
    parser.add_argument(
        "--max_batch", type=int, default=1,
        help="serve up to N concurrent robots per batched device call "
        "(batch-1 inference is HBM-bound; a second request rides the same "
        "weight stream). 1 = reference behavior, no batching layer",
    )
    parser.add_argument(
        "--batch_window_ms", type=float, default=5.0,
        help="after a request arrives, wait this long for companions "
        "before launching the batch (only with --max_batch > 1)",
    )
    parser.add_argument(
        "--allow_test_vocab", action="store_true",
        help="serve a checkpoint through the built-in test vocabulary "
        "(ONLY for fabricated test checkpoints; real checkpoints need "
        "LAP_TPU_TOKENIZER_MODEL)",
    )
    args = parser.parse_args()

    policy = create_policy(args)
    if args.max_batch > 1:
        from lap_tpu.policies.batching import BatchingPolicy

        policy = BatchingPolicy(
            policy, max_batch=args.max_batch, window_ms=args.batch_window_ms
        )
    if args.record_dir:
        from lap_tpu.policies.policy import PolicyRecorder

        policy = PolicyRecorder(policy, args.record_dir)

    from lap_tpu.serving.websocket_policy_server import WebsocketPolicyServer

    logging.info("serving %s on %s:%d", policy.metadata, args.host, args.port)
    WebsocketPolicyServer(policy, host=args.host, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
