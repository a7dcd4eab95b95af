"""Served-output comparison against recorded reference responses.

Part of the one-command gated parity kit (scripts/run_gated_parity.sh,
round-4 VERDICT ask #9): given a directory of ``step_*.npz`` request/response
records (the ``PolicyRecorder`` format — reference requests captured with
``--record_dir``, or records produced by the reference's own policy server),
build a policy from a checkpoint and assert each replayed request reproduces
the recorded actions within tolerance.

Usage:
    python scripts/compare_served_outputs.py --config lap_libero \
        --checkpoint_dir /path/to/params_dir --records_dir /path/to/records \
        [--ar] [--atol 2e-2] [--allow_test_vocab] [--num_steps 10]

Exit code 0 = every record matched; 1 = any mismatch (reported per record).
"""

from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[1]))

import argparse
import pathlib

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--records_dir", required=True)
    parser.add_argument("--ar", action="store_true", help="AR language-action mode")
    parser.add_argument("--atol", type=float, default=2e-2)
    parser.add_argument("--num_steps", type=int, default=10)
    parser.add_argument("--max_decoding_steps", type=int, default=390)
    parser.add_argument("--allow_test_vocab", action="store_true")
    args = parser.parse_args()

    from lap_tpu.policies import policy_config
    from lap_tpu.policies.policy import unflatten_record
    from lap_tpu.training import config as _config

    train_config = _config.get_config(args.config)
    if args.ar:
        policy = policy_config.create_trained_policy_ar(
            train_config,
            args.checkpoint_dir,
            allow_test_vocab=args.allow_test_vocab,
            max_decoding_steps=args.max_decoding_steps,
        )
    else:
        policy = policy_config.create_trained_policy(
            train_config,
            args.checkpoint_dir,
            allow_test_vocab=args.allow_test_vocab,
            num_steps=args.num_steps,
        )

    records = sorted(pathlib.Path(args.records_dir).glob("step_*.npz"))
    if not records:
        print(f"no step_*.npz records under {args.records_dir}")
        return 1
    failures = 0
    for path in records:
        with np.load(path, allow_pickle=False) as data:
            flat = {k: data[k] for k in data.files}
        request = unflatten_record(flat, "obs")
        expected = flat.get("out/actions")
        if expected is None:
            print(f"{path.name}: record has no out/actions; skipping")
            continue
        # Scalars (prompt) come back as 0-d arrays; restore Python types.
        if "prompt" in request and getattr(request["prompt"], "ndim", 1) == 0:
            request["prompt"] = str(request["prompt"])
        result = policy.infer(request)
        got = np.asarray(result["actions"], dtype=np.float32)
        want = np.asarray(expected, dtype=np.float32)
        diff = float(np.max(np.abs(got - want))) if got.shape == want.shape else float("inf")
        ok = got.shape == want.shape and diff <= args.atol
        print(f"{path.name}: max|Δactions| = {diff:.3e} {'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures += 1
        if args.ar and "out/reasoning" in flat:
            want_r = str(flat["out/reasoning"])
            got_r = str(result.get("reasoning", ""))
            if want_r != got_r:
                print(f"{path.name}: reasoning mismatch\n  want: {want_r}\n  got:  {got_r}")
                failures += 1
    print(f"{len(records) - failures}/{len(records)} records matched (atol={args.atol})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
