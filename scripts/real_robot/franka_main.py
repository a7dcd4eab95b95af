"""Franka (non-DROID rig) runner (parity: lihzha/lap franka_main.py).

Differs from the DROID runner in camera keys and gripper convention
(quaternion action space on some controllers)."""

from __future__ import annotations

import argparse
import logging

from .droid_main import DroidEnvAdapter
from .shared import BaseEvalRunner, RunnerConfig


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--camera", default="exterior_image_2_left")
    p.add_argument(
        "--run_upstream",
        action="store_true",
        help="execute raw upstream action chunks open-loop "
        "(reference franka_main.py:28-55: joint-velocity env, no wrist "
        "rotation, plain rpy state, 1-binarize gripper obs)",
    )
    p.add_argument("--open_loop_horizon", type=int, default=8)
    args = p.parse_args()
    config = RunnerConfig(
        host=args.host,
        port=args.port,
        camera_keys=(args.camera, "wrist_image_left"),
        # Franka raw gripper is already 1 = open: binarize without inversion;
        # the controller takes quaternion targets (reference franka_main.py).
        gripper_obs_mode="binarize_invert" if args.run_upstream else "binarize",
        use_quaternions=True,
        rotate_wrist_180=not args.run_upstream,
        use_rot6d_state=not args.run_upstream,
        upstream=args.run_upstream,
        open_loop_horizon=args.open_loop_horizon,
    )
    BaseEvalRunner(config, DroidEnvAdapter(upstream=args.run_upstream)).run_interactive()


if __name__ == "__main__":
    main()
