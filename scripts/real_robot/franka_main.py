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
    args = p.parse_args()
    config = RunnerConfig(
        host=args.host,
        port=args.port,
        camera_keys=(args.camera, "wrist_image_left"),
        # Franka raw gripper is already 1 = open: binarize without inversion;
        # the controller takes quaternion targets (reference franka_main.py).
        gripper_obs_mode="binarize",
        use_quaternions=True,
        rotate_wrist_180=True,
    )
    BaseEvalRunner(config, DroidEnvAdapter()).run_interactive()


if __name__ == "__main__":
    main()
