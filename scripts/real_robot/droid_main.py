"""DROID (Franka) runner (parity: lihzha/lap scripts/real_robot/droid_main.py)."""

from __future__ import annotations

import argparse
import logging

from .shared import BaseEvalRunner, RunnerConfig


class DroidEnvAdapter:
    """Wraps droid.robot_env.RobotEnv with the interface BaseEvalRunner uses."""

    def __init__(self):
        from droid.robot_env import RobotEnv  # hardware-only dependency

        self._env = RobotEnv(action_space="cartesian_position", gripper_action_space="position")

    def get_observation(self):
        return self._env.get_observation()

    def step_absolute(self, target):
        self._env.step({"cartesian_position": target[:6], "gripper_position": target[6]})
        return self._env.get_observation()


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--frame_description", default="end-effector frame")
    args = p.parse_args()
    config = RunnerConfig(
        host=args.host,
        port=args.port,
        camera_keys=("exterior_image_1_left", "wrist_image_left"),
        rotate_wrist_180=True,
        # DROID reports 1 = closed; observations must invert to the policy's
        # 1 = open convention (reference droid_main.py:23-24).
        gripper_obs_mode="invert_binarize",
        frame_description=args.frame_description,
    )
    BaseEvalRunner(config, DroidEnvAdapter()).run_interactive()


if __name__ == "__main__":
    main()
