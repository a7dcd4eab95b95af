"""DROID (Franka) runner (parity: lihzha/lap scripts/real_robot/droid_main.py)."""

from __future__ import annotations

import argparse
import logging

from .shared import BaseEvalRunner, RunnerConfig


class DroidEnvAdapter:
    """Wraps droid.robot_env.RobotEnv with the interface BaseEvalRunner uses.

    ``upstream=True`` opens the env in the reference's upstream-policy
    action space (joint velocity, reference droid_main.py:31-35) and
    forwards raw action vectors via :meth:`step_raw`.
    """

    def __init__(self, upstream: bool = False):
        from droid.robot_env import RobotEnv  # hardware-only dependency

        action_space = "joint_velocity" if upstream else "cartesian_position"
        self._env = RobotEnv(action_space=action_space, gripper_action_space="position")

    def get_observation(self):
        return self._env.get_observation()

    def step_absolute(self, target):
        self._env.step({"cartesian_position": target[:6], "gripper_position": target[6]})
        return self._env.get_observation()

    def step_raw(self, action):
        self._env.step(action)
        return self._env.get_observation()


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--frame_description", default="end-effector frame")
    p.add_argument(
        "--run_upstream",
        action="store_true",
        help="execute the server's raw action chunks open-loop "
        "(openpi-style upstream policy, reference droid_main.py:41-44)",
    )
    p.add_argument("--open_loop_horizon", type=int, default=8)
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
        upstream=args.run_upstream,
        open_loop_horizon=args.open_loop_horizon,
    )
    BaseEvalRunner(config, DroidEnvAdapter(upstream=args.run_upstream)).run_interactive()


if __name__ == "__main__":
    main()
