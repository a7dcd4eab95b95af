"""Real-robot evaluation runner (DROID rig).

Capability parity with lihzha/lap ``scripts/real_robot/shared.py``: 15 Hz
control loop over a DROID RobotEnv, observation extraction (BGR->RGB, wrist
180-degree rotation, rot6d state), 8-step open-loop chunks post-processed to
absolute targets with SLERP, interactive rollout loop, video + h5 logging.

Robot-hardware imports (droid) are deferred so the request-building path is
importable and testable anywhere.
"""

from __future__ import annotations

# Allow `python scripts/...` straight from a checkout: put the repo root on
# sys.path without requiring an installed package.
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))


import dataclasses
import logging
import time
from pathlib import Path

import numpy as np

from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy
from lap_tpu.utils.image import convert_to_uint8, resize_with_pad_np

from .helpers import (
    ActionChunkPostProcessor,
    binarize_gripper_actions_np,
    deferred_keyboard_interrupt,
    euler_to_rot6d,
    interpolate_rpy,
)

logger = logging.getLogger(__name__)

CONTROL_HZ = 15.0
OPEN_LOOP_HORIZON = 8


@dataclasses.dataclass
class RunnerConfig:
    host: str = "localhost"
    port: int = 8000
    resize_size: int = 224
    camera_keys: tuple[str, ...] = ("exterior_image_1_left", "wrist_image_left")
    rotate_wrist_180: bool = True
    # Gripper OBSERVATION convention per rig (reference droid_main.py:23-24 /
    # franka_main.py:24-25, :46-48): "invert_binarize" (DROID: 1=closed raw),
    # "binarize" (Franka: 1=open raw), "binarize_invert" (Franka upstream:
    # 1 - binarize), or "identity".
    gripper_obs_mode: str = "identity"
    # rot6d orientation in the state vector (reference shared.py:128-134);
    # upstream Franka serves plain pos3+rpy3 (franka_main.py:43-44).
    use_rot6d_state: bool = True
    # Emit pos3+quat4+grip targets instead of pos3+rpy3+grip
    # (reference franka_main.py use_quaternion_actions).
    use_quaternions: bool = False
    frame_description: str = "end-effector frame"
    # Upstream (openpi-style) serving: execute the server's raw ``actions``
    # chunk open-loop instead of parsing language actions + SLERP targets
    # (reference shared.py:423-430 run_upstream, droid_main.py:27-35).
    upstream: bool = False
    open_loop_horizon: int = OPEN_LOOP_HORIZON
    video_dir: str = "data/real_robot/videos"
    log_dir: str = "data/real_robot/logs"
    max_steps: int = 600


class BaseEvalRunner:
    """Interactive rollout loop against a policy server."""

    def __init__(self, config: RunnerConfig, env):
        self.config = config
        self.env = env
        self.client = WebsocketClientPolicy(config.host, config.port)
        self.post = ActionChunkPostProcessor(
            chunk_steps=OPEN_LOOP_HORIZON, use_quaternions=config.use_quaternions
        )
        Path(config.video_dir).mkdir(parents=True, exist_ok=True)
        Path(config.log_dir).mkdir(parents=True, exist_ok=True)

    # -- observation extraction ------------------------------------------
    def extract_images(self, obs: dict) -> tuple[np.ndarray, np.ndarray]:
        base_key, wrist_key = self.config.camera_keys
        base = np.asarray(obs["image"][base_key])[..., ::-1]  # BGR -> RGB
        wrist = np.asarray(obs["image"][wrist_key])[..., ::-1]
        if self.config.rotate_wrist_180:
            wrist = wrist[::-1, ::-1]
        size = self.config.resize_size
        base = convert_to_uint8(resize_with_pad_np(base, size, size))
        wrist = convert_to_uint8(resize_with_pad_np(wrist, size, size))
        return base, wrist

    def process_gripper_observation(self, gripper_position: np.ndarray) -> np.ndarray:
        """Robot gripper reading -> policy convention (1 = open). DROID rigs
        report 1 = closed, so invert-then-binarize (reference
        droid_main.py:23-24); identity for robots already in policy
        convention (reference shared.py:136-137)."""
        g = np.asarray(gripper_position, dtype=np.float64)
        if self.config.gripper_obs_mode == "invert_binarize":
            return binarize_gripper_actions_np(1.0 - g, threshold=0.5)
        if self.config.gripper_obs_mode == "binarize":
            return binarize_gripper_actions_np(g)
        if self.config.gripper_obs_mode == "binarize_invert":
            return 1.0 - binarize_gripper_actions_np(g)
        return g

    def extract_state(self, obs: dict) -> np.ndarray:
        pos = np.asarray(obs["robot_state"]["cartesian_position"][:3], dtype=np.float64)
        rpy = np.asarray(obs["robot_state"]["cartesian_position"][3:6], dtype=np.float64)
        gripper = np.clip(float(obs["robot_state"]["gripper_position"]), 0, 1)
        gripper = self.process_gripper_observation(np.array([gripper]))
        orient = euler_to_rot6d(rpy) if self.config.use_rot6d_state else rpy
        return np.concatenate([pos, orient, gripper]).astype(np.float32)

    def build_request(self, obs: dict, prompt: str) -> dict:
        base, wrist = self.extract_images(obs)
        return {
            "observation": {
                "base_0_rgb": base,
                "left_wrist_0_rgb": wrist,
                "state": self.extract_state(obs),
            },
            "prompt": prompt,
            "frame_description": self.config.frame_description,
        }

    def _gripper_postprocess(self, action: np.ndarray) -> np.ndarray:
        """Policy gripper output (1 = open) -> robot command. Reference
        shared.py:183-184: plain inversion of the action's last column (the
        robot's position interface takes 1 = closed)."""
        action = np.asarray(action, dtype=float)
        grip = 1.0 - np.atleast_1d(action[..., -1])
        return grip if action.ndim > 1 else grip[:1]

    # -- rollout ----------------------------------------------------------
    def rollout_once(self, prompt: str) -> list[np.ndarray]:
        frames = []
        obs = self.env.get_observation()
        step = 0
        period = 1.0 / CONTROL_HZ
        while step < self.config.max_steps:
            request = self.build_request(obs, prompt)
            response = self.client.infer(request)
            if self.config.upstream:
                # Raw chunk, per-step gripper binarization (reference
                # shared.py:72-78, :423-430): no SLERP, no frame conversion.
                targets = np.asarray(response["actions"], dtype=float)
                targets = targets[: self.config.open_loop_horizon].copy()
                targets[:, -1] = (targets[:, -1] > 0.5).astype(float)
            else:
                current = obs["robot_state"]["cartesian_position"]
                targets = self.post.process_response(
                    response,
                    curr_pos=np.asarray(current[:3], dtype=float),
                    curr_rpy=np.asarray(current[3:6], dtype=float),
                    gripper_postprocess_fn=self._gripper_postprocess,
                    orientation_interpolator_fn=interpolate_rpy,
                )
                targets = targets[:OPEN_LOOP_HORIZON]
            step_fn = self.env.step_raw if self.config.upstream else self.env.step_absolute
            for target in targets:
                t0 = time.monotonic()
                with deferred_keyboard_interrupt():
                    obs = step_fn(target)
                frames.append(request["observation"]["base_0_rgb"])
                step += 1
                elapsed = time.monotonic() - t0
                if elapsed < period:
                    time.sleep(period - elapsed)
        return frames

    def run_interactive(self):
        while True:
            prompt = input("task prompt (empty to quit): ").strip()
            if not prompt:
                return
            try:
                frames = self.rollout_once(prompt)
                self._save_video(frames, prompt)
            except KeyboardInterrupt:
                logger.info("rollout interrupted")

    def _save_video(self, frames: list[np.ndarray], prompt: str):
        if not frames:
            return
        import cv2

        path = Path(self.config.video_dir) / f"{int(time.time())}_{prompt[:32].replace(' ', '_')}.mp4"
        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), CONTROL_HZ, (w, h)
        )
        for f in frames:
            writer.write(np.asarray(f)[..., ::-1])
        writer.release()
        logger.info("saved video to %s", path)
