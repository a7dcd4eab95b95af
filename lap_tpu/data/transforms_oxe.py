"""Per-dataset RLDS standardization transforms (numpy).

Each transform converts one raw RLDS episode into the canonical trajectory
dict used by the pipeline:

    observation: {base_0_rgb: [bytes]*T, left_wrist_0_rgb: [bytes]*T,
                  state: [T, 7] (xyz, rpy, gripper)}
    raw_state:   [T, 7]
    action:      [T, 7] (chunker converts absolutes to deltas)
    language_action: [T, 7] per-step deltas + gripper
    language_instruction: [str]*T

Conventions are behavioral parity with lihzha/lap
``datasets/utils/transforms.py`` (gripper inversions/binarization per
dataset, coordinate fixes). This file carries the core OXE magic-soup
members + LIBERO + DROID; the long tail of the reference's 60+ transforms
follows the same recipe and is being filled in dataset-by-dataset.
"""

from __future__ import annotations

import numpy as np

from lap_tpu.data import rotation
from lap_tpu.data.registry import register_dataset
from lap_tpu.data.transform_helpers import (
    binarize_gripper_actions,
    compute_padded_movement_actions,
    invert_gripper_actions,
    rel2abs_gripper_actions,
)


def _steps(episode: dict) -> dict:
    return episode.get("steps", episode)


def _instructions(steps: dict, key: str = "language_instruction") -> list[str]:
    inst = steps.get(key)
    if inst is None:
        obs = steps.get("observation", {})
        inst = obs.get("natural_language_instruction", [""])
    if isinstance(inst, str):
        inst = [inst]
    return [i.decode() if isinstance(i, bytes) else str(i) for i in inst]


def _canonical(
    *,
    base_imgs,
    wrist_imgs,
    eef_state: np.ndarray,  # [T, 6] xyz+rpy
    gripper_state: np.ndarray,  # [T, 1] 0..1 (1 = open)
    action: np.ndarray,  # [T, 7]
    gripper_action: np.ndarray,  # [T, 1]
    instructions: list[str],
) -> dict:
    t = len(action)
    state = np.concatenate([eef_state, gripper_state], axis=-1).astype(np.float32)
    language_action = np.concatenate(
        [compute_padded_movement_actions(eef_state), np.clip(gripper_action, 0, 1)],
        axis=-1,
    ).astype(np.float32)
    if wrist_imgs is None:
        wrist_imgs = [b""] * t
    return {
        "observation": {
            "base_0_rgb": list(base_imgs),
            "left_wrist_0_rgb": list(wrist_imgs),
            "state": state,
        },
        "raw_state": state.copy(),
        "action": np.asarray(action, dtype=np.float32),
        "language_action": language_action,
        "language_instruction": instructions,
    }


# ---------------------------------------------------------------------------
# LIBERO (reference transforms.py:1453-1481)
# ---------------------------------------------------------------------------


@register_dataset("libero", exact=False, control_frequency=5.0)
def libero_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    action = np.asarray(steps["action"], dtype=np.float32)
    # Gripper action in -1(open)..1(close): clip to 0..1, invert -> 1 = open.
    grip = invert_gripper_actions(np.clip(action[:, -1:], 0, 1))
    state = np.asarray(obs["state"], dtype=np.float32)
    euler = rotation.axis_angle_to_euler(state[:, 3:6]).astype(np.float32)
    grip_state = np.clip(state[:, -2:-1] / 0.04, 0, 1)
    eef_state = np.concatenate([state[:, :3], euler], axis=-1)
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=obs.get("wrist_image"),
        eef_state=eef_state,
        gripper_state=grip_state,
        action=np.concatenate([action[:, :6], grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


# ---------------------------------------------------------------------------
# DROID (reference transforms.py:757-790)
# ---------------------------------------------------------------------------


@register_dataset("droid", exact=False, needs_wrist_rotation=True, control_frequency=15.0)
def droid_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    cartesian = np.asarray(obs["cartesian_position"], dtype=np.float32)
    grip_obs = np.asarray(obs["gripper_position"], dtype=np.float32)
    if grip_obs.ndim == 1:
        grip_obs = grip_obs[:, None]
    grip_state = binarize_gripper_actions(
        invert_gripper_actions(grip_obs[:, -1]), threshold=0.5
    )[:, None]
    grip_action_raw = np.asarray(steps["action_dict"]["gripper_position"], dtype=np.float32)
    if grip_action_raw.ndim == 1:
        grip_action_raw = grip_action_raw[:, None]
    grip_action = binarize_gripper_actions(
        invert_gripper_actions(grip_action_raw[:, -1]), threshold=0.5
    )[:, None]
    return _canonical(
        base_imgs=obs.get("exterior_image_1_left"),
        wrist_imgs=obs.get("wrist_image_left"),
        eef_state=cartesian[:, :6],
        gripper_state=grip_state,
        action=np.concatenate([cartesian[:, :6], np.clip(grip_action, 0, 1)], axis=-1),
        gripper_action=grip_action,
        instructions=_instructions(steps),
    )


# ---------------------------------------------------------------------------
# Bridge V2 (reference transforms.py:245-272)
# ---------------------------------------------------------------------------


@register_dataset("bridge", exact=False, control_frequency=5.0)
def bridge_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    # First timestep has an all-zero action: drop it.
    action = np.asarray(steps["action"], dtype=np.float32)[1:]
    state = np.asarray(obs["state"], dtype=np.float32)[1:]
    base = list(obs.get("image_0", obs.get("image", [])))[1:]
    instructions = _instructions(steps)[1:] or [""]
    grip = binarize_gripper_actions(action[:, -1])[:, None]
    eef = state[:, :6]
    return _canonical(
        base_imgs=base,
        wrist_imgs=None,
        eef_state=eef,
        gripper_state=np.clip(state[:, -1:], 0, 1),
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=instructions,
    )


# ---------------------------------------------------------------------------
# RT-1 / fractal (reference transforms.py:288-328)
# ---------------------------------------------------------------------------


@register_dataset("fractal", exact=False, control_frequency=3.0)
@register_dataset("rt_1", exact=False, control_frequency=3.0)
def rt1_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    grip_rel = np.asarray(act["gripper_closedness_action"], dtype=np.float32)
    if grip_rel.ndim == 2:
        grip_rel = grip_rel[:, 0]
    grip = rel2abs_gripper_actions(grip_rel)[:, None]
    pose = np.asarray(obs["base_pose_tool_reached"], dtype=np.float32)
    eef = np.concatenate(
        [pose[:, :3], rotation.quat_to_euler(pose[:, 3:7]).astype(np.float32)], axis=-1
    )
    grip_state = np.clip(
        invert_gripper_actions(np.asarray(obs["gripper_closed"], dtype=np.float32).reshape(-1, 1)),
        0,
        1,
    )
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=None,
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


# ---------------------------------------------------------------------------
# Generic fallback: canonical-format datasets pass through.
# ---------------------------------------------------------------------------


@register_dataset(".*", exact=False, priority=-100)
def generic_dataset_transform(episode: dict) -> dict:
    """Datasets already shaped like the canonical schema (e.g. our test
    fixtures): observation.state [T, 7] xyz+rpy+gripper, action [T, 7]."""
    steps = _steps(episode)
    obs = steps["observation"]
    state = np.asarray(obs["state"], dtype=np.float32)
    action = np.asarray(steps["action"], dtype=np.float32)
    grip = np.clip(action[:, -1:], 0, 1)
    return _canonical(
        base_imgs=obs.get("image", obs.get("base_0_rgb")),
        wrist_imgs=obs.get("wrist_image", obs.get("left_wrist_0_rgb")),
        eef_state=state[:, :6],
        gripper_state=np.clip(state[:, -1:], 0, 1),
        action=action[:, :7],
        gripper_action=grip,
        instructions=_instructions(steps),
    )
