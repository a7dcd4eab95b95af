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


# ---------------------------------------------------------------------------
# OXE magic-soup members (conventions per reference transforms.py)
# ---------------------------------------------------------------------------


def _get_imgs(obs: dict, primary: str, wrist: str | None = None):
    return obs.get(primary), (obs.get(wrist) if wrist else None)


def _canonical_delta(*, base_imgs, wrist_imgs, action, instructions, t=None) -> dict:
    """Datasets whose actions stay per-step deltas and that carry no
    language-action supervision (e.g. cable routing, roboturk, toto)."""
    t = t if t is not None else len(action)
    state = np.zeros((t, 7), np.float32)
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
        "language_instruction": instructions,
    }


@register_dataset("kuka", control_frequency=10.0)
def kuka_dataset_transform(episode: dict) -> dict:
    import zlib

    steps = _steps(episode)
    obs = steps["observation"]
    # State is ZLIB-compressed float32 [x y z qx qy qz qw].
    raw = obs["clip_function_input/base_pose_tool_reached"]
    pose = np.stack(
        [np.frombuffer(zlib.decompress(r), np.float32).reshape(7) for r in raw]
    )
    grip_raw = obs["gripper_closed"]
    grip_closed = np.stack(
        [np.frombuffer(zlib.decompress(r), np.float32).reshape(()) for r in grip_raw]
    )
    grip_state = np.clip(invert_gripper_actions(grip_closed)[:, None], 0, 1)
    eef = np.concatenate(
        [pose[:, :3], rotation.quat_to_euler(pose[:, 3:7]).astype(np.float32)], axis=-1
    )
    act = steps["action"]
    grip_action = rel2abs_gripper_actions(
        np.asarray(act["gripper_closedness_action"], np.float32).reshape(-1)
    )[:, None]
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=None,
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip_action], axis=-1),
        gripper_action=grip_action,
        instructions=_instructions(steps),
    )


@register_dataset("taco_play", control_frequency=15.0)
def taco_play_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    robot_obs = np.asarray(obs["robot_obs"], np.float32)
    eef = robot_obs[:, :6]
    grip_state = np.clip(12.3903 * robot_obs[:, 6:7], 0, 1)
    rel = np.asarray(steps["action"]["rel_actions_world"], np.float32)
    grip_action = np.clip((rel[:, -1:] + 1) / 2, 0, 1)
    return _canonical(
        base_imgs=obs.get("rgb_static"),
        wrist_imgs=obs.get("rgb_gripper"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip_action], axis=-1),
        gripper_action=grip_action,
        instructions=_instructions(steps),
    )


@register_dataset("jaco_play", control_frequency=10.0)
def jaco_play_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    grip = rel2abs_gripper_actions(
        np.asarray(act["gripper_closedness_action"], np.float32).reshape(-1, 1)[:, 0]
    )[:, None]
    cart = np.asarray(obs["end_effector_cartesian_pos"], np.float32)
    eef = rotation.coordinate_transform_jaco(cart[:, :6]).astype(np.float32)
    grip_state = np.clip(cart[:, -1:] * 4.33, 0, 1)
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=obs.get("image_wrist"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("berkeley_cable_routing", control_frequency=10.0)
def berkeley_cable_routing_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    action = np.concatenate(
        [
            np.asarray(act["world_vector"], np.float32),
            np.asarray(act["rotation_delta"], np.float32),
            np.zeros((len(act["world_vector"]), 1), np.float32),
        ],
        axis=-1,
    )
    return _canonical_delta(
        base_imgs=obs.get("image"), wrist_imgs=obs.get("wrist45_image"),
        action=action, instructions=_instructions(steps),
    )


@register_dataset("roboturk", control_frequency=10.0)
def roboturk_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    grip = invert_gripper_actions(
        np.clip(np.asarray(act["gripper_closedness_action"], np.float32).reshape(-1, 1), 0, 1)
    )
    action = np.concatenate(
        [np.asarray(act["world_vector"], np.float32),
         np.asarray(act["rotation_delta"], np.float32), grip],
        axis=-1,
    )
    return _canonical_delta(
        base_imgs=obs.get("front_rgb"), wrist_imgs=None,
        action=action, instructions=_instructions(steps),
    )


@register_dataset("viola", control_frequency=20.0)
def viola_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    grip = invert_gripper_actions(
        np.clip(np.asarray(act["gripper_closedness_action"], np.float32).reshape(-1, 1), 0, 1)
    )
    # ee_states: column-major flattened 4x4 -> transpose to row-major.
    mats = np.asarray(obs["ee_states"], np.float32)[:, -16:].reshape(-1, 4, 4)
    mats = np.swapaxes(mats, -1, -2)
    eef = rotation.matrix_state_to_xyzrpy(mats).astype(np.float32)
    grip_state = np.clip(np.asarray(obs["gripper_states"], np.float32).reshape(-1, 1) / 0.079, 0, 1)
    return _canonical(
        base_imgs=obs.get("agentview_rgb"),
        wrist_imgs=obs.get("eye_in_hand_rgb"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("berkeley_autolab_ur5", control_frequency=5.0)
def berkeley_autolab_ur5_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    robot_state = np.asarray(obs["robot_state"], np.float32)[:, 6:14]
    eef = np.concatenate(
        [robot_state[:, :3], rotation.quat_to_euler(robot_state[:, 3:7]).astype(np.float32)],
        axis=-1,
    )
    grip_state = np.clip(invert_gripper_actions(robot_state[:, -1:]), 0, 1)
    grip = rel2abs_gripper_actions(
        np.asarray(act["gripper_closedness_action"], np.float32).reshape(-1)
    )[:, None]
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=obs.get("hand_image"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("toto", control_frequency=30.0)
def toto_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    action = np.concatenate(
        [np.asarray(act["world_vector"], np.float32),
         np.asarray(act["rotation_delta"], np.float32),
         np.asarray(act["open_gripper"], np.float32).reshape(-1, 1)],
        axis=-1,
    )
    return _canonical_delta(
        base_imgs=obs.get("image"), wrist_imgs=None,
        action=action, instructions=_instructions(steps),
    )


@register_dataset("language_table", control_frequency=10.0)
def language_table_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act2d = np.asarray(steps["action"], np.float32)
    t = len(act2d)
    action = np.concatenate(
        [act2d, np.zeros((t, 4), np.float32), np.ones((t, 1), np.float32)], axis=-1
    )[:, :7]
    # Instructions stored as padded unicode codepoints.
    raw = obs.get("instruction")
    instructions = []
    for row in (raw if raw is not None else []):
        arr = np.asarray(row).astype(np.int64)
        chars = [chr(c) for c in arr if c > 0]
        instructions.append("".join(chars))
    return _canonical_delta(
        base_imgs=obs.get("rgb"), wrist_imgs=None,
        action=action, instructions=instructions or [""] * t, t=t,
    )


@register_dataset("stanford_hydra", exact=False, control_frequency=10.0)
def stanford_hydra_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    action = np.asarray(steps["action"], np.float32)
    action = np.concatenate(
        [action[:, :6], invert_gripper_actions(action[:, -1:])], axis=-1
    )
    state = np.asarray(obs["state"], np.float32)
    eef = np.concatenate([state[:, :3], state[:, 7:10]], axis=-1)
    grip_state = np.clip(invert_gripper_actions(state[:, -3:-2]), 0, 1)
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=obs.get("wrist_image"),
        eef_state=eef,
        gripper_state=grip_state,
        action=action,
        gripper_action=action[:, -1:],
        instructions=_instructions(steps),
    )


def _matrix_state_transform(episode: dict, *, gripper_scale: float = 0.079) -> dict:
    """Austin-style datasets: state carries a flattened 4x4 EEF matrix in the
    last 16 dims and gripper joint at index 7."""
    steps = _steps(episode)
    obs = steps["observation"]
    state = np.asarray(obs["state"], np.float32)
    mats = state[:, -16:].reshape(-1, 4, 4)
    eef = rotation.matrix_state_to_xyzrpy(mats).astype(np.float32)
    grip_state = np.clip(state[:, 7:8] / gripper_scale, 0, 1)
    action = np.asarray(steps["action"], np.float32)
    grip = invert_gripper_actions(np.clip(action[:, -1:], 0, 1))
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=obs.get("wrist_image"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("austin_buds", exact=False, control_frequency=20.0)
@register_dataset("austin_sailor", exact=False, control_frequency=20.0)
@register_dataset("austin_sirius", exact=False, control_frequency=20.0)
@register_dataset("utaustin_mutex", exact=False, control_frequency=20.0)
def austin_dataset_transform(episode: dict) -> dict:
    return _matrix_state_transform(episode)


@register_dataset("furniture_bench", exact=False, control_frequency=10.0)
def furniture_bench_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    state = np.asarray(obs["state"], np.float32)
    eef = np.concatenate(
        [state[:, :3], rotation.quat_to_euler(state[:, 3:7]).astype(np.float32)], axis=-1
    )
    grip_state = np.clip(state[:, -1:] / 0.079, 0, 1)
    action = np.asarray(steps["action"], np.float32)
    grip = invert_gripper_actions(np.clip(action[:, -1:], 0, 1))
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=obs.get("wrist_image"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("bc_z", control_frequency=10.0)
def bc_z_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    act = steps["action"]
    grip = invert_gripper_actions(
        np.asarray(act["future/target_close"], np.float32).reshape(len(obs["present/xyz"]), -1)[:, :1]
    )
    present_euler = rotation.axis_angle_to_euler(
        np.asarray(obs["present/axis_angle"], np.float32)[:, :3]
    )
    eef = rotation.coordinate_transform_bcz(
        np.concatenate(
            [np.asarray(obs["present/xyz"], np.float32)[:, :3], present_euler], axis=-1
        )
    ).astype(np.float32)
    grip_state = np.clip(
        invert_gripper_actions(
            np.asarray(obs["present/sensed_close"], np.float32).reshape(-1, 1)
        ) / 0.8, 0, 1,
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


@register_dataset("dobbe", control_frequency=4.0)
def dobbe_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    state = np.asarray(obs["state"], np.float32)
    eef = rotation.coordinate_transform_dobbe(state[:, :6]).astype(np.float32)
    grip_state = np.clip(state[:, -1:], 0, 1)
    action = np.asarray(steps["action"], np.float32)
    grip = np.clip(action[:, -1:], 0, 1)
    return _canonical(
        base_imgs=obs.get("wrist_image", obs.get("image")),
        wrist_imgs=None,
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("cmu_stretch", control_frequency=10.0)
def cmu_stretch_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    state = np.asarray(obs["state"], np.float32)
    eef = state[:, :6]
    grip_state = np.clip(state[:, -1:], 0, 1)
    action = np.asarray(steps["action"], np.float32)
    grip = np.clip(action[:, -1:], 0, 1)
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=None,
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("fmb", control_frequency=10.0)
def fmb_dataset_transform(episode: dict) -> dict:
    steps = _steps(episode)
    obs = steps["observation"]
    eef_pose = np.asarray(obs["eef_pose"], np.float32)
    eef = np.concatenate(
        [eef_pose[:, :3], rotation.quat_to_euler(eef_pose[:, 3:7]).astype(np.float32)],
        axis=-1,
    )
    grip_state = np.clip(np.asarray(obs["state_gripper_pose"], np.float32).reshape(-1, 1), 0, 1)
    action = np.asarray(steps["action"], np.float32)
    grip = np.clip(action[:, -1:], 0, 1)
    return _canonical(
        base_imgs=obs.get("image_side_1"),
        wrist_imgs=obs.get("image_wrist_1"),
        eef_state=eef,
        gripper_state=grip_state,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )


@register_dataset("gnm", exact=False, control_frequency=4.0, is_navigation=True)
def gnm_dataset_transform(episode: dict) -> dict:
    """Navigation datasets: 2D position + yaw, no gripper."""
    steps = _steps(episode)
    obs = steps["observation"]
    pos = np.asarray(obs["position"], np.float32)
    yaw = np.asarray(obs["yaw"], np.float32).reshape(-1, 1)
    t = len(pos)
    eef = np.concatenate([pos[:, :2], np.zeros((t, 1), np.float32),
                          np.zeros((t, 2), np.float32), yaw], axis=-1)
    grip = np.ones((t, 1), np.float32)
    return _canonical(
        base_imgs=obs.get("image"),
        wrist_imgs=None,
        eef_state=eef,
        gripper_state=grip,
        action=np.concatenate([eef, grip], axis=-1),
        gripper_action=grip,
        instructions=_instructions(steps),
    )
