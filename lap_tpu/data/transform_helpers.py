"""Gripper / movement helpers (numpy).

Parity with lihzha/lap ``datasets/utils/transform_helpers.py``.
"""

from __future__ import annotations

import numpy as np

from lap_tpu.data import rotation


def compute_padded_movement_actions(eef_state: np.ndarray) -> np.ndarray:
    """action[t] = state[t+1] - state[t] (rotations via euler_diff); last = 0."""
    eef_state = np.asarray(eef_state, dtype=np.float64)
    deltas = np.concatenate(
        [
            eef_state[1:, :3] - eef_state[:-1, :3],
            rotation.euler_diff(eef_state[1:, 3:6], eef_state[:-1, 3:6]),
        ],
        axis=-1,
    )
    return np.concatenate([deltas, np.zeros((1, deltas.shape[1]))], axis=0).astype(np.float32)


def invert_gripper_actions(actions: np.ndarray) -> np.ndarray:
    return 1.0 - np.asarray(actions, dtype=np.float32)


def binarize_gripper_actions(actions: np.ndarray, threshold: float = 0.95) -> np.ndarray:
    """Continuous -> binary, resolving in-between values to the NEXT
    definitive state (backward fill; octo convention)."""
    actions = np.asarray(actions, dtype=np.float32)
    open_mask = actions > threshold
    closed_mask = actions < (1 - threshold)
    in_between = ~(open_mask | closed_mask)
    is_open = open_mask.astype(np.float32)
    out = np.empty_like(is_open)
    # reference transform_helpers.py:133-161: the reverse scan starts from the
    # RAW last value, so a trailing in-between run passes it through unchanged
    carry = actions[-1]
    for i in range(len(actions) - 1, -1, -1):
        if not in_between[i]:
            carry = is_open[i]
        out[i] = carry
    return out


def rescale_action_with_bound(
    actions: np.ndarray,
    low: float,
    high: float,
    safety_margin: float = 0.0,
    post_scaling_max: float = 1.0,
    post_scaling_min: float = -1.0,
) -> np.ndarray:
    """Affine rescale [low, high] -> [post_min, post_max], clipped with a
    safety margin (reference transform_helpers.py:328-356)."""
    actions = np.asarray(actions, dtype=np.float32)
    out = (actions - low) / (high - low) * (post_scaling_max - post_scaling_min) + post_scaling_min
    return np.clip(out, post_scaling_min + safety_margin, post_scaling_max - safety_margin)


def rel2abs_gripper_actions(actions: np.ndarray) -> np.ndarray:
    """Relative (+1 close, -1 open) -> absolute (0 closed, 1 open)."""
    actions = np.asarray(actions, dtype=np.float32)
    thresholded = np.where(actions < -0.1, 1, np.where(actions > 0.1, -1, 0)).astype(np.int64)
    nonzero = np.nonzero(thresholded)[0]
    start = -thresholded[nonzero[0]] if len(nonzero) else 1
    if start == 0:
        start = 1
    out = np.empty(len(actions), dtype=np.float32)
    carry = start
    for i in range(len(actions)):
        if thresholded[i] != 0:
            carry = thresholded[i]
        out[i] = carry
    return out / 2.0 + 0.5
