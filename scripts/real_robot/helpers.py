"""Real-robot client helpers.

Parity with lihzha/lap ``scripts/real_robot/helpers.py`` (verified against
reference-generated goldens in tests/golden/ref_parity/clients.npz):
euler->rot6d, backward-propagating gripper binarization, quaternion-SLERP
rotation interpolation, deferred Ctrl-C, Euler-delta composition, and the
ActionChunkPostProcessor that turns policy responses into executable
controller chunks. Key reference semantics preserved exactly:

- interpolate_rpy(curr, delta, steps) SLERPs from curr to curr+delta over
  ``steps`` points INCLUDING the start (helpers.py:43-88).
- A 1-D response action expands into a chunk of ``chunk_steps`` linspace
  positions + SLERP orientations + constant gripper.
- A 2-D chunk adds curr_pos to EVERY row's translation (open-loop deltas
  are all relative to the observed pose — NOT cumulatively integrated) and
  composes each row's Euler delta with the current rotation.
"""

from __future__ import annotations

import contextlib
import dataclasses
import signal

import numpy as np
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp


def euler_to_rot6d(euler: np.ndarray) -> np.ndarray:
    rot = R.from_euler("xyz", np.asarray(euler, dtype=np.float64)).as_matrix()
    return np.concatenate([rot[:, 0], rot[:, 1]], axis=0)


def binarize_gripper_actions_np(actions: np.ndarray, threshold: float = 0.95) -> np.ndarray:
    """Binary open/close with backward propagation through the in-between
    band (reference helpers.py:16-37)."""
    actions = np.asarray(actions, dtype=np.float32)
    n = actions.shape[0]
    new_actions = np.zeros_like(actions)
    open_mask = actions > threshold
    closed_mask = actions < (1 - threshold)
    in_between = ~(open_mask | closed_mask)
    carry = bool(actions[-1] > threshold)
    for i in reversed(range(n)):
        if not in_between[i]:
            carry = bool(open_mask[i])
        new_actions[i] = float(carry)
    return new_actions


def invert_gripper_actions_np(actions: np.ndarray) -> np.ndarray:
    return 1.0 - np.asarray(actions)


def interpolate_rpy(curr, delta, steps):
    """SLERP from ``curr`` to ``curr + delta`` over ``steps`` waypoints,
    endpoint-inclusive on BOTH sides (first row equals curr)."""
    curr = np.asarray(curr, dtype=float)
    delta = np.asarray(delta, dtype=float)
    if delta.ndim == 1:
        target_rpy = curr + delta
    else:
        target_rpy = curr + delta[0] if len(delta) > 0 else curr
    rot_curr = R.from_euler("xyz", curr, degrees=False)
    rot_target = R.from_euler("xyz", target_rpy, degrees=False)
    slerp = Slerp(np.array([0, 1]), R.concatenate([rot_curr, rot_target]))
    return slerp(np.linspace(0, 1, steps, endpoint=True)).as_euler("xyz", degrees=False)


def add_euler(curr: np.ndarray, delta: np.ndarray, seq: str = "xyz") -> np.ndarray:
    """Compose Euler-angle deltas with a current rotation (ref :187-203)."""
    curr = np.asarray(curr, dtype=float)
    delta = np.asarray(delta, dtype=float)
    r_curr = R.from_euler(seq, curr)
    r_delta = R.from_euler(seq, delta)
    return (r_curr * r_delta).as_euler(seq)


@contextlib.contextmanager
def deferred_keyboard_interrupt():
    """Queue Ctrl-C during a critical section; re-raise after (the
    reference's prevent_keyboard_interrupt)."""
    interrupted = []

    def handler(signum, frame):
        interrupted.append((signum, frame))

    previous = signal.signal(signal.SIGINT, handler)
    try:
        yield
    finally:
        signal.signal(signal.SIGINT, previous)
        if interrupted:
            raise KeyboardInterrupt


prevent_keyboard_interrupt = deferred_keyboard_interrupt  # reference name


@dataclasses.dataclass
class ActionChunkPostProcessor:
    """Convert policy responses into executable robot action chunks
    (reference helpers.py:114-185)."""

    chunk_steps: int = 8
    use_quaternions: bool = False

    def process_response(
        self,
        response: dict,
        *,
        curr_pos: np.ndarray,
        curr_rpy: np.ndarray,
        gripper_postprocess_fn,
        orientation_interpolator_fn,
    ) -> np.ndarray:
        actions = np.asarray(response["actions"], dtype=float)
        if actions.ndim == 1:
            return self._single_action_to_chunk(
                actions,
                curr_pos=curr_pos,
                curr_rpy=curr_rpy,
                gripper_postprocess_fn=gripper_postprocess_fn,
                orientation_interpolator_fn=orientation_interpolator_fn,
            )
        return self._chunk_actions(
            actions,
            curr_pos=curr_pos,
            curr_rpy=curr_rpy,
            gripper_postprocess_fn=gripper_postprocess_fn,
        )

    def _single_action_to_chunk(
        self,
        action: np.ndarray,
        *,
        curr_pos: np.ndarray,
        curr_rpy: np.ndarray,
        gripper_postprocess_fn,
        orientation_interpolator_fn,
    ) -> np.ndarray:
        grip_action = float(np.asarray(gripper_postprocess_fn(action)).reshape(-1)[0])
        positions = np.linspace(curr_pos, curr_pos + action[:3], self.chunk_steps, endpoint=True)
        rpy_arr = orientation_interpolator_fn(curr=curr_rpy, delta=action[3:6], steps=self.chunk_steps)
        grip_vals = np.full((self.chunk_steps, 1), grip_action)
        if self.use_quaternions:
            quat_arr = R.from_euler("xyz", rpy_arr, degrees=False).as_quat()
            return np.concatenate([positions, quat_arr, grip_vals], axis=1)
        return np.concatenate([positions, rpy_arr, grip_vals], axis=1)

    def _chunk_actions(
        self,
        pred_action_chunk: np.ndarray,
        *,
        curr_pos: np.ndarray,
        curr_rpy: np.ndarray,
        gripper_postprocess_fn,
    ) -> np.ndarray:
        pred_action_chunk = pred_action_chunk.copy()
        if pred_action_chunk.shape[-1] > 7:
            return pred_action_chunk
        # Every row is a delta from the OBSERVED pose (open-loop chunk);
        # translations broadcast-add curr_pos, rotations compose with curr.
        pred_action_chunk[:, :3] += curr_pos
        pred_action_chunk[:, 3:6] = add_euler(curr=curr_rpy, delta=pred_action_chunk[:, 3:6])
        pred_action_chunk[:, -1] = gripper_postprocess_fn(pred_action_chunk)
        if not self.use_quaternions:
            return pred_action_chunk
        quat_arr = R.from_euler("xyz", pred_action_chunk[:, 3:6], degrees=False).as_quat()
        return np.concatenate([pred_action_chunk[:, :3], quat_arr, pred_action_chunk[:, 6:7]], axis=1)
