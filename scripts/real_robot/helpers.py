"""Real-robot client helpers.

Capability parity with lihzha/lap ``scripts/real_robot/helpers.py``:
euler->rot6d, gripper binarize/invert (numpy), SLERP rotation interpolation,
deferred Ctrl-C, and the ActionChunkPostProcessor that integrates delta
chunks into absolute position/rotation targets.
"""

from __future__ import annotations

import contextlib
import signal

import numpy as np
from scipy.spatial.transform import Rotation as R
from scipy.spatial.transform import Slerp


def euler_to_rot6d(euler: np.ndarray) -> np.ndarray:
    rot = R.from_euler("xyz", np.asarray(euler, dtype=np.float64)).as_matrix()
    return np.concatenate([rot[:, 0], rot[:, 1]], axis=0)


def binarize_gripper(value: float, threshold: float = 0.5) -> float:
    return 1.0 if value >= threshold else 0.0


def invert_gripper(value: float) -> float:
    return 1.0 - value


def interpolate_rpy(rpy_start: np.ndarray, rpy_end: np.ndarray, num_steps: int) -> np.ndarray:
    """SLERP between two extrinsic-XYZ orientations, returning num_steps
    waypoints (excluding the start, including the end)."""
    rots = R.from_euler("xyz", np.stack([rpy_start, rpy_end]))
    slerp = Slerp([0.0, 1.0], rots)
    times = np.linspace(0.0, 1.0, num_steps + 1)[1:]
    return slerp(times).as_euler("xyz")


@contextlib.contextmanager
def deferred_keyboard_interrupt():
    """Queue Ctrl-C during a critical section; re-raise after."""
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


class ActionChunkPostProcessor:
    """Convert a delta action chunk into absolute controller targets.

    Positions integrate cumulatively from the current EEF position; rotations
    SLERP from the current orientation through the composed deltas; the
    gripper is binarized (reference helpers.py:113-202).
    """

    def __init__(self, *, open_loop_horizon: int = 8, gripper_invert: bool = False):
        self.open_loop_horizon = open_loop_horizon
        self.gripper_invert = gripper_invert

    def __call__(self, chunk: np.ndarray, current_pos: np.ndarray, current_rpy: np.ndarray) -> np.ndarray:
        chunk = np.asarray(chunk, dtype=np.float64)[: self.open_loop_horizon]
        n = len(chunk)
        abs_pos = current_pos[None] + np.cumsum(chunk[:, :3], axis=0)
        # Compose rotation deltas then SLERP through the final orientation.
        r_total = R.from_euler("xyz", current_rpy)
        for rpy in chunk[:, 3:6]:
            r_total = r_total * R.from_euler("xyz", rpy)
        final_rpy = r_total.as_euler("xyz")
        abs_rpy = interpolate_rpy(current_rpy, final_rpy, n)
        grip = chunk[:, 6:7]
        if self.gripper_invert:
            grip = 1.0 - grip
        grip = (grip >= 0.5).astype(np.float64)
        return np.concatenate([abs_pos, abs_rpy, grip], axis=1)
