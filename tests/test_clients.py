import sys
from pathlib import Path

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

sys.path.insert(0, str(Path(__file__).parent.parent))

from scripts.libero.main import (
    MAX_STEPS_BY_SUITE,
    flow_chunk_to_actions,
    get_action_from_response,
    obs_to_request,
    quat2rot6d,
)
from scripts.real_robot.helpers import (
    ActionChunkPostProcessor,
    euler_to_rot6d,
    interpolate_rpy,
)


def test_max_steps_table():
    assert MAX_STEPS_BY_SUITE["libero_spatial"] == 220
    assert MAX_STEPS_BY_SUITE["libero_10"] == 520


def test_quat2rot6d():
    quat = R.from_euler("xyz", [0.1, -0.2, 0.3]).as_quat()
    r6 = quat2rot6d(quat)
    mat = R.from_quat(quat).as_matrix()
    np.testing.assert_allclose(r6[:3], mat[:, 0], atol=1e-12)
    np.testing.assert_allclose(r6[3:], mat[:, 1], atol=1e-12)


def test_obs_to_request():
    obs = {
        "robot0_eef_pos": np.array([0.4, 0.0, 0.2]),
        "robot0_eef_quat": R.from_euler("xyz", [0, 0, 0.5]).as_quat(),
        "robot0_gripper_qpos": np.array([0.02, -0.02]),
    }
    img = np.zeros((224, 224, 3), np.uint8)
    req = obs_to_request(obs, img, img, "pick up the cup")
    assert req["observation"]["state"].shape == (10,)
    assert req["prompt"] == "pick up the cup"
    assert req["frame_description"] == "robot base frame"


def test_ar_action_split():
    # 5 cm forward + 0.1 rad yaw over 5 steps; OSC scaling applied.
    resp = {"actions": np.array([0.05, 0, 0, 0, 0, 0.1, 0.0])}
    actions = get_action_from_response(5, resp)
    assert actions.shape == (5, 7)
    np.testing.assert_allclose(actions[:, 0], 0.05 / 0.05 / 5, atol=1e-9)
    np.testing.assert_allclose(actions[:, 5].sum(), 0.1 / 0.5, atol=1e-6)
    assert (actions[:, 6] == 0.0).all()


def test_flow_chunk_gripper_convention():
    resp = {"actions": np.tile(np.array([[0.1, 0, 0, 0, 0, 0, 1.0]]), (8, 1))}
    actions = flow_chunk_to_actions(resp, 5)
    assert actions.shape == (5, 7)
    assert (actions[:, -1] == -1.0).all()  # open (1) -> LIBERO -1


def test_action_chunk_post_processor():
    post = ActionChunkPostProcessor(open_loop_horizon=4)
    chunk = np.zeros((8, 7))
    chunk[:, 0] = 0.01  # 1 cm forward per step
    chunk[:, 5] = 0.05  # yaw per step
    chunk[:, 6] = 1.0
    current_pos = np.array([0.3, 0.0, 0.2])
    current_rpy = np.zeros(3)
    targets = post(chunk, current_pos, current_rpy)
    assert targets.shape == (4, 7)
    np.testing.assert_allclose(targets[-1, 0], 0.34, atol=1e-9)  # integrated
    np.testing.assert_allclose(targets[-1, 5], 0.2, atol=1e-6)  # composed yaw
    # SLERP is monotone between start and end.
    assert np.all(np.diff(targets[:, 5]) > 0)
    assert (targets[:, 6] == 1.0).all()


def test_interpolate_rpy():
    out = interpolate_rpy(np.zeros(3), np.array([0, 0, 1.0]), 4)
    assert out.shape == (4, 3)
    np.testing.assert_allclose(out[-1], [0, 0, 1.0], atol=1e-9)
    np.testing.assert_allclose(out[1][2] - out[0][2], 0.25, atol=1e-9)


def test_euler_to_rot6d_roundtrip():
    r6 = euler_to_rot6d(np.array([0.2, -0.1, 0.4]))
    assert r6.shape == (6,)
    np.testing.assert_allclose(np.linalg.norm(r6[:3]), 1.0, atol=1e-12)
