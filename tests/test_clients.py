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


def _clients_gold():
    import pathlib as _pl

    return np.load(_pl.Path(__file__).parent / "golden" / "ref_parity" / "clients.npz")


def test_action_chunk_post_processor_matches_reference():
    """Reference-generated goldens (gen_fixtures.gen_clients_suite): single
    actions expand to linspace+SLERP chunks; 2-D chunks broadcast-add the
    observed pose (NOT cumulative integration) and compose per-row Euler
    deltas; quaternion variant included."""
    gold = _clients_gold()
    post = ActionChunkPostProcessor(chunk_steps=8, use_quaternions=False)
    post_q = ActionChunkPostProcessor(chunk_steps=8, use_quaternions=True)
    curr_pos, curr_rpy = gold["rr_curr_pos"], gold["rr_interp_curr"]
    grip_fn = lambda a: 1 - np.asarray(a, dtype=float)[..., -1]  # noqa: E731
    for proc, single_key, chunk_key in (
        (post, "rr_single", "rr_chunk"),
        (post_q, "rr_single_quat", "rr_chunk_quat"),
    ):
        got = proc.process_response(
            {"actions": gold["rr_single_in"]}, curr_pos=curr_pos, curr_rpy=curr_rpy,
            gripper_postprocess_fn=grip_fn, orientation_interpolator_fn=interpolate_rpy,
        )
        np.testing.assert_allclose(got, gold[single_key], rtol=1e-9, atol=1e-12)
        got = proc.process_response(
            {"actions": gold["rr_chunk_in"].copy()}, curr_pos=curr_pos, curr_rpy=curr_rpy,
            gripper_postprocess_fn=grip_fn, orientation_interpolator_fn=interpolate_rpy,
        )
        np.testing.assert_allclose(got, gold[chunk_key], rtol=1e-9, atol=1e-12)


def test_gripper_binarization_matches_reference():
    from scripts.real_robot.helpers import binarize_gripper_actions_np

    gold = _clients_gold()
    for name in ("mixed", "all_between", "closing_tail"):
        got = binarize_gripper_actions_np(gold[f"rr_grip_in|{name}"].copy())
        np.testing.assert_array_equal(got, gold[f"rr_grip|{name}"])


def test_interpolate_rpy_matches_reference():
    gold = _clients_gold()
    got = interpolate_rpy(gold["rr_interp_curr"], gold["rr_interp_delta"], 8)
    np.testing.assert_allclose(got, gold["rr_interp"], rtol=1e-9, atol=1e-12)
    # endpoint-inclusive on both sides
    np.testing.assert_allclose(got[0], gold["rr_interp_curr"], atol=1e-12)


def test_add_euler_matches_reference():
    from scripts.real_robot.helpers import add_euler

    gold = _clients_gold()
    got = add_euler(gold["rr_interp_curr"], gold["rr_add_euler_in"])
    np.testing.assert_allclose(got, gold["rr_add_euler"], rtol=1e-9, atol=1e-12)


def test_euler_to_rot6d_roundtrip():
    r6 = euler_to_rot6d(np.array([0.2, -0.1, 0.4]))
    assert r6.shape == (6,)
    np.testing.assert_allclose(np.linalg.norm(r6[:3]), 1.0, atol=1e-12)


def test_libero_conversions_match_reference():
    """AST-extracted reference fns (scripts/libero/main.py): quat->rot6d,
    AR-action -> normalized OSC_POSE commands, flow gripper sign convention,
    and the request state vector."""
    from scripts.libero.main import (
        get_action_from_response as mine_ar,
    )
    from scripts.libero.main import (
        obs_to_request as mine_req,
    )
    from scripts.libero.main import (
        quat2rot6d as mine_q6,
    )

    gold = _clients_gold()
    np.testing.assert_allclose(mine_q6(gold["lib_quat"]), gold["lib_rot6d"], rtol=1e-12)
    np.testing.assert_allclose(
        mine_ar(5, {"actions": gold["lib_ar_in"]}), gold["lib_ar"], rtol=1e-12
    )
    # flow gripper convention: sign(1-2g); rows with g=0.5 map to exactly 0
    got = flow_chunk_to_actions({"actions": gold["lib_grip_in"].copy()}, 6)
    np.testing.assert_allclose(got[:, -1], gold["lib_grip"][:, -1], atol=0)
    obs = {
        "robot0_eef_pos": gold["lib_obs_pos"],
        "robot0_eef_quat": gold["lib_quat"],
        "robot0_gripper_qpos": gold["lib_obs_qpos"],
    }
    req = mine_req(obs, None, None, "t")
    np.testing.assert_allclose(req["observation"]["state"], gold["lib_state"], rtol=1e-6)


def test_upstream_rollout_executes_raw_chunks(monkeypatch, tmp_path):
    """Upstream mode (reference shared.py:423-430): the server's raw
    ``actions`` chunk is stepped open-loop with per-step gripper
    binarization (shared.py:72-78) — no SLERP post-processing."""
    import scripts.real_robot.shared as shared

    chunk = np.stack([np.r_[np.full(7, 0.1 * i), 0.3 + 0.4 * (i % 2)] for i in range(8)])

    class FakeClient:
        def __init__(self, host, port):
            self.calls = 0

        def infer(self, request):
            self.calls += 1
            return {"actions": chunk}

    class FakeEnv:
        def __init__(self):
            self.raw_actions = []

        def get_observation(self):
            img = np.zeros((32, 32, 3), np.uint8)
            return {
                "image": {"exterior_image_1_left": img, "wrist_image_left": img},
                "robot_state": {
                    "cartesian_position": np.zeros(6),
                    "gripper_position": 0.0,
                },
            }

        def step_raw(self, action):
            self.raw_actions.append(np.asarray(action))
            return self.get_observation()

        def step_absolute(self, target):  # pragma: no cover - must not be hit
            raise AssertionError("upstream mode must not SLERP/step_absolute")

    monkeypatch.setattr(shared, "WebsocketClientPolicy", FakeClient)
    config = shared.RunnerConfig(
        upstream=True,
        open_loop_horizon=3,
        max_steps=6,
        video_dir=str(tmp_path / "v"),
        log_dir=str(tmp_path / "l"),
    )
    env = FakeEnv()
    runner = shared.BaseEvalRunner(config, env)
    runner.rollout_once("stack the cups")

    assert len(env.raw_actions) == 6  # max_steps raw steps
    assert runner.client.calls == 2  # refetched every open_loop_horizon
    for i, a in enumerate(env.raw_actions):
        expect = chunk[i % 3].copy()
        expect[-1] = 1.0 if expect[-1] > 0.5 else 0.0
        np.testing.assert_allclose(a, expect)


def test_upstream_state_is_plain_rpy(monkeypatch):
    """Franka upstream serves pos3+rpy3 state (reference franka_main.py:43-44)
    and 1-binarize gripper obs (:46-48)."""
    import scripts.real_robot.shared as shared

    monkeypatch.setattr(shared, "WebsocketClientPolicy", lambda h, p: None)
    config = shared.RunnerConfig(
        use_rot6d_state=False, gripper_obs_mode="binarize_invert"
    )
    runner = shared.BaseEvalRunner(config, env=None)
    obs = {
        "robot_state": {
            "cartesian_position": np.r_[1.0, 2.0, 3.0, 0.1, 0.2, 0.3],
            "gripper_position": 0.99,
        }
    }
    state = runner.extract_state(obs)
    assert state.shape == (7,)
    np.testing.assert_allclose(state[:6], [1, 2, 3, 0.1, 0.2, 0.3], atol=1e-6)
    assert state[6] == 0.0  # 1 - binarize(0.9) = 0
