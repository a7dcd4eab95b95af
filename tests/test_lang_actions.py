import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from lap_tpu.policies.action_text import (
    describe_language_action_scale,
    is_idle_language_action,
    summarize_bimanual_numeric_actions,
    summarize_numeric_actions,
)
from lap_tpu.policies.frame_transforms import (
    rot6d_to_rotmat,
    transform_actions_from_eef_frame,
    transform_actions_to_eef_frame,
)
from lap_tpu.policies.lang_action_formats import (
    VLA0ActionFormat,
    get_language_action_format,
)


def test_summarize_verbose_roundtrip():
    fmt = get_language_action_format("verbose_with_rotation")
    # One chunk: +5cm x, -3cm y, +20deg yaw, close gripper.
    actions = np.zeros((4, 7))
    actions[:, 0] = 0.0125  # 5 cm total
    actions[:, 1] = -0.0075  # -3 cm total
    actions[:, 5] = np.deg2rad(5)  # 20 deg total
    actions[:, 6] = 0.0
    text = summarize_numeric_actions(actions, "0f", include_rotation=True)
    assert "move forward 5 cm" in text
    assert "move right 3 cm" in text
    assert "rotate counterclockwise 20 degrees" in text
    assert "close gripper" in text

    movement, gripper = fmt.parse_language_to_deltas(text)
    np.testing.assert_allclose(movement[0], 0.05, atol=1e-6)
    np.testing.assert_allclose(movement[1], -0.03, atol=1e-6)
    np.testing.assert_allclose(movement[5], np.deg2rad(20), atol=1e-6)
    assert gripper == 0.0


def test_summarize_compact_roundtrip():
    actions = np.zeros((1, 7))
    actions[0, :3] = [0.05, -0.02, 0.0]
    actions[0, 6] = 1.0
    text = summarize_numeric_actions(actions, "compact", include_rotation=True)
    assert text.startswith("<+05 -02 +00")
    fmt = get_language_action_format("verbose_with_rotation")
    fmt_compact = fmt.__class__(name="c", style="compact", include_rotation=True)
    movement, gripper = fmt_compact.parse_language_to_deltas(text)
    np.testing.assert_allclose(movement[:3], [0.05, -0.02, 0.0], atol=1e-6)
    assert gripper == 1.0


def test_no_number_and_scale_words():
    actions = np.zeros((1, 7))
    actions[0, 0] = 0.06
    actions[0, 6] = 1.0
    text = summarize_numeric_actions(actions, "no_number")
    assert text == "move forward, open gripper"
    scaled = describe_language_action_scale("move forward 6 cm, open gripper")
    assert scaled == "move forward moderately, open gripper"
    # scale words parse back to magnitudes
    fmt = get_language_action_format("verbose_with_rotation")
    movement, _ = fmt.parse_language_to_deltas(scaled)
    np.testing.assert_allclose(movement[0], 0.05, atol=1e-6)


def test_bimanual():
    actions = np.zeros((1, 14))
    actions[0, 0] = 0.05
    actions[0, 7 + 2] = -0.04
    actions[0, 6] = 1.0
    actions[0, 13] = 0.0
    text = summarize_numeric_actions(actions, "0f")  # needs >= 7 -> single arm view
    btext = summarize_bimanual_numeric_actions(actions, "0f")
    assert "Left arm:" in btext and "Right arm:" in btext
    assert "move forward 5 cm" in btext
    assert "move down 4 cm" in btext


def test_idle_detection():
    assert is_idle_language_action("close gripper", "0f")
    assert is_idle_language_action("move forward 0.5 cm, open gripper", "0f")
    assert not is_idle_language_action("move forward 5 cm, open gripper", "0f")
    assert is_idle_language_action("<+00 +00 +00 1>", "compact")
    assert not is_idle_language_action("<+05 +00 +00 1>", "compact")
    assert not is_idle_language_action("move up, open gripper", "no_number")


def test_vla0_roundtrip():
    fmt = VLA0ActionFormat(name="v", action_horizon=2, action_dim=7)
    actions = np.array(
        [[0.5, -0.5, 0.0, 0.1, -0.1, 0.2, 1.0], [0.0] * 7]
    )
    text = fmt.summarize_actions(actions)
    parsed = fmt.parse_to_full_actions(text)
    np.testing.assert_allclose(parsed, actions, atol=1.0 / 1000)
    # garbage input -> zeros
    bad = fmt.parse_to_full_actions("not numbers")
    assert bad.shape == (2, 7) and (bad == 0).all()


def test_rot6d_roundtrip():
    rot = R.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    rot6d = np.concatenate([rot[:, 0], rot[:, 1]])
    back = rot6d_to_rotmat(rot6d)
    np.testing.assert_allclose(back, rot, atol=1e-8)


def test_eef_frame_roundtrip_identity_rotation():
    # With identity orientation: to_eef flips y/z, from_eef flips back.
    state = np.zeros(10)
    state[3:9] = [1, 0, 0, 0, 1, 0]  # identity rot6d
    action = np.array([0.05, 0.02, -0.01, 0.1, 0.05, -0.2, 1.0])
    eef = transform_actions_to_eef_frame(action, state, dataset_name="droid")
    back = transform_actions_from_eef_frame(eef[None, :], state, dataset_name="droid")[0]
    np.testing.assert_allclose(back[:6], action[:6], atol=1e-8)


def test_eef_frame_roundtrip_random_rotation():
    rng = np.random.default_rng(0)
    rot = R.from_euler("xyz", rng.uniform(-1, 1, 3)).as_matrix()
    state = np.zeros(10)
    state[3:9] = np.concatenate([rot[:, 0], rot[:, 1]])
    action = np.concatenate([rng.uniform(-0.05, 0.05, 3), rng.uniform(-0.3, 0.3, 3), [0.0]])
    eef = transform_actions_to_eef_frame(action, state, dataset_name="droid")
    back = transform_actions_from_eef_frame(eef[None, :], state, dataset_name="droid")[0]
    np.testing.assert_allclose(back[:6], action[:6], atol=1e-8)
