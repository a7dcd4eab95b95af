import numpy as np
import pytest

from lap_tpu.policies.input_transforms import CoTInputs
from lap_tpu.policies.output_transforms import CoTOutputs, unnormalize
from lap_tpu.policies.question_types import (
    AnswerFormat,
    QuestionConfig,
    compute_dominant_directions,
    compute_gripper_change,
    compute_motion_magnitude,
    format_delta_motion,
    get_embodiment_name,
)


def _robot_sample(with_lang=True):
    img = np.random.default_rng(0).integers(0, 255, (224, 224, 3), np.uint8)
    data = {
        "observation": {
            "base_0_rgb": img,
            "left_wrist_0_rgb": img,
            "state": np.zeros(10, np.float32),
        },
        "prompt": b"pick up the cup",
        "dataset_name": b"droid",
        "actions": np.zeros((8, 7), np.float32),
        "raw_state": np.array([0, 0, 0, 1, 0, 0, 0, 1, 0, 0.5], np.float32),
        "has_wrist_image": True,
    }
    if with_lang:
        # language_actions is the pre-summed per-frame delta (7-vector).
        la = np.zeros(7)
        la[0] = 0.08  # 8 cm forward
        la[6] = 1.0
        data["language_actions"] = la
    return data


def test_cot_inputs_robot_sample():
    tf = CoTInputs(action_dim=32, language_action_format="verbose_with_rotation")
    out = tf(_robot_sample())
    assert out["prompt"] == "pick up the cup"
    assert set(out["image"].keys()) == {"base_0_rgb", "left_wrist_0_rgb"}
    assert out["actions"].shape == (8, 32)  # padded
    assert "move forward 8 cm" in out["language_actions"]
    assert out["sample_mask"]  # not idle
    assert out["frame_description"] == "robot base frame"


def test_cot_inputs_idle_masked():
    data = _robot_sample()
    data["language_actions"] = np.zeros((8, 7))  # no motion, close gripper
    tf = CoTInputs(action_dim=32, language_action_format="verbose_with_rotation")
    out = tf(data)
    assert not out["sample_mask"]


def test_cot_inputs_eef_frame():
    tf = CoTInputs(action_dim=32, language_action_format="verbose_eef_with_rotation")
    out = tf(_robot_sample())
    assert out["frame_description"] == "end-effector frame"


def test_cot_inputs_vqa():
    data = _robot_sample(with_lang=False)
    data["is_vqa_sample"] = True
    data["caption"] = b"a cat on a mat"
    tf = CoTInputs(action_dim=32, language_action_format="verbose_with_rotation")
    out = tf(data)
    assert out["language_actions"] == "a cat on a mat"
    assert out["sample_mask"] is True


def test_cot_inputs_prediction_diverse():
    data = _robot_sample()
    data["is_prediction_sample"] = True
    tf = CoTInputs(
        action_dim=32,
        language_action_format="verbose_with_rotation",
        enable_diverse_questions=True,
    )
    out = tf(data)
    assert out["sample_mask"] is True
    assert isinstance(out["prompt"], str) and out["prompt"]
    assert isinstance(out["language_actions"], str)


def test_cot_inputs_vla0():
    data = _robot_sample(with_lang=False)
    tf = CoTInputs(
        action_dim=7,
        language_action_format="vla0_chunked",
        transform_strategy="vla0",
    )
    out = tf(data)
    assert out["frame_description"] == "normalized"
    ints = out["language_actions"].split()
    assert len(ints) == 8 * 7 and all(i == "500" for i in ints)


def test_cot_outputs_standard():
    tf = CoTOutputs(language_action_format="verbose_with_rotation")
    out = tf({"actions": np.zeros(7), "reasoning": "move forward 5 cm, close gripper"})
    np.testing.assert_allclose(out["actions"][0], 0.05)
    assert out["actions"][-1] == 0.0


def test_cot_outputs_no_reasoning():
    tf = CoTOutputs()
    out = tf({"actions": np.ones((4, 7))})
    assert out["reasoning"] is None
    assert out["actions"].shape == (4, 7)


def test_cot_outputs_vla0_unnormalize():
    from lap_tpu.policies.lang_action_formats import VLA0ActionFormat

    fmt = VLA0ActionFormat(name="v", action_horizon=1, action_dim=7)
    stats = {"actions": {"q01": -np.ones(7) * 2, "q99": np.ones(7) * 2}}
    tf = CoTOutputs(
        language_action_format=fmt, norm_stats=stats, transform_strategy="vla0"
    )
    out = tf({"actions": np.zeros(7), "reasoning": fmt.summarize_actions(np.zeros(7))})
    np.testing.assert_allclose(out["actions"][0], np.zeros(7), atol=0.01)


def test_unnormalize_types():
    a = np.array([[1.0, -1.0]])
    assert np.allclose(
        unnormalize(a, {"q01": np.array([0.0, 0.0]), "q99": np.array([10.0, 10.0])}, "bounds_q99"),
        [[10.0, 0.0]],
        atol=1e-4,
    )
    assert np.allclose(
        unnormalize(a, {"min": np.array([0.0, 0.0]), "max": np.array([4.0, 4.0])}, "bounds"),
        [[4.0, 0.0]],
        atol=1e-6,
    )
    assert np.allclose(
        unnormalize(a, {"mean": np.array([1.0, 1.0]), "std": np.array([2.0, 2.0])}, "normal"),
        [[3.0, -1.0]],
        atol=1e-5,
    )


def test_question_helpers():
    assert compute_dominant_directions(5, 0, -3) == "forward and down"
    assert compute_dominant_directions(0, 0, 0) == "stationary"
    assert compute_gripper_change(0.0, 1.0) == "opened"
    assert compute_gripper_change(1.0, 0.0) == "closed"
    assert compute_motion_magnitude(1, 0, 0) == "small movement"
    assert compute_motion_magnitude(10, 0, 0) == "large movement"
    assert "Franka" in get_embodiment_name("droid_100")


@pytest.mark.parametrize("fmt", list(AnswerFormat))
def test_format_delta_motion_all_formats(fmt):
    out = format_delta_motion(3.2, -2.0, 0.0, 12.0, 0.0, -7.0, "open gripper", answer_format=fmt)
    assert isinstance(out, str) and out


def test_question_config_sampling():
    rng = np.random.default_rng(0)
    cfg = QuestionConfig()
    types = {cfg.sample_question_type(rng).value for _ in range(200)}
    assert "delta_motion" in types and len(types) >= 4
    prompt = cfg.get_prompt_template(
        cfg.sample_question_type(rng), rng, frame_description="end-effector frame"
    )
    assert isinstance(prompt, str)
