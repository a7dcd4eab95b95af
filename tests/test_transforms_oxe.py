"""Every reference OXE standardization transform: registry resolution +
fabricated-episode unit test per dataset (reference transforms.py:1662-1766).
"""

import numpy as np
import pytest

from lap_tpu.data import transforms_oxe  # noqa: F401 - registers transforms
from lap_tpu.data.registry import get_dataset_config

T = 4
IMGS = [b"\x89PNG-fake"] * T

# Every fabricated float stream draws through _f; offsetting the seed yields
# a SECOND independent input set for the reference-parity sweep (different
# values probe different clip/binarize/sign branches in the per-dataset
# standardizations). 0 = the original committed goldens.
SEED_OFFSET = 0


def _f(*shape, lo=-0.5, hi=0.5, seed=0):
    rng = np.random.default_rng(seed + SEED_OFFSET + int(np.prod(shape)))
    return rng.uniform(lo, hi, shape).astype(np.float32)


def _quat_xyzw(t=T):
    q = np.zeros((t, 4), np.float32)
    q[:, 3] = 1.0
    return q


def _quat_wxyz(t=T):
    q = np.zeros((t, 4), np.float32)
    q[:, 0] = 1.0
    return q


def _steps(obs: dict, action, extra: dict | None = None) -> dict:
    steps = {
        "observation": obs,
        "action": action,
        "language_instruction": ["do the task"] * T,
    }
    if extra:
        steps.update(extra)
    return {"steps": steps}


# Raw-episode fabricators, keyed by the reference registry name
# (transforms.py:1662-1766). Each builds the minimal raw layout the real
# TFDS dataset exposes.
FABRICATORS = {
    "bridge_dataset": lambda: _steps(
        {"image_0": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "ppgm": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "cartesian_position": _f(T, 6), "gripper_position": _f(T, 1, lo=0, hi=1)},
        _f(T, 7),
    ),
    "fractal20220817_data": lambda: _steps(
        {"image": IMGS,
         "base_pose_tool_reached": np.concatenate([_f(T, 3), _quat_xyzw()], -1),
         "gripper_closed": _f(T, 1, lo=0, hi=1),
         "natural_language_instruction": ["move"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "gripper_closedness_action": _f(T, 1)},
        {"language_instruction": None},
    ),
    "kuka": lambda: _steps(
        {"image": IMGS,
         "clip_function_input/base_pose_tool_reached": [
             __import__("zlib").compress(
                 np.concatenate([_f(3, seed=i), [0, 0, 0, 1]]).astype(np.float32).tobytes()
             ) for i in range(T)],
         "gripper_closed": [
             __import__("zlib").compress(np.float32(0.0).tobytes()) for _ in range(T)],
         "natural_language_instruction": ["pick"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "gripper_closedness_action": _f(T, 1)},
        {"language_instruction": None},
    ),
    "taco_play": lambda: _steps(
        {"rgb_static": IMGS, "rgb_gripper": IMGS, "robot_obs": _f(T, 15),
         "natural_language_instruction": ["place"] * T},
        {"rel_actions_world": _f(T, 7)},
        {"language_instruction": None},
    ),
    "jaco_play": lambda: _steps(
        {"image": IMGS, "image_wrist": IMGS,
         "end_effector_cartesian_pos": np.concatenate([_f(T, 3), _quat_xyzw()], -1),
         "natural_language_instruction": ["grab"] * T},
        {"world_vector": _f(T, 3), "gripper_closedness_action": _f(T, 1)},
        {"language_instruction": None},
    ),
    "berkeley_cable_routing": lambda: _steps(
        {"image": IMGS, "wrist45_image": IMGS,
         "natural_language_instruction": ["route"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3)},
        {"language_instruction": None},
    ),
    "roboturk": lambda: _steps(
        {"front_rgb": IMGS, "natural_language_instruction": ["lift"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "gripper_closedness_action": _f(T, 1, lo=0, hi=1)},
        {"language_instruction": None},
    ),
    "nyu_door_opening_surprising_effectiveness": lambda: _steps(
        {"image": IMGS, "natural_language_instruction": ["open"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "gripper_closedness_action": _f(T, 1)},
        {"language_instruction": None},
    ),
    "viola": lambda: _steps(
        {"agentview_rgb": IMGS, "eye_in_hand_rgb": IMGS,
         "ee_states": np.tile(np.eye(4, dtype=np.float32).reshape(16), (T, 1)),
         "gripper_states": _f(T, 1, lo=0, hi=0.08),
         "natural_language_instruction": ["stack"] * T},
        {"gripper_closedness_action": _f(T)},
        {"language_instruction": None},
    ),
    "berkeley_autolab_ur5": lambda: _steps(
        {"image": IMGS, "hand_image": IMGS,
         "robot_state": np.concatenate(
             [_f(T, 6), _f(T, 3), _quat_xyzw(), _f(T, 1, lo=0, hi=1), _f(T, 1)], -1),
         "natural_language_instruction": ["push"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "gripper_closedness_action": _f(T)},
        {"language_instruction": None},
    ),
    "toto": lambda: _steps(
        {"image": IMGS, "natural_language_instruction": ["pour"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "open_gripper": np.ones(T, bool)},
        {"language_instruction": None},
    ),
    "language_table": lambda: _steps(
        {"rgb": IMGS,
         "instruction": np.pad(
             np.tile(np.frombuffer(b"slide", np.uint8).astype(np.int32), (T, 1)),
             ((0, 0), (0, 8)))},
        _f(T, 2),
        {"language_instruction": None},
    ),
    "columbia_cairlab_pusht_real": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "natural_language_instruction": ["push T"] * T},
        {"world_vector": _f(T, 3), "rotation_delta": _f(T, 3),
         "gripper_closedness_action": _f(T)},
        {"language_instruction": None},
    ),
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "depth_image": np.zeros((T, 2, 2, 1), np.float32)},
        _f(T, 4),
    ),
    "nyu_rot_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "stanford_hydra_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 13)}, _f(T, 7)
    ),
    "austin_buds_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "state": np.concatenate(
             [_f(T, 8), np.tile(np.eye(4, dtype=np.float32).reshape(16), (T, 1))], -1)},
        _f(T, 7),
    ),
    "nyu_franka_play_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "image_additional_view": IMGS, "state": _f(T, 13),
         # depth rides along so the REFERENCE transform (which casts it)
         # also runs on this episode in the parity sweep; ours ignores it.
         "depth": np.zeros((T, 2, 2, 1), np.int32),
         "depth_additional_view": np.zeros((T, 2, 2, 1), np.int32)},
        _f(T, 15),
    ),
    "maniskill_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 9, lo=0, hi=1)},
        _f(T, 7),
    ),
    "furniture_bench_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "state": np.concatenate([_f(T, 3), _quat_xyzw(), _f(T, 1, lo=0, hi=0.08)], -1)},
        _f(T, 8),
    ),
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": lambda: _steps(
        {"highres_image": IMGS}, _f(T, 8)
    ),
    "ucsd_kitchen_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS}, _f(T, 8)
    ),
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 4)
    ),
    # sailor/sirius carry the EEF matrix in a dedicated state_ee key and the
    # gripper joint in state's LAST column (reference transforms.py:869-926).
    "austin_sailor_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "state": _f(T, 8, lo=0, hi=0.08),
         "state_ee": np.tile(np.eye(4, dtype=np.float32).reshape(16), (T, 1))},
        _f(T, 7),
    ),
    "austin_sirius_dataset_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "state": _f(T, 8, lo=0, hi=0.08),
         "state_ee": np.tile(np.eye(4, dtype=np.float32).reshape(16), (T, 1))},
        _f(T, 7),
    ),
    "bc_z": lambda: _steps(
        {"image": IMGS,
         "present/xyz": _f(T, 3), "present/axis_angle": _f(T, 3),
         "present/sensed_close": _f(T, 1, lo=0, hi=1),
         "natural_language_instruction": ["wipe"] * T},
        {"future/xyz_residual": _f(T, 3), "future/axis_angle_residual": _f(T, 3),
         "future/target_close": np.zeros((T, 1), np.int64)},
        {"language_instruction": None},
    ),
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 8)
    ),
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 8)
    ),
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "hand_image": IMGS}, _f(T, 7)
    ),
    "utokyo_xarm_bimanual_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS}, _f(T, 14)
    ),
    "robo_net": lambda: _steps(
        {"image": IMGS, "image1": IMGS, "state": _f(T, 5)}, _f(T, 5)
    ),
    "berkeley_mvp_converted_externally_to_rlds": lambda: _steps(
        {"hand_image": IMGS}, _f(T, 8)
    ),
    "berkeley_rpt_converted_externally_to_rlds": lambda: _steps(
        {"hand_image": IMGS}, _f(T, 8)
    ),
    "kaist_nonprehensile_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 20)
    ),
    "stanford_mask_vit_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "end_effector_pose": _f(T, 5)}, _f(T, 5)
    ),
    "tokyo_u_lsmo_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "dlr_sara_pour_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS}, _f(T, 7)
    ),
    "dlr_sara_grid_clamp_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 6)}, _f(T, 7)
    ),
    "dlr_edan_shared_control_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "asu_table_top_converted_externally_to_rlds": lambda: {
        "steps": {
            "observation": {"image": IMGS, "state": _f(T, 7)},
            "action": _f(T, 7),
            "ground_truth_states": {"EE": _f(T, 6)},
            "language_instruction": ["sort"] * T,
        }
    },
    "stanford_robocook_converted_externally_to_rlds": lambda: _steps(
        {"image_1": IMGS, "image_2": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "imperialcollege_sawyer_wrist_cam": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS}, _f(T, 8)
    ),
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 8, lo=0, hi=1)},
        np.concatenate([_f(T, 3), _quat_xyzw(), _f(T, 1, lo=0, hi=1)], -1),
    ),
    "uiuc_d3field": lambda: _steps(
        {"image_1": IMGS, "image_2": IMGS}, _f(T, 3)
    ),
    "utaustin_mutex": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "state": np.concatenate(
             [_f(T, 8), np.tile(np.eye(4, dtype=np.float32).reshape(16), (T, 1))], -1)},
        _f(T, 7),
    ),
    "berkeley_fanuc_manipulation": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 7, lo=0, hi=1),
         "end_effector_state": np.concatenate([_f(T, 3), _quat_xyzw()], -1)},
        _f(T, 6),
    ),
    "cmu_playing_with_food": lambda: _steps(
        {"image": IMGS, "finger_vision_1": IMGS},
        np.concatenate([_f(T, 3), _quat_xyzw(), _f(T, 1)], -1),
    ),
    "cmu_play_fusion": lambda: _steps({"image": IMGS}, _f(T, 9)),
    "cmu_stretch": lambda: _steps(
        {"image": IMGS, "state": _f(T, 7)}, _f(T, 8)
    ),
    "berkeley_gnm_recon": lambda: _steps(
        {"image": IMGS, "state": _f(T, 3), "position": _f(T, 2),
         "yaw": _f(T, 1)},
        _f(T, 2),
    ),
    "berkeley_gnm_cory_hall": lambda: FABRICATORS["berkeley_gnm_recon"](),
    "berkeley_gnm_sac_son": lambda: FABRICATORS["berkeley_gnm_recon"](),
    "droid": lambda: _steps(
        {"exterior_image_1_left": IMGS, "wrist_image_left": IMGS,
         "cartesian_position": _f(T, 6), "gripper_position": _f(T, 1, lo=0, hi=1)},
        _f(T, 7),
        {"action_dict": {"gripper_position": _f(T, 1, lo=0, hi=1)}},
    ),
    "fmb": lambda: _steps(
        {"image_side_1": IMGS, "image_wrist_1": IMGS,
         "eef_pose": np.concatenate([_f(T, 3), _quat_xyzw()], -1),
         "state_gripper_pose": _f(T, lo=0, hi=1)},
        _f(T, 7),
    ),
    "dobbe": lambda: _steps(
        {"wrist_image": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "roboset": lambda: _steps(
        {"image_left": IMGS, "image_wrist": IMGS, "state": _f(T, 8)}, _f(T, 8)
    ),
    "rh20t": lambda: _steps(
        {"image_front": IMGS, "image_wrist": IMGS,
         "tcp_base": _f(T, 6), "gripper_width": _f(T, lo=0, hi=1)},
        {"tcp_base": _f(T, 6), "gripper": np.ones(T, np.int64)},
    ),
    "tdroid_carrot_in_bowl": lambda: _steps(
        {"static_image": IMGS, "wrist_image": IMGS,
         "cartesian_position": _f(T, 6), "gripper_position": _f(T, 1, lo=0, hi=1)},
        _f(T, 7),
    ),
    "libero_spatial_no_noops": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS,
         "state": np.concatenate([_f(T, 3), _f(T, 3), _f(T, 2, lo=0, hi=0.04)], -1)},
        _f(T, 7),
    ),
    "ego4d_split_1": lambda: {"steps": {"observation": {"image": IMGS},
                                        "language_instruction": ["cook"] * T}},
    "sample_r1_lite": lambda: _steps(
        {"image_camera_head": IMGS, "image_camera_wrist_left": IMGS,
         "image_camera_wrist_right": IMGS, "state": _f(T, 14)},
        _f(T, 14),
    ),
    "agibot_large_dataset": lambda: _steps(
        {"head_image": IMGS, "image_camera_wrist_left": IMGS,
         "image_camera_wrist_right": IMGS, "state": _f(T, 14)},
        _f(T, 14),
    ),
    "molmoact_dataset": lambda: _steps(
        {"first_view_image": IMGS, "wrist_image": IMGS, "state": _f(T, 7)},
        _f(T, 7),
    ),
    "planning_dataset": lambda: _steps(
        {"image": IMGS,
         "state": np.concatenate([_f(T, 6), _quat_wxyz(), _f(T, 1)], -1)},
        np.concatenate([_f(T, 6), _f(T, 3), _f(T, 1)], -1),
    ),
    "franka_dataset": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 7, lo=0, hi=1)},
        _f(T, 7),
    ),
    "yam_jointpos_dataset": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
    "yam_dataset": lambda: _steps(
        {"image": IMGS, "wrist_image": IMGS, "state": _f(T, 7)}, _f(T, 7)
    ),
}

# Every key of the reference registry (transforms.py:1662-1766) must resolve;
# aliases share a fabricator with their canonical dataset.
REFERENCE_REGISTRY_KEYS = [
    "bridge_dataset", "ppgm", "ppgm_static", "ppgm_wrist",
    "fractal20220817_data", "kuka", "taco_play", "jaco_play",
    "berkeley_cable_routing", "roboturk",
    "nyu_door_opening_surprising_effectiveness", "viola",
    "berkeley_autolab_ur5", "toto", "language_table",
    "columbia_cairlab_pusht_real",
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds",
    "nyu_rot_dataset_converted_externally_to_rlds",
    "stanford_hydra_dataset_converted_externally_to_rlds",
    "austin_buds_dataset_converted_externally_to_rlds",
    "nyu_franka_play_dataset_converted_externally_to_rlds",
    "maniskill_dataset_converted_externally_to_rlds",
    "furniture_bench_dataset_converted_externally_to_rlds",
    "cmu_franka_exploration_dataset_converted_externally_to_rlds",
    "ucsd_kitchen_dataset_converted_externally_to_rlds",
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds",
    "austin_sailor_dataset_converted_externally_to_rlds",
    "austin_sirius_dataset_converted_externally_to_rlds", "bc_z",
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds",
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds",
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds",
    "utokyo_xarm_bimanual_converted_externally_to_rlds", "robo_net",
    "berkeley_mvp_converted_externally_to_rlds",
    "berkeley_rpt_converted_externally_to_rlds",
    "kaist_nonprehensile_converted_externally_to_rlds",
    "stanford_mask_vit_converted_externally_to_rlds",
    "tokyo_u_lsmo_converted_externally_to_rlds",
    "dlr_sara_pour_converted_externally_to_rlds",
    "dlr_sara_grid_clamp_converted_externally_to_rlds",
    "dlr_edan_shared_control_converted_externally_to_rlds",
    "asu_table_top_converted_externally_to_rlds",
    "stanford_robocook_converted_externally_to_rlds",
    "imperialcollege_sawyer_wrist_cam",
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds",
    "uiuc_d3field", "utaustin_mutex", "berkeley_fanuc_manipulation",
    "cmu_playing_with_food", "cmu_play_fusion", "cmu_stretch",
    "berkeley_gnm_recon", "berkeley_gnm_cory_hall", "berkeley_gnm_sac_son",
    "droid", "droid_100", "fmb", "dobbe", "roboset", "rh20t",
    "tdroid_carrot_in_bowl", "tdroid_pour_corn_in_pot",
    "tdroid_flip_pot_upright", "tdroid_move_object_onto_plate",
    "tdroid_knock_object_over", "tdroid_cover_object_with_towel",
    "libero_spatial_no_noops", "libero_object_no_noops",
    "libero_goal_no_noops", "libero_10_no_noops", "libero_combined",
    "ego4d_split_1", "ego4d_split_2", "ego4d_split_3", "ego4d_split_4",
    "sample_r1_lite", "agibot_large_dataset", "molmoact_dataset",
    "planning_dataset", "franka_dataset", "yam_jointpos_dataset",
    "yam_jointpos_dataset_small", "yam_dataset", "franka_demo_dataset",
    "franka_towel_demo_dataset", "yam_demo_dataset",
    "franka_rollout_dataset", "yam_rollout_dataset",
]

ALIASES = {
    "ppgm_static": "ppgm", "ppgm_wrist": "ppgm",
    "droid_100": "droid",
    "tdroid_pour_corn_in_pot": "tdroid_carrot_in_bowl",
    "tdroid_flip_pot_upright": "tdroid_carrot_in_bowl",
    "tdroid_move_object_onto_plate": "tdroid_carrot_in_bowl",
    "tdroid_knock_object_over": "tdroid_carrot_in_bowl",
    "tdroid_cover_object_with_towel": "tdroid_carrot_in_bowl",
    "libero_object_no_noops": "libero_spatial_no_noops",
    "libero_goal_no_noops": "libero_spatial_no_noops",
    "libero_10_no_noops": "libero_spatial_no_noops",
    "libero_combined": "libero_spatial_no_noops",
    "ego4d_split_2": "ego4d_split_1", "ego4d_split_3": "ego4d_split_1",
    "ego4d_split_4": "ego4d_split_1",
    "yam_jointpos_dataset_small": "yam_jointpos_dataset",
    "franka_demo_dataset": "franka_dataset",
    "franka_towel_demo_dataset": "franka_dataset",
    "yam_demo_dataset": "yam_dataset",
    "yam_rollout_dataset": "yam_dataset",
}


def test_all_reference_registry_keys_resolve():
    for key in REFERENCE_REGISTRY_KEYS:
        cfg = get_dataset_config(key)
        assert cfg.standardize_fn is not None, key
        # Never the generic fallback for a named reference dataset.
        assert cfg.standardize_fn.__name__ != "generic_dataset_transform", key


@pytest.mark.parametrize("name", sorted(FABRICATORS))
def test_transform_output_schema(name):
    cfg = get_dataset_config(name)
    out = cfg.standardize_fn(FABRICATORS[name]())
    if name.startswith("ego4d"):  # human video: images only
        assert out["observation"]["base_0_rgb"]
        return
    obs = out["observation"]
    action = np.asarray(out["action"])
    t = len(action)
    assert action.dtype == np.float32
    assert action.ndim == 2 and t >= 1
    state = np.asarray(obs["state"])
    assert state.shape[0] == t and state.dtype == np.float32
    assert len(obs["base_0_rgb"]) == t
    assert len(out["language_instruction"]) in (1, t)
    if "language_action" in out:
        la = np.asarray(out["language_action"])
        assert la.shape[0] == t and la.dtype == np.float32
        assert np.isfinite(la).all()


def test_transform_count_meets_reference():
    # The reference registry defines ~44 distinct transform functions over
    # 90+ dataset keys; ours must resolve every key (checked above) with at
    # least as many distinct implementations.
    fns = set()
    for key in REFERENCE_REGISTRY_KEYS:
        fns.add(get_dataset_config(key).standardize_fn.__name__)
    assert len(fns) >= 40, sorted(fns)


def test_farmhash_fingerprint64_known_vectors():
    """Pin the from-spec FarmHash Fingerprint64 against values produced by
    tf.strings.to_hash_bucket_fast (verified on 5000 fuzz cases vs TF when
    the goldens were generated); guards the pure-Python port without needing
    TF at test time."""
    from lap_tpu.data.transform_helpers import farmhash_fingerprint64 as fh

    assert fh(b"hello") % 1000 == 296
    assert fh(b"13.725610") % 18 == 12
    assert fh(b"-0.500000") % 18 == 11
    assert fh(b"0.000000") % 18 == 13
    assert fh(b"123456.781250") % 18 == 12
    assert fh(b"") == 0x9AE16A3B2F90404F  # k2: the empty-string fingerprint


def test_fill_empty_instructions_semantics():
    from lap_tpu.data.transform_helpers import (
        FALLBACK_INSTRUCTIONS,
        fill_empty_instructions,
    )

    state = np.array([0.5, -1.0, 2.0], np.float32)
    # Non-empty first instruction: broadcast, never replaced.
    out = fill_empty_instructions(["do x", "do y", "do z"], state)
    assert out == ["do x"] * 3
    # Empty / whitespace first instruction: deterministic fallback.
    a = fill_empty_instructions(["", "do y"], state)
    b = fill_empty_instructions(["  \t ", "do y"], state)
    assert a == b and a[0] in FALLBACK_INSTRUCTIONS and len(a) == 2
    # Different state -> (generally) different bucket; always from the table.
    c = fill_empty_instructions([""], state + 3.0)
    assert c[0] in FALLBACK_INSTRUCTIONS
    # Non-deterministic variant still reproducible, still from the table.
    d1 = fill_empty_instructions([""], state, deterministic=False)
    d2 = fill_empty_instructions([""], state, deterministic=False)
    assert d1 == d2 and d1[0] in FALLBACK_INSTRUCTIONS
