#!/usr/bin/env python
"""Generate golden parity fixtures by RUNNING the reference TF data plane.

The reference implementation (lihzha/lap) keeps its standardization /
rotation / gripper logic in pure TF+numpy modules that import cleanly
without the rest of its stack:

    lap/datasets/utils/rotation_utils.py       (euler/quat/R6 algebra)
    lap/datasets/utils/transform_helpers.py    (gripper scans, matrix state)
    lap/datasets/utils/transforms.py           (per-dataset standardization)
    lap/datasets/utils/tfdata_pipeline.py      (gather_with_padding)
    lap/datasets/base_dataset.py               (sum_actions; AST-extracted)

This script fabricates deterministic inputs, runs the REFERENCE functions
on them, and dumps .npz goldens under tests/golden/ref_parity/.  The
committed fixtures are then asserted against the numpy re-implementations
by tests/test_ref_parity.py, turning "ported by specification" into
"proven against the reference binary-for-binary".

Run (only needed to regenerate; fixtures are committed):

    python tests/ref_parity/gen_fixtures.py
"""

from __future__ import annotations

import ast
import pathlib
import sys
import types

import numpy as np

REF = "/root/reference/src"
OUT = pathlib.Path(__file__).resolve().parents[1] / "golden" / "ref_parity"

# -- Import the reference leaf modules without executing lap/__init__
# (which drags in dlimp / tfds / numpydantic, absent in this image).
sys.path.insert(0, REF)
for _name, _path in [
    ("lap", REF + "/lap"),
    ("lap.datasets", REF + "/lap/datasets"),
    ("lap.datasets.utils", REF + "/lap/datasets/utils"),
]:
    _m = types.ModuleType(_name)
    _m.__path__ = [_path]
    sys.modules[_name] = _m

import tensorflow as tf  # noqa: E402

# -- Minimal tensorflow_graphics stub. The reference lazily imports
# tft.rotation_matrix_3d.{from_axis_angle,from_quaternion} inside its
# axis-angle/wxyz helpers; those kernels are standard textbook math
# (Rodrigues / quaternion-to-matrix), so a faithful stub lets us run the
# reference's OWN wrapper logic (safe-angle handling, euler extraction
# formulas) without the package.


def _stub_from_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float64)
    angle = np.asarray(angle, np.float64)[..., 0]
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    c, s = np.cos(angle), np.sin(angle)
    C = 1 - c
    m = np.stack(
        [
            np.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s], -1),
            np.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s], -1),
            np.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C], -1),
        ],
        -2,
    )
    return tf.constant(m.astype(np.float32))


def _stub_from_quaternion(q):
    q = np.asarray(q, np.float64)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = np.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    m = np.stack(
        [
            np.stack([1 - (yy + zz), xy - wz, xz + wy], -1),
            np.stack([xy + wz, 1 - (xx + zz), yz - wx], -1),
            np.stack([xz - wy, yz + wx, 1 - (xx + yy)], -1),
        ],
        -2,
    )
    return tf.constant(m.astype(np.float32))


def _stub_euler_from_quaternion(q):
    """tfg euler.from_quaternion: extrinsic XYZ angles (R = Rz Ry Rx),
    extracted with tfg's from_rotation_matrix formulas."""
    m = _stub_from_quaternion(q).numpy().astype(np.float64)
    sy = np.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    ax = np.arctan2(m[..., 2, 1], m[..., 2, 2])
    ay = np.arctan2(-m[..., 2, 0], sy)
    az = np.arctan2(m[..., 1, 0], m[..., 0, 0])
    return tf.constant(np.stack([ax, ay, az], -1).astype(np.float32))


_tfg = types.ModuleType("tensorflow_graphics")
_tfg_geom = types.ModuleType("tensorflow_graphics.geometry")
_tfg_tr = types.ModuleType("tensorflow_graphics.geometry.transformation")
_rm3 = types.SimpleNamespace(
    from_axis_angle=_stub_from_axis_angle, from_quaternion=_stub_from_quaternion
)
_tfg_tr.rotation_matrix_3d = _rm3
_tfg_tr.euler = types.SimpleNamespace(from_quaternion=_stub_euler_from_quaternion)
_tfg_geom.transformation = _tfg_tr
_tfg.geometry = _tfg_geom
sys.modules["tensorflow_graphics"] = _tfg
sys.modules["tensorflow_graphics.geometry"] = _tfg_geom
sys.modules["tensorflow_graphics.geometry.transformation"] = _tfg_tr

from lap.datasets.utils import rotation_utils as RU  # noqa: E402
from lap.datasets.utils import transform_helpers as TH  # noqa: E402
from lap.datasets.utils import transforms as TR  # noqa: E402
from lap.datasets.utils.tfdata_pipeline import gather_with_padding  # noqa: E402
from lap.datasets.utils.tfdata_pipeline import gather_with_last_value_padding  # noqa: E402

SEP = "|"  # npz key path separator ('/' appears inside raw feature names)


def _extract_base_dataset_fns():
    """AST-extract sum_actions (+ its euler helper) from base_dataset.py.

    base_dataset.py itself imports dlimp/tfds, so pull just the two pure
    functions out of its source (ref base_dataset.py:702-777).
    """
    src = pathlib.Path(REF, "lap/datasets/base_dataset.py").read_text()
    tree = ast.parse(src)
    wanted = {"sum_actions", "_matrix_to_euler_xyz_extrinsic"}
    mod = ast.Module(
        body=[n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[],
    )
    ns = {"tf": tf, "_R_from_euler_xyz": RU.euler_to_rotation_matrix, "np": np}
    exec(compile(mod, "base_dataset_extract", "exec"), ns)  # noqa: S102
    assert wanted <= set(ns), f"extraction failed: {set(ns) & wanted}"
    return ns["sum_actions"]


def _np(x):
    if isinstance(x, tf.Tensor):
        return x.numpy()
    return np.asarray(x)


def _to_tf(obj):
    if isinstance(obj, dict):
        # None marks "field absent in this dataset" in fabricated episodes
        return {k: _to_tf(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list) and obj and isinstance(obj[0], str):
        return tf.constant(obj)
    return tf.constant(obj)


def _flatten(prefix: str, obj, out: dict):
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}{SEP}{k}", v, out)
    else:
        arr = _np(obj)
        out[prefix] = arr


# ---------------------------------------------------------------------------
# Suite 1: rotation algebra
# ---------------------------------------------------------------------------


def gen_rotation_suite():
    rng = np.random.default_rng(20260816)
    n = 64
    eulers = rng.uniform(-np.pi, np.pi, size=(n, 3)).astype(np.float32)
    # gimbal-lock rows: pitch = +/- pi/2 exactly, plus near-singular
    eulers[0] = [0.3, np.pi / 2, 0.7]
    eulers[1] = [-0.4, -np.pi / 2, 1.1]
    eulers[2] = [0.2, np.pi / 2 - 1e-7, -0.5]
    eulers[3] = [0.0, 0.0, 0.0]

    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    mats = _np(RU.euler_to_rotation_matrix(tf.constant(eulers)))

    r6 = rng.normal(size=(n, 6)).astype(np.float32)
    r6_valid = _np(RU.rotation_matrix_to_r6(tf.constant(mats)))

    aa = rng.normal(size=(n, 3)).astype(np.float32)
    aa[0] = [1e-9, 0, 0]  # near-zero rotation
    aa[1] = [0, 0, 0]  # exactly zero

    zxy = rng.uniform(-np.pi, np.pi, size=(n, 3)).astype(np.float32)

    # homogeneous transforms for matrix_to_xyzrpy
    T = np.zeros((n, 4, 4), np.float32)
    T[:, :3, :3] = mats
    T[:, :3, 3] = rng.normal(size=(n, 3))
    T[:, 3, 3] = 1.0

    movement = rng.normal(size=(n, 6)).astype(np.float32) * 0.3

    out = {
        "in_eulers": eulers,
        "in_quats_xyzw": quats,
        "in_mats": mats,
        "in_r6_raw": r6,
        "in_r6_valid": r6_valid,
        "in_axis_angle": aa,
        "in_zxy": zxy,
        "in_T": T,
        "in_movement": movement,
        "euler_to_rotation_matrix": _np(RU.euler_to_rotation_matrix(tf.constant(eulers))),
        "rotation_matrix_to_euler": _np(RU.rotation_matrix_to_euler(tf.constant(mats))),
        "euler_to_quaternion": _np(RU.euler_to_quaternion(tf.constant(eulers))),
        "quaternion_to_euler": _np(RU.quaternion_to_euler(tf.constant(quats))),
        "quaternion_to_rotation_matrix": _np(RU.quaternion_to_rotation_matrix(tf.constant(quats))),
        "rotation_matrix_to_quaternion": _np(RU.rotation_matrix_to_quaternion(tf.constant(mats))),
        "rotation_matrix_to_r6": _np(RU.rotation_matrix_to_r6(tf.constant(mats))),
        "r6_to_rotation_matrix_raw": _np(RU.r6_to_rotation_matrix(tf.constant(r6))),
        "r6_to_rotation_matrix_valid": _np(RU.r6_to_rotation_matrix(tf.constant(r6_valid))),
        "euler_to_r6": _np(RU.euler_to_r6(tf.constant(eulers))),
        "r6_to_euler": _np(RU.r6_to_euler(tf.constant(r6_valid))),
        "axis_angle_to_r6": _np(TR.axis_angle_to_r6(tf.constant(aa))),
        "axis_angle_to_r6_cols": _np(RU.axis_angle_to_r6(tf.constant(aa))),
        "wxyz_to_r6_cols": _np(RU.wxyz_to_r6(tf.constant(np.roll(quats, 1, axis=-1)))),
        "axis_angle_to_euler_rot": _np(RU.axis_angle_to_euler(tf.constant(aa))),
        "axis_angle_to_extrinsic_xyz_euler": _np(TR.axis_angle_to_extrinsic_xyz_euler(tf.constant(aa))),
        "wxyz_to_r6": _np(TR.wxyz_to_r6(tf.constant(np.roll(quats, 1, axis=-1)))),
        "zxy_to_xyz": _np(RU.zxy_to_xyz(tf.constant(zxy))),
        "matrix_to_xyzrpy": _np(RU.matrix_to_xyzrpy(tf.constant(T))),
        "euler_diff": _np(RU.euler_diff(tf.constant(eulers), tf.constant(eulers[::-1].copy()))),
        "coordinate_transform_bcz": _np(RU.coordinate_transform_bcz(tf.constant(movement))),
        "coordinate_transform_dobbe": _np(RU.coordinate_transform_dobbe(tf.constant(movement))),
        "coordinate_transform_jaco": _np(RU.coordinate_transform_jaco(tf.constant(movement))),
    }
    np.savez(OUT / "rotation.npz", **out)
    print(f"rotation.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 2: gripper scans + movement helpers
# ---------------------------------------------------------------------------


def gen_helpers_suite():
    rng = np.random.default_rng(5150)
    # gripper sequences exercising every branch: intermediate runs at the
    # start / middle / end, fully in-between, monotone, constant
    seqs = {
        "mixed": np.array([0.97, 0.5, 0.02, 0.4, 0.99, 0.6, 0.6], np.float32),
        "trailing_between": np.array([0.99, 0.01, 0.5, 0.6], np.float32),
        "leading_between": np.array([0.5, 0.5, 0.99, 0.01], np.float32),
        "all_between": np.array([0.5, 0.4, 0.6], np.float32),
        "random": rng.uniform(0, 1, size=32).astype(np.float32),
        "binary": np.array([1.0, 1.0, 0.0, 0.0, 1.0], np.float32),
    }
    rel_seqs = {
        "no_rel": np.zeros(5, np.float32),
        "close_then_open": np.array([0.0, 0.9, 0.0, -0.8, 0.0], np.float32),
        "open_first": np.array([-0.5, 0.0, 0.7, 0.0], np.float32),
        "random": rng.uniform(-1, 1, size=32).astype(np.float32),
        "tiny": np.array([0.05, -0.05, 0.0], np.float32),  # all under |0.1| deadband
    }
    eef = rng.normal(size=(12, 6)).astype(np.float32)
    eef[:, 3:6] = rng.uniform(-np.pi, np.pi, size=(12, 3))

    acts = rng.uniform(-2, 2, size=(4, 7)).astype(np.float32)

    out = {"in_eef": eef, "in_rescale": acts}
    for name, s in seqs.items():
        out[f"in_binarize_{name}"] = s
        out[f"binarize95_{name}"] = _np(TH.binarize_gripper_actions(tf.constant(s), threshold=0.95))
        out[f"binarize50_{name}"] = _np(TH.binarize_gripper_actions(tf.constant(s), threshold=0.5))
    for name, s in rel_seqs.items():
        out[f"in_rel2abs_{name}"] = s
        out[f"rel2abs_{name}"] = _np(TH.rel2abs_gripper_actions(tf.constant(s)))
    out["compute_padded_movement_actions"] = _np(
        TH.compute_padded_movement_actions(tf.constant(eef))
    )
    out["invert"] = _np(TH.invert_gripper_actions(tf.constant(seqs["random"])))
    out["rescale_with_bound"] = _np(
        TH.rescale_action_with_bound(
            tf.constant(acts), low=-1.5, high=1.5, safety_margin=0.01,
            post_scaling_max=1.75, post_scaling_min=-1.75,
        )
    )
    # extract_state_from_matrix: fabricate valid column-major flattened mats
    eul = rng.uniform(-np.pi, np.pi, size=(8, 3))
    eul[:, 1] = rng.uniform(-1.4, 1.4, size=8)
    R = _np(RU.euler_to_rotation_matrix(tf.constant(eul.astype(np.float32))))
    M = np.zeros((8, 4, 4), np.float32)
    M[:, :3, :3] = R
    M[:, :3, 3] = rng.normal(size=(8, 3))
    M[:, 3, 3] = 1
    flat_colmajor = M.transpose(0, 2, 1).reshape(8, 16)
    grip = rng.uniform(0, 0.1, size=(8, 1)).astype(np.float32)
    out["in_matrix_flat"] = flat_colmajor
    out["in_matrix_grip"] = grip
    out["extract_state_from_matrix"] = _np(
        TH.extract_state_from_matrix(tf.constant(flat_colmajor), tf.constant(grip), 0.079)
    )
    np.savez(OUT / "helpers.npz", **out)
    print(f"helpers.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 3: language-action windowing + variable-horizon summation
# ---------------------------------------------------------------------------


def gen_langact_suite(sum_actions):
    rng = np.random.default_rng(777)
    t, w, a = 11, 5, 7
    # realistic deltas: small translations, moderate rotations, 0/1 gripper
    data = np.zeros((t, a), np.float32)
    data[:, :3] = rng.normal(size=(t, 3)) * 0.02
    data[:, 3:6] = rng.normal(size=(t, 3)) * 0.2
    data[:, 6] = (rng.uniform(size=t) > 0.5).astype(np.float32)
    per_ts = rng.integers(1, w + 1, size=t).astype(np.int32)

    windows_fixed = _np(gather_with_padding(tf.constant(data), tf.constant(t), w))
    windows_var = _np(
        gather_with_padding(tf.constant(data), tf.constant(t), w, tf.constant(per_ts))
    )
    windows_last = _np(gather_with_last_value_padding(tf.constant(data), tf.constant(t), w))

    # sum_actions over fabricated windows incl. big rotations (composition !=
    # addition) and the valid_lengths clamp
    win = np.zeros((6, 4, 7), np.float32)
    win[..., :3] = rng.normal(size=(6, 4, 3)) * 0.05
    win[..., 3:6] = rng.uniform(-1.2, 1.2, size=(6, 4, 3))
    win[..., 6] = rng.uniform(0, 1, size=(6, 4))
    valid = np.array([1, 2, 3, 4, 9, 0], np.int32)  # 9 -> clamp to 4, 0 -> clamp to 1

    out = {
        "in_data": data,
        "in_per_ts": per_ts,
        "in_win": win,
        "in_valid": valid,
        "gather_fixed": windows_fixed,
        "gather_var": windows_var,
        "gather_last_value": windows_last,
        "sum_actions_novalid": _np(sum_actions(tf.constant(win))),
        "sum_actions_valid": _np(sum_actions(tf.constant(win), tf.constant(valid))),
        "sum_actions_windows_var": _np(
            sum_actions(tf.constant(windows_var), tf.constant(np.minimum(per_ts, t - np.arange(t))))
        ),
    }
    np.savez(OUT / "langact.npz", **out)
    print(f"langact.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 4: per-dataset standardization transforms
# ---------------------------------------------------------------------------


def _mk_instr(t, text="pick up the red block"):
    return [text] * t


def gen_dataset_suite():
    rng = np.random.default_rng(424242)
    t = 9

    def eefs():
        e = np.zeros((t, 6), np.float32)
        e[:, :3] = rng.normal(size=(t, 3)) * 0.3
        e[:, 3:6] = rng.uniform(-np.pi, np.pi, size=(t, 3))
        return e

    specs = {}

    # --- libero (ref transforms.py:1453-1481)
    st = np.zeros((t, 8), np.float32)
    st[:, :3] = rng.normal(size=(t, 3)) * 0.3
    st[:, 3:6] = rng.normal(size=(t, 3))  # axis-angle
    st[:, 6] = rng.uniform(0, 0.04, size=t)  # gripper joint 1
    st[:, 7] = -st[:, 6]
    specs["libero"] = (
        TR.libero_dataset_transform,
        {
            "observation": {"state": st},
            "action": rng.uniform(-1, 1, size=(t, 7)).astype(np.float32),
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- droid (ref transforms.py:757-791)
    cart = eefs()
    specs["droid"] = (
        TR.droid_dataset_transform,
        {
            "observation": {
                "cartesian_position": cart,
                "gripper_position": rng.uniform(0, 1, size=(t, 1)).astype(np.float32),
            },
            "action_dict": {"gripper_position": rng.uniform(0, 1, size=(t, 1)).astype(np.float32)},
            "action": rng.normal(size=(t, 7)).astype(np.float32),
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", "state"],
    )

    # --- bridge_v2_oxe (ref transforms.py:174-242)
    bstate = np.concatenate([eefs(), rng.uniform(0, 1, size=(t, 1)).astype(np.float32)], -1)
    bact = rng.normal(size=(t, 7)).astype(np.float32)
    bact[:, 6] = rng.uniform(0, 1, size=t)
    specs["bridge_v2_oxe"] = (
        TR.bridge_v2_oxe_dataset_transform,
        {
            "observation": {"state": bstate},
            "action": bact,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}EEF_state", f"observation{SEP}gripper_state"],
    )

    # --- taco_play (ref transforms.py:397-436)
    specs["taco_play"] = (
        TR.taco_play_dataset_transform,
        {
            "observation": {
                "robot_obs": rng.normal(size=(t, 15)).astype(np.float32),
                "natural_language_instruction": _mk_instr(t),
            },
            "action": {"rel_actions_world": rng.uniform(-1, 1, size=(t, 7)).astype(np.float32)},
        },
        ["action", "language_action", f"observation{SEP}state_eef", f"observation{SEP}state_gripper"],
    )

    # --- jaco_play (ref transforms.py:437-477)
    specs["jaco_play"] = (
        TR.jaco_play_dataset_transform,
        {
            "observation": {
                "end_effector_cartesian_pos": np.concatenate(
                    [eefs(), rng.uniform(0, 0.25, size=(t, 1)).astype(np.float32)], -1
                ),
                "natural_language_instruction": _mk_instr(t),
            },
            "action": {
                "gripper_closedness_action": rng.choice(
                    [-0.9, 0.0, 0.9], size=(t, 1)
                ).astype(np.float32),
                "world_vector": rng.normal(size=(t, 3)).astype(np.float32) * 0.05,
            },
        },
        ["action", "language_action", f"observation{SEP}state_eef", f"observation{SEP}state_gripper"],
    )

    # --- viola (ref transforms.py:534-577)
    eul = rng.uniform(-np.pi, np.pi, size=(t, 3))
    eul[:, 1] = rng.uniform(-1.4, 1.4, size=t)
    R = _np(RU.euler_to_rotation_matrix(tf.constant(eul.astype(np.float32))))
    M = np.zeros((t, 4, 4), np.float32)
    M[:, :3, :3] = R
    M[:, :3, 3] = rng.normal(size=(t, 3))
    M[:, 3, 3] = 1
    specs["viola"] = (
        TR.viola_dataset_transform,
        {
            "observation": {
                "ee_states": M.transpose(0, 2, 1).reshape(t, 16),
                "gripper_states": rng.uniform(0, 0.079, size=(t, 1)).astype(np.float32),
                "natural_language_instruction": _mk_instr(t),
            },
            "action": {
                "gripper_closedness_action": rng.choice([0.0, 1.0], size=t).astype(np.float32)
            },
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- stanford_hydra (ref transforms.py:692-714)
    hst = rng.normal(size=(t, 13)).astype(np.float32)
    hst[:, -3] = rng.uniform(0, 1, size=t)
    specs["stanford_hydra"] = (
        TR.stanford_hydra_dataset_transform,
        {
            "observation": {"state": hst},
            "action": rng.uniform(-1, 1, size=(t, 7)).astype(np.float32),
            "language_instruction": _mk_instr(t),
        },
        ["action", f"observation{SEP}eef_state", f"observation{SEP}gripper_state"],
    )

    # --- austin_buds (ref transforms.py:716-731; build_matrix_state_transform)
    astate = np.zeros((t, 24), np.float32)
    astate[:, :8] = rng.normal(size=(t, 8))
    astate[:, 7] = rng.uniform(0, 0.079, size=t)  # gripper joint
    astate[:, -16:] = M.transpose(0, 2, 1).reshape(t, 16)
    aact = rng.uniform(-1, 1, size=(t, 8)).astype(np.float32)
    specs["austin_buds"] = (
        TR.austin_buds_dataset_transform,
        {
            "observation": {"state": astate},
            "action": aact,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- bc_z (ref transforms.py:923-966)
    specs["bc_z"] = (
        TR.bc_z_dataset_transform,
        {
            "observation": {
                "present/xyz": rng.normal(size=(t, 3)).astype(np.float32) * 0.4,
                "present/axis_angle": rng.normal(size=(t, 3)).astype(np.float32),
                "present/sensed_close": rng.uniform(0, 1, size=(t, 1)).astype(np.float32),
                "natural_language_instruction": _mk_instr(t),
            },
            "action": {
                "future/xyz_residual": rng.normal(size=(t, 3)).astype(np.float32) * 0.02,
                "future/axis_angle_residual": rng.normal(size=(t, 3)).astype(np.float32) * 0.1,
                "future/target_close": rng.choice([0.0, 1.0], size=(t, 1)).astype(np.float32),
            },
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- dobbe (ref transforms.py:1369-1394)
    dstate = np.concatenate([eefs(), rng.uniform(0, 1, size=(t, 1)).astype(np.float32)], -1)
    dact = rng.normal(size=(t, 7)).astype(np.float32)
    specs["dobbe"] = (
        TR.dobbe_dataset_transform,
        {
            "observation": {"state": dstate},
            "action": dact,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}proprio"],
    )

    # --- cmu_stretch (ref transforms.py:1284-1310)
    cstate = np.zeros((t, 4), np.float32)
    cstate[:, :3] = rng.normal(size=(t, 3)) * 0.3
    cstate[:, 3] = rng.uniform(-np.pi, np.pi, size=t)
    specs["cmu_stretch"] = (
        TR.cmu_stretch_dataset_transform,
        {
            "observation": {"state": cstate},
            "action": rng.normal(size=(t, 8)).astype(np.float32),
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}eef_state", f"observation{SEP}gripper_state"],
    )

    # --- roboset (ref transforms.py:1397-1419)
    rstate = rng.normal(size=(t, 8)).astype(np.float32)
    ract = rng.uniform(-1, 1, size=(t, 8)).astype(np.float32)
    specs["roboset"] = (
        TR.roboset_dataset_transform,
        {
            "observation": {"state": rstate},
            "action": ract,
            "language_instruction": _mk_instr(t),
        },
        ["action", f"observation{SEP}proprio"],
    )

    # --- rh20t (ref transforms.py:1422-1437)
    specs["rh20t"] = (
        TR.rh20t_dataset_transform,
        {
            "observation": {
                "tcp_base": eefs(),
                "gripper_width": rng.uniform(0, 0.1, size=t).astype(np.float32),
            },
            "action": {
                "tcp_base": eefs(),
                "gripper": rng.choice([0.0, 1.0], size=t).astype(np.float32),
            },
            "language_instruction": _mk_instr(t),
        },
        ["action", f"observation{SEP}proprio"],
    )

    # --- tdroid (ref transforms.py:1440-1450)
    tact = rng.normal(size=(t, 7)).astype(np.float32)
    tact[:, 6] = rng.uniform(0, 1, size=t)
    specs["tdroid"] = (
        TR.tdroid_dataset_transform,
        {
            "observation": {
                "cartesian_position": eefs(),
                "gripper_position": rng.uniform(0, 1, size=(t, 1)).astype(np.float32),
            },
            "action": tact,
            "language_instruction": _mk_instr(t),
        },
        ["action", f"observation{SEP}EEF_state", f"observation{SEP}gripper_state"],
    )

    # ----- round-3 additions: the remaining oxe_magic_soup members --------
    # (appended AFTER all earlier rng draws so existing fixtures reproduce)

    def _quats(n):
        q = rng.normal(size=(n, 4)).astype(np.float64)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        return q.astype(np.float32)  # xyzw

    def _se3_colmajor(n):
        """Flattened column-major 4x4 EEF poses (austin-style state tail)."""
        import math

        flats = np.zeros((n, 16), np.float32)
        eul = rng.uniform(-np.pi, np.pi, size=(n, 3))
        pos = rng.normal(size=(n, 3)) * 0.4
        for i in range(n):
            a, b, c = eul[i]
            Rx = np.array([[1, 0, 0], [0, math.cos(a), -math.sin(a)], [0, math.sin(a), math.cos(a)]])
            Ry = np.array([[math.cos(b), 0, math.sin(b)], [0, 1, 0], [-math.sin(b), 0, math.cos(b)]])
            Rz = np.array([[math.cos(c), -math.sin(c), 0], [math.sin(c), math.cos(c), 0], [0, 0, 1]])
            M = np.eye(4)
            M[:3, :3] = Rz @ Ry @ Rx
            M[:3, 3] = pos[i]
            # ref does reshape(...,[4,4]) then transpose -> supply M^T flat
            flats[i] = M.T.flatten().astype(np.float32)
        return flats

    # --- fractal / rt1 (ref transforms.py:288-328)
    specs["fractal"] = (
        TR.rt1_dataset_transform,
        {
            "observation": {
                "gripper_closed": rng.uniform(0, 1, size=(t, 1)).astype(np.float32),
                "base_pose_tool_reached": np.concatenate(
                    [rng.normal(size=(t, 3)).astype(np.float32) * 0.3, _quats(t)], -1
                ),
                "natural_language_instruction": _mk_instr(t),
            },
            "action": {
                "world_vector": rng.uniform(-1, 1, size=(t, 3)).astype(np.float32),
                "rotation_delta": rng.uniform(-0.5, 0.5, size=(t, 3)).astype(np.float32),
                "gripper_closedness_action": rng.uniform(-1, 1, size=(t, 1)).astype(np.float32),
            },
        },
        ["action", "language_action", f"observation{SEP}eef_state", f"observation{SEP}gripper_closed"],
    )

    # --- berkeley_autolab_ur5 (ref transforms.py:578-619)
    rs = np.zeros((t, 15), np.float32)
    rs[:, :6] = rng.normal(size=(t, 6))
    rs[:, 6:9] = rng.normal(size=(t, 3)) * 0.3
    rs[:, 9:13] = _quats(t)
    rs[:, 13] = rng.uniform(0, 1, size=t)
    rs[:, 14] = rng.normal(size=t)
    specs["berkeley_autolab_ur5"] = (
        TR.berkeley_autolab_ur5_dataset_transform,
        {
            "observation": {
                "robot_state": rs,
                "image_with_depth": rng.uniform(0, 1, size=(t, 1)).astype(np.float32),
                "natural_language_instruction": _mk_instr(t),
            },
            "action": {
                "world_vector": rng.uniform(-1, 1, size=(t, 3)).astype(np.float32),
                "rotation_delta": rng.uniform(-0.5, 0.5, size=(t, 3)).astype(np.float32),
                "gripper_closedness_action": rng.uniform(-1, 1, size=t).astype(np.float32),
            },
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- furniture_bench (ref transforms.py:798-825)
    fb_state = np.concatenate(
        [
            rng.normal(size=(t, 3)).astype(np.float32) * 0.3,
            _quats(t),
            rng.uniform(0, 0.09, size=(t, 1)).astype(np.float32),
        ],
        -1,
    )
    fb_act = rng.normal(size=(t, 7)).astype(np.float32)
    fb_act[:, 6] = rng.uniform(-0.2, 1.2, size=t)  # probe the clip
    specs["furniture_bench"] = (
        TR.furniture_bench_dataset_transform,
        {
            "observation": {"state": fb_state},
            "action": fb_act,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- austin_sailor / austin_sirius (ref transforms.py:869-926): matrix
    # from the dedicated state_ee key, gripper from state's LAST column.
    for sail in ("austin_sailor", "austin_sirius"):
        st8 = rng.normal(size=(t, 8)).astype(np.float32)
        st8[:, -1] = rng.uniform(0, 0.09, size=t)
        sact = rng.normal(size=(t, 7)).astype(np.float32)
        sact[:, 6] = rng.uniform(-0.2, 1.2, size=t)
        specs[sail] = (
            getattr(TR, f"{sail}_dataset_transform"),
            {
                "observation": {"state": st8, "state_ee": _se3_colmajor(t)},
                "action": sact,
                "language_instruction": _mk_instr(t),
            },
            ["action", "language_action", f"observation{SEP}state"],
        )

    # --- utaustin_mutex (ref transforms.py:1148-1182): matrix in state[-16:],
    # gripper joint at state[:, 7].
    mu_state = np.concatenate(
        [
            rng.normal(size=(t, 7)).astype(np.float32),
            rng.uniform(0, 0.09, size=(t, 1)).astype(np.float32),
            _se3_colmajor(t),
        ],
        -1,
    )
    mu_act = rng.normal(size=(t, 7)).astype(np.float32)
    mu_act[:, 6] = rng.uniform(-0.2, 1.2, size=t)
    specs["utaustin_mutex"] = (
        TR.utaustin_mutex_dataset_transform,
        {
            "observation": {"state": mu_state},
            "action": mu_act,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- molmoact (ref transforms.py:1184-1206)
    mo_state = np.concatenate(
        [eefs(), rng.uniform(0, 1, size=(t, 1)).astype(np.float32)], -1
    )
    mo_act = rng.normal(size=(t, 7)).astype(np.float32)
    mo_act[:, 6] = rng.uniform(0, 1, size=t)
    specs["molmoact"] = (
        TR.molmoact_dataset_transform,
        {
            "observation": {"state": mo_state},
            "action": mo_act,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- berkeley_fanuc (ref transforms.py:1209-1242): gripper comes from
    # state[:, 6] with clip-after-invert ONLY in the state column.
    fa_state = rng.normal(size=(t, 7)).astype(np.float32)
    fa_state[:, 6] = rng.uniform(-0.2, 1.2, size=t)  # probe the clip split
    specs["berkeley_fanuc"] = (
        TR.berkeley_fanuc_dataset_transform,
        {
            "observation": {
                "state": fa_state,
                "end_effector_state": np.concatenate(
                    [rng.normal(size=(t, 3)).astype(np.float32) * 0.3, _quats(t)], -1
                ),
            },
            "action": rng.uniform(-1, 1, size=(t, 6)).astype(np.float32),
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}state"],
    )

    # --- fmb (ref transforms.py:1340-1367): BOTH grippers inverted; state
    # gripper clipped after inversion, action gripper not.
    fm_act = rng.normal(size=(t, 7)).astype(np.float32)
    fm_act[:, 6] = rng.uniform(-0.2, 1.2, size=t)
    specs["fmb"] = (
        TR.fmb_dataset_transform,
        {
            "observation": {
                "eef_pose": np.concatenate(
                    [rng.normal(size=(t, 3)).astype(np.float32) * 0.3, _quats(t)], -1
                ),
                "state_gripper_pose": rng.uniform(-0.2, 1.2, size=t).astype(np.float32),
            },
            "action": fm_act,
            "language_instruction": _mk_instr(t),
        },
        ["action", "language_action", f"observation{SEP}proprio"],
    )

    out = {}
    for name, (fn, inputs, out_keys) in specs.items():
        _flatten(f"{name}{SEP}in", inputs, out)
        traj = _to_tf(inputs)
        result = fn(traj)
        flat = {}
        _flatten(f"{name}{SEP}out", result, flat)
        for key in out_keys:
            full = f"{name}{SEP}out{SEP}{key}"
            assert full in flat, f"{full} missing; have {sorted(flat)}"
            out[full] = flat[full]
        print(f"{name}: {[k.split(SEP)[-1] for k in out_keys]}")

    # strings can't ride np.savez with allow_pickle=False as object arrays;
    # language instructions are constant fillers, drop them
    out = {k: v for k, v in out.items() if v.dtype.kind not in ("O", "U", "S")}
    np.savez(OUT / "datasets.npz", **out)
    print(f"datasets.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 5: image decode / resize-with-pad / wrist-rotation cases
# ---------------------------------------------------------------------------


def gen_image_suite():
    from lap.datasets.utils import image_utils as IU

    rng = np.random.default_rng(77)
    decode = IU.make_decode_images_fn(
        primary_key="base", wrist_key="wrist", resize_to=(224, 224)
    )

    out = {}

    # resize-with-pad numerics over aspect ratios / up+downscaling
    for i, (h, w) in enumerate([(64, 48), (100, 224), (224, 224), (31, 57), (480, 640)]):
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        traj = {"observation": {"base": tf.constant(img), "wrist": tf.constant(img)}}
        res = decode(dict(traj))
        out[f"resize{i}{SEP}in"] = img
        out[f"resize{i}{SEP}out"] = res["observation"]["base"].numpy()

    # PNG byte decode path (lossless -> exact across decoders)
    img = rng.integers(0, 256, size=(96, 128, 3)).astype(np.uint8)
    png = tf.io.encode_png(tf.constant(img)).numpy()
    res = decode({"observation": {"base": tf.constant(png), "wrist": tf.constant(png)}})
    out[f"png{SEP}in"] = np.frombuffer(png, np.uint8)
    out[f"png{SEP}out"] = res["observation"]["base"].numpy()

    # rotation cases (needs_wrist_rotation x prediction flags); the decode fn
    # runs eagerly so the reference's python-truthiness branches execute.
    base = rng.integers(0, 256, size=(64, 48, 3)).astype(np.uint8)
    wrist = rng.integers(0, 256, size=(64, 48, 3)).astype(np.uint8)
    cases = {
        "regular_rot": dict(needs=True, pred=False, prim=False),
        "regular_norot": dict(needs=False, pred=False, prim=False),
        "pred_wrist_rot": dict(needs=True, pred=True, prim=False),
        "pred_primary": dict(needs=True, pred=True, prim=True),
    }
    for name, c in cases.items():
        traj = {
            "observation": {"base": tf.constant(base), "wrist": tf.constant(wrist)},
            "needs_wrist_rotation": tf.constant(c["needs"]),
            "is_prediction_sample": tf.constant(c["pred"]),
            "pred_use_primary": tf.constant(c["prim"]),
        }
        res = decode(traj)
        out[f"rot{SEP}{name}{SEP}base"] = res["observation"]["base"].numpy()
        out[f"rot{SEP}{name}{SEP}wrist"] = res["observation"]["wrist"].numpy()
        out[f"rot{SEP}{name}{SEP}applied"] = np.asarray(bool(res["rotation_applied"]))
    out[f"rot{SEP}in_base"] = base
    out[f"rot{SEP}in_wrist"] = wrist

    np.savez(OUT / "images.npz", **out)
    print(f"images.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 6: language-action text codecs, frame transforms, prompt formats
# ---------------------------------------------------------------------------

PARSE_TEXTS = [
    "move forward 5 cm, tilt left 10 degrees, close gripper",
    "move back 2 cm, move up 12 cm, rotate clockwise 20 degrees, open gripper",
    "move left 3.5 cm, move down 1 cm, tilt forward 15 degrees, close gripper",
    "move right slightly, open gripper",
    "move up moderately, tilt back 30 degrees, close gripper",
    "move forward a lot, rotate counterclockwise 45 degrees, open gripper",
    "set gripper to 0.5",
    "stay still",
    "move backward 4 cm, close gripper",
    "<+05 -02 +00 +10 -20 +30 1>",
    "<-12 +07 -03 +00 +05 -10 0>",
    "open gripper",
    "move forward 0 cm, close gripper",
]

FRAME_DATASETS = [
    "droid",
    "jaco_play",
    "berkeley_autolab_ur5",
    "furniture_bench_dataset_converted_externally_to_rlds",
    "austin_buds_dataset_converted_externally_to_rlds",
    "fmb",
    "viola",
    "generic_dataset",
]


def gen_policy_suite():
    import importlib

    for _name, _path in [
        ("lap.policies", REF + "/lap/policies"),
        ("lap.policies.transforms", REF + "/lap/policies/transforms"),
        ("lap.models", REF + "/lap/models"),
        ("lap.models.prompt_utils", REF + "/lap/models/prompt_utils"),
    ]:
        if _name not in sys.modules:
            _m = types.ModuleType(_name)
            _m.__path__ = [_path]
            sys.modules[_name] = _m

    AT = importlib.import_module("lap.policies.transforms.action_text")
    LF = importlib.import_module("lap.policies.lang_action_formats")
    FT = importlib.import_module("lap.policies.transforms.frame_transforms")
    PR = importlib.import_module("lap.models.prompt_utils.prompt")

    rng = np.random.default_rng(99)
    out = {}

    # ---- action summaries: controlled windows through every style --------
    windows = []
    for _ in range(6):
        w = rng.normal(size=(4, 7)) * 0.05
        w[:, 6] = rng.integers(0, 2, size=4)
        windows.append(w)
    w = np.zeros((3, 7))
    w[:, 2] = 0.004
    w[-1, 6] = 1
    windows.append(w)  # idle-scale, exact-zero x/y
    w = np.zeros((1, 7))
    w[0, 0] = -0.123
    windows.append(w)  # single step, negative x only
    windows = [w.astype(np.float64) for w in windows]

    verbose_texts = []
    for i, w in enumerate(windows):
        out[f"win{i}"] = w
        for sd in ("0f", "1f", "2f", "compact", "no_number"):
            for rot_flag in (False, True):
                s = AT.summarize_numeric_actions(w, sd, include_rotation=rot_flag)
                out[f"sum{SEP}{i}{SEP}{sd}{SEP}{int(rot_flag)}"] = np.array(
                    s if s is not None else "<NONE>"
                )
                if sd == "0f" and rot_flag:
                    verbose_texts.append(s)
        bi = AT.summarize_bimanual_numeric_actions(
            np.concatenate([w, w[:, ::-1][:, :7]], -1), "0f", include_rotation=True
        )
        out[f"bimanual{SEP}{i}"] = np.array(bi if bi is not None else "<NONE>")

    for i, s in enumerate(verbose_texts):
        d = AT.describe_language_action_scale(s)
        out[f"scale{SEP}{i}"] = np.array(d if d is not None else "<NONE>")
        for sd in ("0f", "compact"):
            out[f"idle{SEP}{i}{SEP}{sd}"] = np.asarray(
                AT.is_idle_language_action(s, sd, include_rotation=True)
            )

    # ---- parsing back to deltas ------------------------------------------
    state7 = np.array([0.1, -0.2, 0.3, 0.4, -0.5, 0.6, 1.0])
    for i, text in enumerate(PARSE_TEXTS):
        out[f"parse_in{SEP}{i}"] = np.array(text)
        for fmt_name in ("verbose_with_rotation", "verbose_eef_with_rotation"):
            fmt = LF.get_language_action_format(fmt_name)
            kwargs = {"initial_state": _demo_rot6d_state()} if fmt.use_eef_frame else {}
            movement, grip = fmt.parse_language_to_deltas(text, **kwargs)
            out[f"parse{SEP}{fmt_name}{SEP}{i}{SEP}mov"] = np.asarray(movement, np.float64)
            out[f"parse{SEP}{fmt_name}{SEP}{i}{SEP}grip"] = np.asarray(
                np.nan if grip is None else float(grip)
            )

    # ---- VLA0 round-trip --------------------------------------------------
    vla0 = LF.VLA0ActionFormat(action_horizon=2, action_dim=7)
    acts = rng.uniform(-1.2, 1.2, size=(2, 7))
    out["vla0_in"] = acts
    s = vla0.summarize_actions(acts)
    out["vla0_text"] = np.array(s)
    out["vla0_full"] = np.asarray(vla0.parse_to_full_actions(s), np.float64)

    # ---- EEF frame transforms with per-dataset flips ----------------------
    st = _demo_rot6d_state()
    out["ft_state"] = st
    act1 = np.array([0.03, -0.02, 0.05, 0.2, -0.1, 0.15, 1.0])
    actk = rng.normal(size=(3, 7)) * np.array([0.05] * 3 + [0.2] * 3 + [0.0]) + np.array([0.0] * 6 + [1.0])
    out["ft_act1"] = act1
    out["ft_actk"] = actk
    for name in FRAME_DATASETS:
        for rotflag in (False, True):
            to = FT.transform_actions_to_eef_frame(act1, st, name, needs_wrist_rotation=rotflag)
            out[f"ft{SEP}to{SEP}{name}{SEP}{int(rotflag)}"] = np.asarray(to, np.float64)
        back = FT.transform_actions_from_eef_frame(actk, st, dataset_name=name)
        out[f"ft{SEP}from{SEP}{name}"] = np.asarray(back, np.float64)
    # 7-dim euler state path of from_eef
    st7 = np.array([0.1, 0.2, 0.3, 0.5, -0.4, 0.9, 1.0])
    out[f"ft{SEP}from_euler7"] = np.asarray(
        FT.transform_actions_from_eef_frame(actk, st7, dataset_name="droid"), np.float64
    )

    # ---- prompt formats ---------------------------------------------------
    state = np.zeros(32)
    state[:10] = np.array([0.1, -0.99, 0.5, 0.0, 0.25, -0.5, 0.77, 1.0, -1.0, 0.3])
    prompts = ["pick up the red_block.", "  wipe  the table\nnow ", "stack bowls"]
    for reg_name, registry in (
        ("fmt", PR.PROMPT_FORMAT_REGISTRY),
        ("pred", PR.PREDICTION_PROMPT_FORMAT_REGISTRY),
    ):
        for fmt_name, fmt in registry.items():
            for i, p in enumerate(prompts):
                s = fmt.format_prompt(
                    p,
                    state=state if fmt.include_state else None,
                    state_type="eef_pose",
                    time_horizon_seconds=0.8,
                )
                out[f"prompt{SEP}{reg_name}{SEP}{fmt_name}{SEP}{i}"] = np.array(s)
    # state trimming edge: all-zero state and short state
    lap_fmt = PR.PROMPT_FORMAT_REGISTRY["lap"]
    out[f"prompt{SEP}zero_state"] = np.array(
        lap_fmt.format_prompt("push", state=np.zeros(32), state_type="eef_pose")
    )

    # ---- CoTOutputs end-to-end (serving output parsing) -------------------
    OT = importlib.import_module("lap.policies.transforms.output_transforms")

    class _NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    reasoning = "move forward 5 cm, move left 2 cm, tilt right 15 degrees, close gripper"
    raw_state = _demo_rot6d_state()
    out["cot_raw_state"] = raw_state
    for fmt_name in ("verbose_with_rotation", "verbose_eef_with_rotation"):
        t = OT.CoTOutputs(language_action_format=fmt_name)
        res = t({"actions": np.zeros(1), "reasoning": reasoning, "raw_state": raw_state})
        out[f"cot{SEP}standard{SEP}{fmt_name}"] = np.asarray(res["actions"], np.float64)
    stats = {
        "actions": _NS(
            mean=rng.normal(size=7).astype(np.float32),
            std=rng.uniform(0.1, 1.0, size=7).astype(np.float32),
            q01=rng.uniform(-2, -1, size=7).astype(np.float32),
            q99=rng.uniform(1, 2, size=7).astype(np.float32),
            min=rng.uniform(-4, -3, size=7).astype(np.float32),
            max=rng.uniform(3, 4, size=7).astype(np.float32),
        )
    }
    for f in ("mean", "std", "q01", "q99", "min", "max"):
        out[f"cot_stats{SEP}{f}"] = getattr(stats["actions"], f)
    vla0_text = str(out["vla0_text"])
    for norm in ("bounds_q99", "bounds", "normal"):
        t = OT.CoTOutputs(
            language_action_format=LF.VLA0ActionFormat(action_horizon=2, action_dim=7),
            norm_stats=stats,
            normalization_type=norm,
            transform_strategy="vla0",
        )
        res = t({"actions": np.zeros(1), "reasoning": vla0_text})
        out[f"cot{SEP}vla0{SEP}{norm}"] = np.asarray(res["actions"], np.float64)

    # ---- prediction-question answer formats -------------------------------
    QT = importlib.import_module("lap.policies.question_types")

    qt_deltas = [
        (3.2, -2.1, 0.0, 0.0, 0.0, 0.0, "open gripper"),
        (-1.4, 0.6, 5.5, 12.0, -8.0, 25.0, "close gripper"),
        (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, ""),
        (0.4, -0.4, 0.2, 3.0, -4.0, 2.0, "open gripper"),  # sub-threshold
        (10.0, 10.0, -10.0, -45.0, 45.0, 90.0, "close gripper"),
        (2.0, 0.0, -3.0, 6.0, 0.0, -5.0, "keep gripper unchanged"),
    ]
    for i, d in enumerate(qt_deltas):
        out[f"qt_in{SEP}{i}"] = np.asarray(d[:6], np.float64)
        out[f"qt_grip{SEP}{i}"] = np.array(d[6])
        for af in QT.AnswerFormat:
            s = QT.format_delta_motion(*d[:6], gripper_action=d[6], answer_format=af)
            out[f"qt{SEP}{i}{SEP}{af.value}"] = np.array(s)
        out[f"qt_dom{SEP}{i}"] = np.array(QT.compute_dominant_directions(d[0], d[1], d[2]))
        out[f"qt_mag{SEP}{i}"] = np.array(QT.compute_motion_magnitude(d[0], d[1], d[2]))
    for i, (a, b) in enumerate([(0.0, 1.0), (1.0, 0.0), (0.3, 0.4), (0.9, 0.95)]):
        out[f"qt_gchange{SEP}{i}"] = np.array(QT.compute_gripper_change(a, b))
    for i, name in enumerate(["droid_100", "fractal20220817_data", "bc_z", "unknown_robot"]):
        out[f"qt_embod{SEP}{i}"] = np.array(QT.get_embodiment_name(name))

    # ---- ActionProcessor orchestration (random_base_prob=0 -> deterministic)
    AP = importlib.import_module("lap.policies.transforms.action_processor")
    la1 = np.array([0.03, -0.02, 0.05, 0.2, -0.1, 0.15, 1.0])
    la14 = np.concatenate([la1, la1[::-1][:7]])
    ap_cases = {
        "eef_droid_rot": (
            AP.ActionProcessor(LF.get_language_action_format("verbose_eef_with_rotation")),
            {"language_actions": la1, "has_wrist_image": True},
            dict(initial_state=_demo_rot6d_state(), dataset_name="droid", rotation_applied=True),
        ),
        "eef_droid_norot": (
            AP.ActionProcessor(LF.get_language_action_format("verbose_eef_with_rotation")),
            {"language_actions": la1, "has_wrist_image": True},
            dict(initial_state=_demo_rot6d_state(), dataset_name="droid", rotation_applied=False),
        ),
        "base_verbose": (
            AP.ActionProcessor(LF.get_language_action_format("verbose_with_rotation")),
            {"language_actions": la1},
            dict(initial_state=None, dataset_name="bridge"),
        ),
        "bimanual": (
            AP.ActionProcessor(LF.get_language_action_format("verbose_with_rotation")),
            {"language_actions": la14, "is_bimanual": True},
            dict(),
        ),
        "navigation": (
            AP.ActionProcessor(LF.get_language_action_format("verbose_with_rotation")),
            {"language_actions": np.array([0.31, -0.12, 0.0, 0.0, 0.0, 0.6, 1.0]), "is_navigation": True},
            dict(),
        ),
    }
    for name, (proc, data, kw) in ap_cases.items():
        text, frame = proc.summarize_language_actions(data, **kw)
        out[f"ap{SEP}{name}{SEP}text"] = np.array(text if text is not None else "<NONE>")
        out[f"ap{SEP}{name}{SEP}frame"] = np.array(frame)

    # ---- token-piece checkers (critical/direction loss-mask gates) --------
    CH = importlib.import_module("lap.models.prompt_utils.checkers")
    checker_pieces = [
        "move", "▁right", "5", "▁12cm", "+03", "-", "UP",
        "Counterclockwise", "for", "forwards", "▁backward", "deg", "0f",
        "<loc0123>", "", " ", "down?", "cl", "ockwise", "a1b",
    ]
    checker_names = [
        "is_number", "is_direction_natural", "is_direction_schema",
        "is_direction_none", "is_critical_directional", "is_critical_schema",
        "is_critical_default",
    ]
    out["checker_pieces"] = np.array(checker_pieces)
    for fn in checker_names:
        out[f"checker{SEP}{fn}"] = np.array(
            [bool(getattr(CH, fn)(p)) for p in checker_pieces]
        )

    # ---- bbox letterbox / loc-token utilities -----------------------------
    for _name, _path in [
        ("lap.datasets.vqa", REF + "/lap/datasets/vqa"),
        ("lap.datasets.vqa.bbox", REF + "/lap/datasets/vqa/bbox"),
    ]:
        if _name not in sys.modules:
            _m = types.ModuleType(_name)
            _m.__path__ = [_path]
            sys.modules[_name] = _m
    CU = importlib.import_module("lap.datasets.vqa.bbox.coord_utils")

    bb_cases = [
        # (bbox xyxy normalized, orig_w, orig_h)
        ([0.1, 0.2, 0.6, 0.9], 640, 480),
        ([0.0, 0.0, 1.0, 1.0], 100, 300),
        ([0.25, 0.4, 0.3, 0.45], 57, 31),
        ([0.5, 0.1, 0.95, 0.35], 224, 224),
    ]
    for i, (bb, w, h) in enumerate(bb_cases):
        out[f"bb_in{SEP}{i}"] = np.asarray(bb + [w, h], np.float64)
        lb = CU.transform_bbox_for_letterbox(bb[0], bb[1], bb[2], bb[3], w, h, 224, 224)
        out[f"bb_letter{SEP}{i}"] = np.asarray(lb, np.float64)
        out[f"bb_loc{SEP}{i}"] = np.array(CU.bbox_to_loc_tokens(*lb))
        rot = CU.rotate_bbox_loc_tokens_180_tf(tf.constant(CU.bbox_to_loc_tokens(*lb)))
        out[f"bb_rot{SEP}{i}"] = np.array(rot.numpy().decode())
    objs = [
        {"label": "red block", "bbox": [0.1, 0.2, 0.6, 0.9]},
        {"label": "bowl", "bbox": [0.5, 0.1, 0.95, 0.35]},
        {"label": "red block", "bbox": [0.0, 0.0, 0.2, 0.2]},
    ]
    labels, caption = CU.format_bbox_caption(objs, 640, 480, 224, 224)
    out["bb_caption_labels"] = np.array(labels)
    out["bb_caption"] = np.array(caption)

    np.savez(OUT / "policies.npz", **out)
    print(f"policies.npz: {len(out)} arrays")


def _demo_rot6d_state():
    """state [10]: pos(3) + rot6d(6) + gripper, rot6d from a fixed rotation."""
    import math

    a, b, c = 0.3, -0.7, 1.1
    Rx = np.array([[1, 0, 0], [0, math.cos(a), -math.sin(a)], [0, math.sin(a), math.cos(a)]])
    Ry = np.array([[math.cos(b), 0, math.sin(b)], [0, 1, 0], [-math.sin(b), 0, math.cos(b)]])
    Rz = np.array([[math.cos(c), -math.sin(c), 0], [math.sin(c), math.cos(c), 0], [0, 0, 1]])
    m = Rz @ Ry @ Rx
    # rot6d = first two COLUMNS stacked (rot6d_to_rotmat convention: b1, b2
    # are the first two basis vectors)
    r6 = np.concatenate([m[:, 0], m[:, 1]])
    return np.concatenate([[0.1, -0.2, 0.35], r6, [1.0]])


# ---------------------------------------------------------------------------
# Suite 7: global normalization statistics merge
# ---------------------------------------------------------------------------


def gen_stats_suite():
    import importlib

    # Stub lap.shared.normalize_adapter.ExtendedNormStats (pydantic model in
    # the real package; the builder only constructs it and reads attributes).
    class _NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    shared = types.ModuleType("lap.shared")
    shared.__path__ = [REF + "/lap/shared"]
    adapter = types.ModuleType("lap.shared.normalize_adapter")
    adapter.ExtendedNormStats = _NS
    sys.modules["lap.shared"] = shared
    sys.modules["lap.shared.normalize_adapter"] = adapter

    ST = importlib.import_module("lap.datasets.utils.statistics")

    rng = np.random.default_rng(7)

    def member(dim, n, traj, *, positive_envelope=False):
        # positive_envelope: min > 0 and max < 0 at every dim — exposes the
        # reference's ZERO-padding of min/max for dims a member lacks
        # (statistics.py:224-229 pads with 0.0, so the global envelope
        # saturates at 0 wherever short members dominate).
        lo = rng.uniform(0.5, 1.0, size=dim) if positive_envelope else rng.uniform(-6, -4, size=dim)
        hi = rng.uniform(-1.0, -0.5, size=dim) if positive_envelope else rng.uniform(4, 6, size=dim)
        return _NS(
            mean=rng.normal(size=dim).astype(np.float32),
            std=rng.uniform(0.1, 2.0, size=dim).astype(np.float32),
            q01=rng.uniform(-3, -1, size=dim).astype(np.float32),
            q99=rng.uniform(1, 3, size=dim).astype(np.float32),
            min=lo.astype(np.float32),
            max=hi.astype(np.float32),
            num_transitions=n,
            num_trajectories=traj,
        )

    # Mixed native dims exercise the pad (7->12) and truncate (14->12) paths;
    # delta's positive envelope exposes the min/max zero-padding at dims
    # 10-11, which only it covers.
    stats = {
        "alpha": {"actions": member(7, 1000, 10), "state": member(7, 1000, 10)},
        "beta": {"actions": member(7, 250, 5), "state": member(7, 250, 5)},
        "gamma": {"actions": member(10, 4000, 40), "state": member(10, 4000, 40)},
        "delta": {
            "actions": member(14, 50, 2, positive_envelope=True),
            "state": member(14, 50, 2, positive_envelope=True),
        },
        "vqa_ds": {"actions": member(7, 999, 9), "state": member(7, 999, 9)},
    }
    encodings = {"alpha": "POS_EULER", "beta": "JOINT", "gamma": "POS_EULER", "delta": "JOINT"}

    builder = ST.GlobalStatisticsBuilder(action_dim=12, state_dim=10)
    result = builder.compute_global_stats(
        stats,
        encodings,
        vqa_dataset_names={"vqa_ds"},
        state_encoding_to_type_fn=lambda e: {"POS_EULER": "eef_pose", "JOINT": "joint_pos"}[e],
    )

    out = {}
    for name, mem in stats.items():
        for part in ("actions", "state"):
            s = mem[part]
            for f in ("mean", "std", "q01", "q99", "min", "max"):
                out[f"in{SEP}{name}{SEP}{part}{SEP}{f}"] = getattr(s, f)
            out[f"in{SEP}{name}{SEP}{part}{SEP}n"] = np.asarray(s.num_transitions)
    for group, s in result.items():
        for f in ("mean", "std", "q01", "q99", "min", "max"):
            out[f"out{SEP}{group}{SEP}{f}"] = np.asarray(getattr(s, f))
        out[f"out{SEP}{group}{SEP}n"] = np.asarray(s.num_transitions)
    np.savez(OUT / "stats.npz", **out)
    print(f"stats.npz: {len(out)} arrays, groups={sorted(result)}")


# ---------------------------------------------------------------------------
# Suite 8: long-tail dataset sweep — drive the reference's registered
# standardization fns with the SAME fabricated raw episodes the repo's own
# transform tests use (tests/test_transforms_oxe.py FABRICATORS).
# ---------------------------------------------------------------------------

# Already golden-tested with hand-built inputs in gen_dataset_suite.
SWEEP_SKIP = {
    "libero_spatial_no_noops", "droid", "droid_100", "bridge_dataset",
    "taco_play", "jaco_play", "viola",
    "stanford_hydra_dataset_converted_externally_to_rlds",
    "austin_buds_dataset_converted_externally_to_rlds", "bc_z", "dobbe",
    "cmu_stretch", "roboset", "rh20t", "tdroid_carrot_in_bowl",
    "tdroid_pour_corn_in_pot", "fractal20220817_data",
    "berkeley_autolab_ur5",
    "furniture_bench_dataset_converted_externally_to_rlds",
    "austin_sailor_dataset_converted_externally_to_rlds",
    "austin_sirius_dataset_converted_externally_to_rlds",
    "utaustin_mutex", "molmoact_dataset", "berkeley_fanuc_manipulation",
    "fmb",
    # kuka's raw states are ZLIB-compressed byte strings, which cannot ride
    # np.savez without pickling; covered by tests/test_transforms_oxe.py.
    "kuka",
}


def gen_dataset_sweep_suite(seed_offset: int = 0, fname: str = "sweep.npz"):
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import tests.test_transforms_oxe as tto

    # seed_offset != 0 fabricates a SECOND independent input set through the
    # same reference functions: different values probe different
    # clip/binarize/sign branches than the committed primary sweep.
    prev_offset = tto.SEED_OFFSET
    tto.SEED_OFFSET = seed_offset
    try:
        _gen_sweep_inner(tto, fname)
    finally:
        tto.SEED_OFFSET = prev_offset


def _gen_sweep_inner(tto, fname: str):
    sweep_map = getattr(TR, "OXE_STANDARDIZATION_TRANSFORMS")
    out = {}
    covered, skipped = [], []
    for name, fab in sorted(tto.FABRICATORS.items()):
        if name in SWEEP_SKIP or name not in sweep_map:
            continue
        episode = fab()["steps"]
        try:
            result = sweep_map[name](_to_tf(episode))
        except Exception as e:  # noqa: BLE001 - needs assets/lookups we can't fabricate
            skipped.append(f"{name}: {type(e).__name__}: {str(e)[:60]}")
            continue
        flat_in: dict = {}
        _flatten(f"{name}{SEP}in", episode, flat_in)
        flat_out: dict = {}
        _flatten(f"{name}{SEP}out", result, flat_out)
        keep = {
            k: v
            for k, v in {**flat_in, **flat_out}.items()
            if v.dtype.kind not in ("O", "U", "S")
        }
        if f"{name}{SEP}out{SEP}action" not in keep:
            skipped.append(f"{name}: no numeric action output")
            continue
        out.update(keep)
        covered.append(name)
    np.savez(OUT / fname, **out)
    print(f"{fname}: {len(covered)} datasets ({len(out)} arrays)")
    for s in skipped:
        print("  sweep-skip:", s)


# ---------------------------------------------------------------------------
# Suite 9: histogram quantiles (normalize_adapter._distributed_quantiles)
# ---------------------------------------------------------------------------


def _extract_distributed_quantiles():
    """AST-extract the nested _distributed_quantiles from the reference's
    get_dataset_statistics (normalize_adapter.py:236-268); the cross-host
    _gather_and_reduce reduces over one host here (identity)."""
    src = pathlib.Path(REF, "lap/shared/normalize_adapter.py").read_text()
    tree = ast.parse(src)
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "_distributed_quantiles":
            fn = node
            break
    assert fn is not None
    mod = ast.Module(body=[fn], type_ignores=[])
    ns = {"np": np, "_gather_and_reduce": lambda x, _op: x}
    exec(compile(mod, "normalize_adapter_extract", "exec"), ns)  # noqa: S102
    return ns["_distributed_quantiles"]


def gen_quantile_suite():
    dq = _extract_distributed_quantiles()
    rng = np.random.default_rng(13)
    out = {}
    cases = {
        "normal": rng.normal(size=(5000, 6)) * np.array([1, 0.1, 10, 1, 1, 1]),
        "skewed": np.abs(rng.normal(size=(3000, 4))) ** 3,
        "tiny": rng.uniform(-1, 1, size=(7, 3)),
        "constant_dim": np.concatenate(
            [rng.normal(size=(500, 2)), np.full((500, 1), 3.25)], axis=-1
        ),
    }
    for name, data in cases.items():
        g_min, g_max = data.min(0), data.max(0)
        out[f"q_in{SEP}{name}"] = data
        for q in (0.01, 0.99):
            out[f"q{SEP}{name}{SEP}{q}"] = dq(data, g_min, g_max, q)
    np.savez(OUT / "quantiles.npz", **out)
    print(f"quantiles.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 10: real-robot client helpers (SLERP chunks, gripper binarization)
# ---------------------------------------------------------------------------


def gen_clients_suite():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_rr_helpers", pathlib.Path(REF).parent / "scripts" / "real_robot" / "helpers.py"
    )
    H = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(H)

    rng = np.random.default_rng(21)
    out = {}

    grip_seqs = {
        "mixed": np.array([0.97, 0.5, 0.3, 0.02, 0.4, 0.99, 0.96]),
        "all_between": np.full(5, 0.5),
        "closing_tail": np.array([0.99, 0.8, 0.6, 0.02]),
    }
    for name, seq in grip_seqs.items():
        out[f"rr_grip_in{SEP}{name}"] = seq
        out[f"rr_grip{SEP}{name}"] = H.binarize_gripper_actions_np(seq.copy())

    curr_rpy = np.array([0.3, -0.2, 1.1])
    delta = np.array([0.2, 0.1, -0.6])
    out["rr_interp_curr"] = curr_rpy
    out["rr_interp_delta"] = delta
    out["rr_interp"] = H.interpolate_rpy(curr_rpy, delta, 8)
    out["rr_add_euler"] = H.add_euler(curr_rpy, rng.normal(size=(5, 3)) * 0.3)
    out["rr_add_euler_in"] = np.asarray(out["rr_add_euler"])  # placeholder, replaced below
    deltas5 = rng.normal(size=(5, 3)) * 0.3
    out["rr_add_euler_in"] = deltas5
    out["rr_add_euler"] = H.add_euler(curr_rpy, deltas5)
    out["rr_rot6d"] = H.euler_to_rot6d(curr_rpy)

    curr_pos = np.array([0.4, -0.1, 0.25])
    grip_fn = lambda a: 1 - np.asarray(a, dtype=float)[..., -1]  # noqa: E731

    post = H.ActionChunkPostProcessor(chunk_steps=8, use_quaternions=False)
    single = np.array([0.05, -0.03, 0.02, 0.1, -0.05, 0.2, 0.9])
    out["rr_single_in"] = single
    out["rr_single"] = post.process_response(
        {"actions": single}, curr_pos=curr_pos, curr_rpy=curr_rpy,
        gripper_postprocess_fn=grip_fn, orientation_interpolator_fn=H.interpolate_rpy,
    )
    chunk = rng.normal(size=(6, 7)) * np.array([0.03] * 3 + [0.1] * 3 + [0.0]) \
        + np.array([0.0] * 6 + [0.8])
    out["rr_chunk_in"] = chunk
    out["rr_chunk"] = post.process_response(
        {"actions": chunk.copy()}, curr_pos=curr_pos, curr_rpy=curr_rpy,
        gripper_postprocess_fn=grip_fn, orientation_interpolator_fn=H.interpolate_rpy,
    )
    post_q = H.ActionChunkPostProcessor(chunk_steps=8, use_quaternions=True)
    out["rr_single_quat"] = post_q.process_response(
        {"actions": single}, curr_pos=curr_pos, curr_rpy=curr_rpy,
        gripper_postprocess_fn=grip_fn, orientation_interpolator_fn=H.interpolate_rpy,
    )
    out["rr_chunk_quat"] = post_q.process_response(
        {"actions": chunk.copy()}, curr_pos=curr_pos, curr_rpy=curr_rpy,
        gripper_postprocess_fn=grip_fn, orientation_interpolator_fn=H.interpolate_rpy,
    )
    out["rr_curr_pos"] = curr_pos

    # ---- LIBERO client conversions (AST-extracted from scripts/libero) ----
    src = (pathlib.Path(REF).parent / "scripts" / "libero" / "main.py").read_text()
    tree = ast.parse(src)
    wanted = {"_quat2rot6d", "get_action_from_response", "invert_and_scale_gripper", "obs_to_request"}
    consts = [
        n for n in tree.body
        if isinstance(n, ast.Assign)
        and any(isinstance(t, ast.Name) and t.id.startswith("_OSC") for t in n.targets)
    ]
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in wanted]
    from scipy.spatial.transform import Rotation as _R

    ns = {
        "np": np,
        "R": _R,
        "PolicyType": types.SimpleNamespace(LAP="lap", LAP_AR="lap_ar"),
    }
    exec(compile(ast.Module(body=consts + fns, type_ignores=[]), "libero_extract", "exec"), ns)  # noqa: S102

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    out["lib_quat"] = q
    out["lib_rot6d"] = ns["_quat2rot6d"](q)
    ar_action = np.array([0.04, -0.02, 0.01, 0.15, -0.3, 0.25, 1.0])
    out["lib_ar_in"] = ar_action
    out["lib_ar"] = ns["get_action_from_response"](5, {"actions": ar_action}, None)
    g = np.concatenate([rng.normal(size=(6, 6)) * 0.1,
                        np.array([[0.0], [1.0], [0.5], [0.9], [0.1], [0.49]])], axis=1)
    out["lib_grip_in"] = g
    out["lib_grip"] = ns["invert_and_scale_gripper"](g.copy())
    obs = {
        "robot0_eef_pos": rng.normal(size=3) * 0.3,
        "robot0_eef_quat": q,
        "robot0_gripper_qpos": np.array([0.021, -0.021]),
    }
    req = ns["obs_to_request"](obs, "lap", img=None, wrist_img=None, task_description="t")
    out["lib_obs_pos"] = obs["robot0_eef_pos"]
    out["lib_obs_qpos"] = obs["robot0_gripper_qpos"]
    out["lib_state"] = req["observation"]["state"]

    np.savez(OUT / "clients.npz", **out)
    print(f"clients.npz: {len(out)} arrays")


# ---------------------------------------------------------------------------
# Suite 11 (round 4): the last three transform families without reference
# goldens — kuka (ZLIB-compressed raw states), bridge_orig/bridge_dataset
# (relabel_bridge_actions semantics), and ego4d/human (identity).
# ---------------------------------------------------------------------------


def gen_dataset_suite_r4():
    import zlib

    rng = np.random.default_rng(20260817)
    t = 9
    out = {}

    # --- kuka (ref transforms.py:331-400): raw pose/gripper arrive as
    # per-step ZLIB-compressed float32 byte strings. Store the plain floats
    # as fixture inputs (bytes can't ride np.savez) and compress at use time;
    # any valid ZLIB stream decodes identically through tf.io.decode_compressed.
    pos = rng.normal(size=(t, 3)).astype(np.float32) * 0.3
    quat = rng.normal(size=(t, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    pose = np.concatenate([pos, quat.astype(np.float32)], -1)  # xyz + xyzw
    grip_closed = rng.uniform(0, 1, size=t).astype(np.float32)
    # probe rel2abs branches: closes, opens, deadband-only
    act_grip = np.array([0.0, 0.9, 0.0, -0.8, 0.05, 0.0, 0.7, -0.9, 0.0], np.float32)[:, None]
    traj = {
        "observation": {
            "clip_function_input/base_pose_tool_reached": tf.constant(
                [zlib.compress(pose[i].tobytes()) for i in range(t)]
            ),
            "gripper_closed": tf.constant(
                [zlib.compress(grip_closed[i].tobytes()) for i in range(t)]
            ),
            "natural_language_instruction": tf.constant(_mk_instr(t)),
        },
        "action": {
            "world_vector": tf.constant(rng.normal(size=(t, 3)).astype(np.float32)),
            "rotation_delta": tf.constant(rng.normal(size=(t, 3)).astype(np.float32)),
            "gripper_closedness_action": tf.constant(act_grip),
        },
    }
    res = TR.kuka_dataset_transform(traj)
    out[f"kuka{SEP}in{SEP}pose"] = pose
    out[f"kuka{SEP}in{SEP}grip_closed"] = grip_closed
    out[f"kuka{SEP}in{SEP}act_grip"] = act_grip
    out[f"kuka{SEP}out{SEP}state"] = _np(res["observation"]["state"])
    out[f"kuka{SEP}out{SEP}action"] = _np(res["action"])
    out[f"kuka{SEP}out{SEP}language_action"] = _np(res["language_action"])

    # --- bridge_orig / bridge_dataset (ref transforms.py:245-272): drop-first,
    # binarize gripper, relabel actions from reached state (truncating the
    # final step), UNclipped gripper_state.
    bstate = np.zeros((t, 7), np.float32)
    bstate[:, :3] = rng.normal(size=(t, 3)) * 0.3
    bstate[:, 3:6] = rng.uniform(-np.pi, np.pi, size=(t, 3))
    bstate[:, 6] = rng.uniform(-0.1, 1.1, size=t)  # probes the no-clip contract
    bact = rng.normal(size=(t, 7)).astype(np.float32)
    bact[:, 6] = np.array([0.97, 0.5, 0.02, 0.4, 0.99, 0.6, 0.96, 0.01, 0.5])
    res = TR.bridge_orig_dataset_transform(
        {
            "observation": {"state": tf.constant(bstate)},
            "action": tf.constant(bact),
            "language_instruction": tf.constant(_mk_instr(t)),
        }
    )
    out[f"bridge_orig{SEP}in{SEP}state"] = bstate
    out[f"bridge_orig{SEP}in{SEP}action"] = bact
    out[f"bridge_orig{SEP}out{SEP}action"] = _np(res["action"])
    out[f"bridge_orig{SEP}out{SEP}EEF_state"] = _np(res["observation"]["EEF_state"])
    out[f"bridge_orig{SEP}out{SEP}gripper_state"] = _np(res["observation"]["gripper_state"])

    # --- ego4d / human (ref transforms.py:1484-1512): the transform is an
    # identity on the sample (it only prints). Pin that: numeric fields pass
    # through untouched and no action/language_action key is invented.
    hstate = rng.normal(size=(t, 4)).astype(np.float32)
    hsample = {
        "observation": {"state": tf.constant(hstate), "image": tf.constant([b"img"] * t)},
        "language_instruction": tf.constant(_mk_instr(t)),
    }
    hres = TR.human_dataset_transform(dict(hsample))
    assert set(hres) == set(hsample), (set(hres), set(hsample))
    assert set(hres["observation"]) == set(hsample["observation"])
    out[f"ego4d{SEP}in{SEP}state"] = hstate
    out[f"ego4d{SEP}out{SEP}state"] = _np(hres["observation"]["state"])
    out[f"ego4d{SEP}identity"] = np.asarray(True)

    np.savez(OUT / "datasets_r4.npz", **out)
    print(f"datasets_r4.npz: {len(out)} arrays")


def _extract_chunk_actions():
    """AST-extract the DLAP.chunk_actions method (base_dataset.py:387-427):
    the action-chunk windowing composite. Both branches use LAST-VALUE
    padding (the reference's own docstring claiming zero padding for delta
    encodings is stale); joint encodings window at h, every non-joint
    encoding (EEF_POS, EEF_R6, ABS_EEF_POS) windows at h+1 and converts to
    position diffs + euler_diff deltas with the gripper column shifted."""
    src = pathlib.Path(REF, "lap/datasets/base_dataset.py").read_text()
    tree = ast.parse(src)
    fn = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "chunk_actions":
            fn = node
            break
    assert fn is not None
    import importlib

    H = importlib.import_module("lap.datasets.utils.helpers")
    ns = {
        "tf": tf,
        "gather_with_last_value_padding": gather_with_last_value_padding,
        "euler_diff": RU.euler_diff,
    }
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "chunk_extract", "exec"), ns)  # noqa: S102
    return ns["chunk_actions"], H.ActionEncoding


def gen_chunk_suite():
    chunk_actions, ActionEncoding = _extract_chunk_actions()
    rng = np.random.default_rng(31)
    out = {}
    t, h = 9, 4
    acts = np.zeros((t, 7), np.float32)
    acts[:, :3] = rng.normal(size=(t, 3)) * 0.3
    acts[:, 3:6] = rng.uniform(-np.pi, np.pi, size=(t, 3))  # abs rpy: wraps matter
    acts[:, 6] = rng.uniform(0, 1, size=t)
    out["in_actions"] = acts
    out["in_horizon"] = np.asarray(h)
    for enc in ("EEF_POS", "EEF_R6", "ABS_EEF_POS", "JOINT_POS", "JOINT_POS_BIMANUAL"):
        fake_self = types.SimpleNamespace(action_encoding=getattr(ActionEncoding, enc))
        res = chunk_actions(fake_self, {"actions": tf.constant(acts)}, h)
        out[f"chunk{SEP}{enc}"] = _np(res["actions"])
    np.savez(OUT / "chunks.npz", **out)
    print(f"chunks.npz: {len(out)} arrays")


def gen_transform_coverage_map():
    """Dump registry key -> reference transform FUNCTION name, so the parity
    tests can assert golden coverage over distinct reference implementations
    (a new alias key can't silently fall out of the net)."""
    import json

    cov = {k: fn.__name__ for k, fn in TR.OXE_STANDARDIZATION_TRANSFORMS.items()}
    (OUT / "ref_transform_map.json").write_text(json.dumps(cov, indent=1, sort_keys=True))
    print(f"ref_transform_map.json: {len(cov)} keys, {len(set(cov.values()))} distinct fns")


def gen_lang_fill_suite():
    """Empty-language-instruction fallback (ref transform_helpers.py:89-125,
    constants.py:8-33): austin_buds + austin_sailor pick a DETERMINISTIC
    fallback — Fingerprint64(as_string(sum(state[0]))) mod 18 — over the
    REBUILT 7-dim state, and broadcast the selected instruction (original
    or fallback) to every step. austin_sirius draws randomly (not pinnable);
    its golden only records that the result is a member of the table."""
    rng = np.random.default_rng(77)
    t = 6
    out = {}

    def _bud_traj(instr0):
        astate = np.zeros((t, 24), np.float32)
        astate[:, :8] = rng.normal(size=(t, 8))
        astate[:, 7] = rng.uniform(0, 0.079, size=t)
        quat = rng.normal(size=(t, 4))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        mats = np.zeros((t, 4, 4), np.float64)
        w, x, y, z = quat.T
        mats[:, 0, 0] = 1 - 2 * (y * y + z * z)
        mats[:, 0, 1] = 2 * (x * y - z * w)
        mats[:, 0, 2] = 2 * (x * z + y * w)
        mats[:, 1, 0] = 2 * (x * y + z * w)
        mats[:, 1, 1] = 1 - 2 * (x * x + z * z)
        mats[:, 1, 2] = 2 * (y * z - x * w)
        mats[:, 2, 0] = 2 * (x * z - y * w)
        mats[:, 2, 1] = 2 * (y * z + x * w)
        mats[:, 2, 2] = 1 - 2 * (x * x + y * y)
        mats[:, :3, 3] = rng.normal(size=(t, 3)) * 0.4
        mats[:, 3, 3] = 1.0
        astate[:, -16:] = mats.transpose(0, 2, 1).reshape(t, 16).astype(np.float32)
        instrs = [instr0] + [f"step {i}" for i in range(1, t)]
        return {
            "observation": {"state": tf.constant(astate)},
            "action": tf.constant(rng.uniform(-1, 1, size=(t, 8)).astype(np.float32)),
            "language_instruction": tf.constant(instrs),
        }, astate

    # Several episodes to land in different hash buckets; plus whitespace
    # and non-empty (broadcast-only) probes.
    for i, instr0 in enumerate(["", "", "", "  \t ", "wipe the table"]):
        traj, astate = _bud_traj(instr0)
        res = TR.austin_buds_dataset_transform(traj)
        out[f"buds{i}{SEP}in{SEP}state"] = astate
        out[f"buds{i}{SEP}in{SEP}action"] = _np(traj["action"])
        out[f"buds{i}{SEP}in{SEP}instr0"] = np.asarray(instr0.encode())
        out[f"buds{i}{SEP}out{SEP}instr"] = _np(res["language_instruction"]).astype("S")

    def _se3(n):
        import math

        flats = np.zeros((n, 16), np.float32)
        eul = rng.uniform(-np.pi, np.pi, size=(n, 3))
        pos = rng.normal(size=(n, 3)) * 0.4
        for i in range(n):
            a, b, c = eul[i]
            Rx = np.array([[1, 0, 0], [0, math.cos(a), -math.sin(a)], [0, math.sin(a), math.cos(a)]])
            Ry = np.array([[math.cos(b), 0, math.sin(b)], [0, 1, 0], [-math.sin(b), 0, math.cos(b)]])
            Rz = np.array([[math.cos(c), -math.sin(c), 0], [math.sin(c), math.cos(c), 0], [0, 0, 1]])
            M = np.eye(4)
            M[:3, :3] = Rz @ Ry @ Rx
            M[:3, 3] = pos[i]
            flats[i] = M.T.flatten().astype(np.float32)
        return flats

    def _sail_traj(instr0):
        st8 = rng.normal(size=(t, 8)).astype(np.float32)
        st8[:, -1] = rng.uniform(0, 0.09, size=t)
        sact = rng.normal(size=(t, 7)).astype(np.float32)
        instrs = [instr0] + [f"step {i}" for i in range(1, t)]
        return {
            "observation": {"state": tf.constant(st8), "state_ee": tf.constant(_se3(t))},
            "action": tf.constant(sact),
            "language_instruction": tf.constant(instrs),
        }, st8

    for i, instr0 in enumerate(["", "", "hold the mug"]):
        traj, st8 = _sail_traj(instr0)
        res = TR.austin_sailor_dataset_transform(traj)
        out[f"sailor{i}{SEP}in{SEP}state"] = st8
        out[f"sailor{i}{SEP}in{SEP}state_ee"] = _np(traj["observation"]["state_ee"])
        out[f"sailor{i}{SEP}in{SEP}action"] = _np(traj["action"])
        out[f"sailor{i}{SEP}in{SEP}instr0"] = np.asarray(instr0.encode())
        out[f"sailor{i}{SEP}out{SEP}instr"] = _np(res["language_instruction"]).astype("S")

    # sirius: random fallback — pin MEMBERSHIP in the 18-string table.
    traj, _ = _sail_traj("")
    res = TR.austin_sirius_dataset_transform(traj)
    got = _np(res["language_instruction"])[0]
    from lap.datasets.utils.constants import FALLBACK_INSTRUCTIONS as _FB

    table = [s.decode() for s in _np(_FB)]
    assert got.decode() in table, got
    out[f"fallback_table"] = np.asarray([s.encode() for s in table])

    np.savez(OUT / "lang_fill.npz", **out)
    print(f"lang_fill.npz: {len(out)} arrays")


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    sum_actions = _extract_base_dataset_fns()
    gen_quantile_suite()
    gen_clients_suite()
    gen_rotation_suite()
    gen_helpers_suite()
    gen_langact_suite(sum_actions)
    gen_dataset_suite()
    gen_dataset_suite_r4()
    gen_lang_fill_suite()
    gen_chunk_suite()
    gen_transform_coverage_map()
    gen_image_suite()
    gen_policy_suite()
    gen_stats_suite()
    gen_dataset_sweep_suite()
    gen_dataset_sweep_suite(seed_offset=20260818, fname="sweep_s2.npz")
    print("done:", sorted(p.name for p in OUT.iterdir()))


if __name__ == "__main__":
    main()
