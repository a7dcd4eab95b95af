"""DROID metadata tables: the reference's on-disk formats and filter
semantics (reference droid_mixins.py + droid_dataset.py + helpers.py)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from lap_tpu.data.droid import (
    DroidMetadata,
    droid_frame_filter,
    extract_episode_path_from_file_path,
    make_droid_standardize_fn,
)

T = 10


def _episode(file_path=None, folder=None, n_instr=3, instr="do the task"):
    rng = np.random.default_rng(0)
    imgs = [b"\x89PNG-fake"] * T
    steps = {
        "observation": {
            "exterior_image_1_left": imgs,
            "exterior_image_2_left": [b"cam2"] * T,
            "wrist_image_left": imgs,
            "cartesian_position": rng.normal(size=(T, 6)).astype(np.float32),
            "gripper_position": rng.uniform(0, 1, size=(T, 1)).astype(np.float32),
        },
        "action": rng.normal(size=(T, 7)).astype(np.float32),
        "action_dict": {
            "gripper_position": rng.uniform(0, 1, size=(T, 1)).astype(np.float32)
        },
        "language_instruction": [instr] * T,
    }
    for i in range(2, n_instr + 1):
        steps[f"language_instruction_{i}"] = [f"{instr} v{i}"] * T
    ep = {"steps": steps}
    meta = {}
    if file_path is not None:
        meta["file_path"] = [file_path.encode()]
    if folder is not None:
        meta["recording_folderpath"] = [folder.encode()]
    if meta:
        ep["episode_metadata"] = meta
    return ep


def test_extract_episode_path_reference_regex():
    # Reference helpers.py:61-80: strip up to r2d2-data(-full)/, trim
    # /trajectory onwards.
    assert (
        extract_episode_path_from_file_path(
            "gs://bucket/r2d2-data/TRI/success/2023-07-01/Thu_x/trajectory.h5"
        )
        == "TRI/success/2023-07-01/Thu_x"
    )
    assert (
        extract_episode_path_from_file_path(
            "/mnt/r2d2-data-full/AUTOLab/success/ep1/trajectory_im128.h5"
        )
        == "AUTOLab/success/ep1"
    )
    # No prefix / no suffix: passthrough of the respective part.
    assert extract_episode_path_from_file_path("a/b/c") == "a/b/c"
    assert extract_episode_path_from_file_path("x/trajectory/t.h5") == "x"


@pytest.fixture()
def meta_dir(tmp_path):
    """Reference layout: data under .../OXE, metadata under .../metadata
    (droid_mixins.py:78-89)."""
    data_dir = tmp_path / "droid" / "OXE"
    data_dir.mkdir(parents=True)
    mdir = tmp_path / "droid" / "metadata"
    mdir.mkdir()
    # Reference file is {episode_id: episode_path}, inverted at load.
    (mdir / "episode_id_to_path.json").write_text(
        json.dumps({"ep0": "TRI/success/2023-07-01/run0", "ep1": "TRI/success/2023-07-01/run1"})
    )
    (mdir / "droid_language_annotations.json").write_text(
        json.dumps(
            {
                "ep0": {"language_instruction1": "pick up the cup"},
                "ep1": {"language_instruction1": "", "language_instruction2": ""},
            }
        )
    )
    fp0 = "gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5"
    (mdir / "keep_ranges_1_0_1.json").write_text(
        json.dumps({f"rec/folder0--{fp0}": [[2, 5], [7, 8]]})
    )
    return data_dir


def test_episode_id_lookup_uses_extracted_path(meta_dir):
    md = DroidMetadata(meta_dir)
    ep = _episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5")
    assert md.episode_id(ep) == "ep0"
    # Unknown path -> the reference's default_ep_value "".
    assert md.episode_id(_episode(file_path="gs://b/r2d2-data/nope/trajectory.h5")) == ""


def test_success_and_instruction_filters(meta_dir):
    fn = make_droid_standardize_fn(meta_dir, seed=0)
    ok = _episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5")
    assert fn(ok) is not None
    # Non-success path dropped (droid_dataset.py:216-218).
    fail = _episode(file_path="gs://b/r2d2-data/TRI/failure/2023-07-01/run0/trajectory.h5")
    assert fn(fail) is None
    # ep1 has only empty annotations -> has-instruction filter drops it
    # (droid_dataset.py:221-229), even though the traj itself has text.
    no_instr = _episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run1/trajectory.h5")
    assert fn(no_instr) is None


def test_annotations_without_id_map_is_permissive(meta_dir):
    """Annotations present but episode_id_to_path.json absent: the filter
    cannot be keyed (every episode_id() is ""), so it must degrade to
    permissive instead of silently dropping EVERY trajectory."""
    mdir = meta_dir.parent / "metadata"
    (mdir / "episode_id_to_path.json").unlink()
    fn = make_droid_standardize_fn(meta_dir, seed=0)
    ok = _episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5")
    assert fn(ok) is not None


def test_instruction_chosen_from_trajectorys_own_fields(meta_dir):
    # The reference shuffles the traj's three language fields and picks one
    # (droid_dataset.py:113-120); the annotation file is never a source.
    fn = make_droid_standardize_fn(meta_dir, seed=0)
    picks = set()
    for seed in range(8):
        fn_s = make_droid_standardize_fn(meta_dir, seed=seed)
        ep = _episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5")
        traj = fn_s(ep)
        assert traj is not None
        instr = traj["language_instruction"][0]
        assert instr in {"do the task", "do the task v2", "do the task v3"}
        picks.add(instr)
    assert len(picks) > 1  # actually random across seeds
    # Deterministic per (seed, episode).
    a = fn(_episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5"))
    b = fn(_episode(file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5"))
    assert a["language_instruction"] == b["language_instruction"]


def test_keep_ranges_keyed_by_folder_and_path(meta_dir):
    fn = make_droid_standardize_fn(meta_dir, seed=0)
    ep = _episode(
        file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5",
        folder="rec/folder0",
    )
    traj = fn(ep)
    mask = traj["frame_keep_mask"]
    expect = np.zeros(T, bool)
    expect[2:5] = True
    expect[7:8] = True
    np.testing.assert_array_equal(mask, expect)
    # Episode absent from the table -> ALL frames dropped (the reference
    # table's default is False, droid_mixins.py:136-139).
    other = _episode(
        file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run1/trajectory.h5",
        folder="rec/folder1",
    )
    # run1 has empty annotations; use ep0's id path but a different folder so
    # the keep-ranges key misses while the instruction filter passes.
    other2 = _episode(
        file_path="gs://b/r2d2-data/TRI/success/2023-07-01/run0/trajectory.h5",
        folder="rec/other",
    )
    traj2 = fn(other2)
    assert not traj2["frame_keep_mask"].any()
    # The frame filter consumes the mask per-frame.
    assert droid_frame_filter({"frame_keep_mask": True}) is True
    assert droid_frame_filter({"frame_keep_mask": False}) is False
    assert droid_frame_filter({}) is True


def test_permissive_without_metadata(tmp_path):
    # No metadata dir at all: fabricated episodes flow through untouched
    # except the success filter (which needs a file_path to act).
    data_dir = tmp_path / "plain"
    data_dir.mkdir()
    fn = make_droid_standardize_fn(data_dir, seed=0)
    traj = fn(_episode())
    assert traj is not None
    assert "frame_keep_mask" not in traj
