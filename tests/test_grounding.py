"""Robot-frame grounding QA: table builders, key extractors, direction
semantics, and end-to-end emission in the episode pipeline
(reference vqa/bbox/table_builder.py, key_extractors.py, direction.py)."""

import json

import numpy as np
import pytest

from lap_tpu.data import grounding


def test_key_extractors():
    droid = {"episode_metadata": {"file_path": "/x/r2d2-data-full/lab1/success/ep3/trajectory.h5"}}
    assert grounding.droid_key_extractor(droid) == "lab1/success/ep3"
    oxe = {"episode_metadata": {"file_path": "/data/shard-0001"}}
    assert grounding.oxe_key_extractor(oxe) == "/data/shard-0001"
    bridge = {"episode_metadata": {"file_path": "/b/out.npy", "episode_id": 7}}
    assert grounding.bridge_key_extractor(bridge) == "/b/out.npy::7"
    assert grounding.bridge_key_extractor({"episode_metadata": {"file_path": "/b"}}) is None


@pytest.mark.parametrize(
    "center,expect",
    [
        ((0.5, 0.1), "forward"),
        ((0.5, 0.9), "back"),
        ((0.95, 0.5), "right"),
        ((0.05, 0.5), "left"),
        ((0.2, 0.2), "left"),
        ((0.8, 0.8), "right"),
    ],
)
def test_direction_from_bbox(center, expect):
    cx, cy = center
    d = grounding.compute_direction_from_bbox(cx - 0.01, cy - 0.01, cx + 0.01, cy + 0.01)
    assert d == expect
    assert grounding.compute_direction_from_bbox(
        cx - 0.01, cy - 0.01, cx + 0.01, cy + 0.01, add_move_prefix=True
    ) == f"move {expect}"


def test_direction_diagonals_at_unit_slope():
    # With slope=1 the diagonal bands collapse to the exact diagonals; just
    # inside them the compound labels appear.
    d = grounding.compute_direction_from_bbox(0.19, 0.21, 0.21, 0.23, slope=1.5)
    assert d in ("left and forward", "left", "forward")


def test_rotate_direction_180():
    assert grounding.rotate_direction_180("move forward") == "move back"
    assert grounding.rotate_direction_180("left and back") == "right and forward"


def _write_annotations(tmp_path, episode_key_path: str):
    ann_dir = tmp_path / "ann"
    ann_dir.mkdir()
    line = {
        "episode_metadata": {"file_path": episode_key_path},
        "labels": [
            {
                "frame": 1,
                "all_objects": [
                    {"label": "red mug", "bbox": [100, 200, 300, 400], "is_target": True},
                    {"label": "plate", "bbox": [500, 500, 700, 800], "is_target": False},
                    {"label": "", "bbox": [0, 0, 1, 1]},  # dropped: no label
                    {"label": "bad", "bbox": [1, 2, 3]},  # dropped: not 4 coords
                ],
            }
        ],
    }
    (ann_dir / "a.jsonl").write_text(json.dumps(line) + "\n")
    return ann_dir


def test_build_frame_objects_table(tmp_path):
    ann_dir = _write_annotations(tmp_path, "/data/ep0")
    table = grounding.build_frame_objects_table(ann_dir, grounding.oxe_key_extractor)
    assert list(table) == ["/data/ep0--1"]
    objs = table["/data/ep0--1"]
    assert [o["label"] for o in objs] == ["red mug", "plate"]
    assert objs[0]["loc_tokens"].count("<loc") == 4
    assert objs[0]["direction"].startswith("move ")
    # target_only keeps only is_target objects
    t2 = grounding.build_frame_objects_table(
        ann_dir, grounding.oxe_key_extractor, target_only=True
    )
    assert [o["label"] for o in t2["/data/ep0--1"]] == ["red mug"]
    assert grounding.build_annotated_keys_set(table) == {"/data/ep0"}


def test_make_grounding_qa():
    rng = np.random.default_rng(0)
    objs = [
        {"label": "cup", "bbox": (0.1, 0.1, 0.3, 0.3),
         "loc_tokens": "<loc0102><loc0102><loc0306><loc0306>", "direction": "move left and forward"},
    ]
    prompt, caption = grounding.make_grounding_qa(objs, rng)
    assert "cup" in prompt and "<loc" in caption
    prompt, caption = grounding.make_grounding_qa(objs, rng, direction_prob=1.0)
    assert caption == "move left and forward"


def test_pipeline_emits_grounding_qa(tmp_path):
    """End-to-end: an annotated robot episode yields grounding QA frames."""
    from lap_tpu.data import transforms_oxe  # noqa: F401 - registers transforms
    from lap_tpu.data.episode_pipeline import EpisodePipeline, PipelineConfig, encode_jpeg
    from lap_tpu.data.registry import get_dataset_config

    rng = np.random.default_rng(0)
    t = 4
    episode = {
        "episode_metadata": {"file_path": "/data/ep0"},
        "steps": {
            "observation": {
                "image": [encode_jpeg(rng.integers(0, 255, (32, 32, 3), np.uint8)) for _ in range(t)],
                "state": rng.uniform(-0.3, 0.3, (t, 7)).astype(np.float32),
            },
            "action": rng.uniform(-0.1, 0.1, (t, 7)).astype(np.float32),
            "language_instruction": ["pick up the mug"] * t,
        },
    }
    ann_dir = _write_annotations(tmp_path, "/data/ep0")
    table = grounding.build_frame_objects_table(ann_dir, grounding.oxe_key_extractor)
    pipe = EpisodePipeline(
        PipelineConfig(action_horizon=2, action_dim=7, state_dim=7, seed=0),
        standardize_fn=get_dataset_config("generic_test_ds").standardize_fn,
        dataset_name="generic_test_ds",
        grounding_table=table,
        grounding_key_fn=grounding.oxe_key_extractor,
        grounding_prob=1.0,
    )
    frames = list(pipe.process_episode(episode))
    assert len(frames) == t
    qa_frames = [f for f in frames if f["is_vqa_sample"]]
    assert len(qa_frames) == 1  # only frame 1 is annotated
    f = qa_frames[0]
    assert "<loc" in f["caption"]
    assert "mug" in f["prompt"] or "plate" in f["prompt"]
