import numpy as np
import pytest

from lap_tpu.data import bbox, rlds
from lap_tpu.data.episode_pipeline import encode_jpeg
from lap_tpu.data.vqa import CocoCaptionDataset, VQAv2Dataset, build_vqa_dataset
from lap_tpu.data.registry import VQA_DATASET_ID_MAP


def test_bbox_loc_tokens_roundtrip():
    text = bbox.bbox_to_loc_tokens(0.1, 0.2, 0.8, 0.9)
    assert text.count("<loc") == 4
    back = bbox.loc_tokens_to_bbox(text)
    np.testing.assert_allclose(back, [0.1, 0.2, 0.8, 0.9], atol=1e-3)


def test_bbox_rotation():
    text = bbox.bbox_to_loc_tokens(0.1, 0.2, 0.3, 0.4)
    rotated = bbox.rotate_bbox_loc_tokens_180(text)
    back = bbox.loc_tokens_to_bbox(rotated)
    np.testing.assert_allclose(back, [0.7, 0.6, 0.9, 0.8], atol=1e-3)
    # Double rotation = identity.
    twice = bbox.rotate_bbox_loc_tokens_180(rotated)
    np.testing.assert_allclose(bbox.loc_tokens_to_bbox(twice), [0.1, 0.2, 0.3, 0.4], atol=2e-3)


def test_letterbox_bbox():
    # Wide image 100x200 into 224: full-width box maps to full width.
    out = bbox.letterbox_bbox(np.array([0.0, 0.0, 1.0, 1.0]), 100, 200, 224)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[3], 1.0, atol=1e-2)
    assert out[0] > 0.2 and out[2] < 0.8  # vertically padded


def test_direction_caption():
    assert bbox.direction_caption(np.array([0.0, 0.0, 0.2, 0.2])) == "at the top left"
    assert bbox.direction_caption(np.array([0.4, 0.4, 0.6, 0.6])) == "in the center"
    assert bbox.direction_caption(np.array([0.8, 0.4, 1.0, 0.6])) == "at the bottom"


def test_make_bbox_qa():
    rng = np.random.default_rng(0)
    objects = [{"name": "cup", "bbox": np.array([0.1, 0.1, 0.5, 0.5])}]
    prompt, answer = bbox.make_bbox_qa(objects, rng)
    assert "cup" in prompt
    assert answer.startswith("<loc")
    prompt, answer = bbox.make_bbox_qa(objects, rng, direction_prob=1.0)
    assert "<loc" not in answer


def test_vqa_dataset_ids_assigned():
    assert VQA_DATASET_ID_MAP["coco_captions"] >= 1
    assert len(set(VQA_DATASET_ID_MAP.values())) == len(VQA_DATASET_ID_MAP)


@pytest.fixture(scope="module")
def vqa_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa")
    rng = np.random.default_rng(0)
    coco = [
        {
            "image": [encode_jpeg(rng.integers(0, 255, (64, 64, 3), np.uint8))],
            "captions": {"text": ["a cat on a mat", "feline resting"]},
        }
        for _ in range(3)
    ]
    rlds.write_rlds_dataset(root, "coco_captions", coco)
    vqav2 = [
        {
            "image": [encode_jpeg(rng.integers(0, 255, (64, 64, 3), np.uint8))],
            "question": ["what color is the sky?"],
            "answers": {"text": ["blue"]},
        }
        for _ in range(3)
    ]
    rlds.write_rlds_dataset(root, "vqa", vqav2)
    return root


def test_coco_frames(vqa_dir):
    ds = CocoCaptionDataset(data_dir=str(vqa_dir), name="coco_captions",
                            resize_resolution=(56, 56), repeat=False)
    frames = list(ds)
    assert len(frames) == 3
    f = frames[0]
    assert f["is_vqa_sample"] is True
    assert f["vqa_dataset_id"] == VQA_DATASET_ID_MAP["coco_captions"]
    assert f["observation"]["base_0_rgb"].shape == (56, 56, 3)
    assert f["caption"] in ("a cat on a mat", "feline resting")


def test_vqav2_frames(vqa_dir):
    ds = build_vqa_dataset("vqa", data_dir=str(vqa_dir), resize_resolution=(56, 56), repeat=False)
    assert isinstance(ds, VQAv2Dataset)
    frames = list(ds)
    assert frames[0]["prompt"] == "what color is the sky?"
    assert frames[0]["caption"] == "blue"
