import dataclasses

import jax
import numpy as np
import pytest

from lap_tpu.data import rlds
from lap_tpu.data.episode_pipeline import encode_jpeg
from lap_tpu.data.mixer import build_rlds_dataset
from lap_tpu.data.registry import get_dataset_config


def _make_libero_episode(rng, t=12):
    imgs = [encode_jpeg(rng.integers(0, 255, (64, 64, 3), np.uint8)) for _ in range(t)]
    wrist = [encode_jpeg(rng.integers(0, 255, (64, 64, 3), np.uint8)) for _ in range(t)]
    # libero raw state: [xyz(3), axis-angle(3), gripper_qpos(2)]
    state = np.concatenate(
        [
            rng.uniform(-0.3, 0.3, (t, 3)),
            rng.uniform(-0.5, 0.5, (t, 3)),
            rng.uniform(0, 0.04, (t, 2)),
        ],
        axis=-1,
    ).astype(np.float32)
    # libero action: [delta xyzrpy(6), gripper in -1..1]
    action = np.concatenate(
        [rng.uniform(-0.02, 0.02, (t, 6)), rng.choice([-1.0, 1.0], (t, 1))], axis=-1
    ).astype(np.float32)
    return {
        "steps": {
            "observation": {"image": imgs, "wrist_image": wrist, "state": state},
            "action": action,
            "language_instruction": ["put the bowl on the plate"] * t,
        }
    }


@pytest.fixture(scope="module")
def libero_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rlds")
    rng = np.random.default_rng(0)
    episodes = [_make_libero_episode(rng) for _ in range(4)]
    for name in (
        "libero_10_no_noops",
        "libero_goal_no_noops",
        "libero_object_no_noops",
        "libero_spatial_no_noops",
    ):
        rlds.write_rlds_dataset(root, name, episodes)
    return root


def test_rlds_reader_roundtrip(libero_dir):
    reader = rlds.RLDSReader(libero_dir, "libero_10_no_noops")
    eps = list(reader.episodes("train"))
    assert len(eps) == 4
    ep = eps[0]
    assert ep["steps"]["action"].shape == (12, 7)
    assert len(ep["steps"]["observation"]["image"]) == 12
    assert isinstance(ep["steps"]["observation"]["image"][0], bytes)
    assert ep["steps"]["language_instruction"][0] == "put the bowl on the plate"


def test_registry_libero_match():
    cfg = get_dataset_config("libero_10_no_noops")
    assert cfg.standardize_fn.__name__ == "libero_dataset_transform"
    cfg2 = get_dataset_config("droid_100")
    assert cfg2.needs_wrist_rotation


def _train_config(libero_dir):
    from lap_tpu.training.config import get_config

    cfg = get_config("debug")
    return dataclasses.replace(
        cfg,
        batch_size=4,
        data=dataclasses.replace(
            cfg.data,
            repo_id="libero",
            data_mix="libero_finetune",
            rlds_data_dir=str(libero_dir),
            shuffle_buffer_size=32,
            val_fraction=0.0,
            resize_resolution=(56, 56),
        ),
        model=dataclasses.replace(cfg.model, image_resolution=(56, 56)),
    )


def test_mixture_and_norm_stats(libero_dir):
    tc = _train_config(libero_dir)
    dataset, stats = build_rlds_dataset(tc, split="train")
    assert "actions" in stats and "state" in stats
    assert stats["actions"].q99.shape[-1] == tc.model.action_dim
    from lap_tpu.data.episode_pipeline import make_image_decoder

    decode = make_image_decoder(tc.data.resize_resolution)
    frames = []
    it = iter(dataset)
    for _ in range(8):
        frames.append(decode(next(it)))
    f = frames[0]
    assert f["observation"]["base_0_rgb"].shape == (56, 56, 3)
    assert f["actions"].shape == (tc.model.action_horizon, tc.model.action_dim)
    assert f["language_actions"].shape == (7,)
    assert isinstance(f["prompt"], str)
    # Norm-stats cache was written.
    assert (libero_dir / "norm_stats_cache" / "libero_finetune.json").exists()


def test_full_rlds_train_step(libero_dir):
    """End to end: RLDS on disk -> mixture -> loader -> one train step."""
    from lap_tpu.data.loader import create_data_loader
    from lap_tpu.training.optimizer import AdamW, CosineDecaySchedule, create_optimizer
    from lap_tpu.training.train_step import make_step_functions

    tc = _train_config(libero_dir)
    loader = create_data_loader(tc, mesh=None, split="train")
    it = iter(loader)
    obs, actions = next(it)
    assert actions.shape == (4, tc.model.action_horizon, tc.model.action_dim)
    assert obs.tokenized_prompt.shape[0] == 4
    # Normalized actions should be roughly in [-1, 1] (q99 normalization).
    assert np.abs(np.asarray(actions)).max() < 3.0

    model = tc.model.create_module()
    tx = create_optimizer(AdamW(), CosineDecaySchedule(warmup_steps=2, peak_lr=1e-3, decay_steps=10))
    steps = make_step_functions(model, tx)
    state = steps.init_fn(jax.random.PRNGKey(0))
    state, metrics = jax.jit(steps.train_step)(jax.random.PRNGKey(0), state, (obs, actions))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["lang_loss"]) > 0
