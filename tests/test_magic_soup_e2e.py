"""Pretraining-mixture integration: the full 16-member oxe_magic_soup plus a
VQA dataset, fabricated on disk, through the real loader into a train step.

Exercises: per-dataset standardization (incl. TFDS slash-key layouts after
the TFRecord round-trip), the full-pass norm-stats sweep with state-type
grouping, frame-count balance weights, weighted sampling across 17 members,
VQA mixing, the threaded transform tail, and one optimizer update.
"""

import dataclasses

import jax
import numpy as np
import pytest

import tests.test_transforms_oxe as tto
from lap_tpu.data import rlds
from lap_tpu.data.episode_pipeline import encode_jpeg
from lap_tpu.data.mixtures import OXE_NAMED_MIXTURES

MEMBERS = [name for name, _ in OXE_NAMED_MIXTURES["oxe_magic_soup"]]
FAB_ALIAS = {"bridge_v2_oxe": "bridge_dataset"}


@pytest.fixture(scope="module")
def soup_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("soup")
    rng = np.random.default_rng(0)
    # Swap the schema-only fake image bytes for real jpegs: the full loader
    # decodes them after the shuffle buffer.
    orig_imgs = tto.IMGS
    tto.IMGS = [encode_jpeg(rng.integers(0, 255, (48, 48, 3), np.uint8)) for _ in range(tto.T)]
    try:
        for name in MEMBERS:
            fab = tto.FABRICATORS[FAB_ALIAS.get(name, name)]
            rlds.write_rlds_dataset(root, name, [fab() for _ in range(3)])
    finally:
        tto.IMGS = orig_imgs
    coco = [
        {
            "image": [encode_jpeg(rng.integers(0, 255, (48, 48, 3), np.uint8))],
            "captions": {"text": ["a cat on a mat"]},
        }
        for _ in range(3)
    ]
    rlds.write_rlds_dataset(root, "coco_captions", coco)
    return root


def test_magic_soup_mixture_to_train_step(soup_dir):
    from lap_tpu.data.loader import create_data_loader
    from lap_tpu.training import config as _config
    from lap_tpu.training.optimizer import AdamW, CosineDecaySchedule, create_optimizer
    from lap_tpu.training.train_step import make_step_functions

    OXE_NAMED_MIXTURES["magic_soup_test"] = OXE_NAMED_MIXTURES["oxe_magic_soup"] + [
        ("coco_captions", 0.5)
    ]
    try:
        cfg = _config.get_config("debug")
        # Production configs use action_dim=32 >= every dataset's native dim;
        # the bimanual members (14-dim state -> 17 after rot6d) need the same
        # headroom here.
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, action_dim=20),
            batch_size=8,
            data=dataclasses.replace(
                cfg.data,
                repo_id="soup",
                data_mix="magic_soup_test",
                rlds_data_dir=str(soup_dir),
                val_fraction=0.0,
                shuffle_buffer_size=64,
            ),
        )
        loader = create_data_loader(cfg, None)
        assert len(loader.dataset.datasets) == len(MEMBERS) + 1

        it = iter(loader)
        batches = [next(it) for _ in range(4)]
        it.close()
        obs, actions = batches[0]
        assert actions.shape == (8, cfg.model.action_horizon, cfg.model.action_dim)
        assert np.isfinite(np.asarray(actions)).all()
        # The weighted mixture actually mixes: multiple dataset ids sampled.
        names = np.concatenate(
            [np.asarray(b[0].tokenized_dataset_name) for b in batches]
        )
        assert len(np.unique(names, axis=0)) >= 3

        # Stats cover every robot member with grouped state types.
        stats = loader.norm_stats
        assert "actions" in stats and "state" in stats

        model = cfg.model.create_module()
        tx = create_optimizer(
            AdamW(), CosineDecaySchedule(warmup_steps=2, peak_lr=1e-3, decay_steps=10)
        )
        steps = make_step_functions(model, tx)
        state = steps.init_fn(jax.random.PRNGKey(0))
        state, metrics = jax.jit(steps.train_step)(
            jax.random.PRNGKey(0), state, batches[0]
        )
        assert np.isfinite(float(metrics["loss"]))
    finally:
        OXE_NAMED_MIXTURES.pop("magic_soup_test", None)
