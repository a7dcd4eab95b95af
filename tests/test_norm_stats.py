"""Norm-stats fidelity: sharded merge equals full pass; state-type grouping;
frame-count balance weights (reference statistics.py / dataset_mixer.py)."""

import dataclasses
import json

import numpy as np

from lap_tpu.data.norm_stats import RunningStats, merge_norm_stats


def test_merge_equals_full_pass_moments():
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, (10_000, 5))
    full = RunningStats(5)
    full.update(data)
    full_stats = full.finalize()

    halves = []
    for part in np.split(data, [4_000]):
        t = RunningStats(5)
        t.update(part)
        halves.append(t.finalize())
    merged = merge_norm_stats(halves, dim=5)

    np.testing.assert_allclose(merged.mean, full_stats.mean, rtol=1e-5)
    np.testing.assert_allclose(merged.std, full_stats.std, rtol=1e-5)
    np.testing.assert_array_equal(merged.min, full_stats.min)
    np.testing.assert_array_equal(merged.max, full_stats.max)
    assert merged.num_transitions == 10_000
    # Quantiles take the envelope across members.
    assert (merged.q01 <= full_stats.q01 + 1e-3).all()
    assert (merged.q99 >= full_stats.q99 - 1e-3).all()


def test_merge_weights_by_transitions():
    a = RunningStats(2)
    a.update(np.zeros((100, 2)))
    b = RunningStats(2)
    b.update(np.ones((300, 2)))
    merged = merge_norm_stats([a.finalize(), b.finalize()], dim=2)
    np.testing.assert_allclose(merged.mean, [0.75, 0.75])


def _episode(rng, t=6, scale=1.0):
    from lap_tpu.data.episode_pipeline import encode_jpeg

    imgs = [encode_jpeg(rng.integers(0, 255, (32, 32, 3), np.uint8)) for _ in range(t)]
    return {
        "steps": {
            "observation": {
                "image": imgs,
                "state": (rng.uniform(-0.3, 0.3, (t, 7)) * scale).astype(np.float32),
            },
            "action": (rng.uniform(-0.2, 0.2, (t, 7)) * scale).astype(np.float32),
            "language_instruction": ["go"] * t,
        }
    }


def test_mixture_stats_grouping_and_balance_weights(tmp_path):
    from lap_tpu.data import rlds
    from lap_tpu.data.mixer import build_rlds_dataset, compute_mixture_norm_stats
    from lap_tpu.training import config as _config

    rng = np.random.default_rng(3)
    rlds.write_rlds_dataset(tmp_path, "tiny_eef_ds", [_episode(rng) for _ in range(3)])
    rlds.write_rlds_dataset(
        tmp_path, "yam_jointpos_dataset", [_episode(rng, t=9) for _ in range(2)]
    )

    cfg = _config.get_config("debug")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data,
            repo_id="mix",
            data_mix="mix_test",
            rlds_data_dir=str(tmp_path),
            val_fraction=0.0,
        ),
    )
    from lap_tpu.data.mixtures import OXE_NAMED_MIXTURES

    OXE_NAMED_MIXTURES["mix_test"] = [("tiny_eef_ds", 1.0), ("yam_jointpos_dataset", 1.0)]
    try:
        members = OXE_NAMED_MIXTURES["mix_test"]
        stats, transitions = compute_mixture_norm_stats(cfg, members)
        # Grouped state stats: one eef dataset, one joint dataset.
        assert "state_eef_pose" in stats and "state_joint_pos" in stats
        assert "actions" in stats and "state" in stats
        # Full pass (no cap): every transition counted.
        assert transitions == {"tiny_eef_ds": 18, "yam_jointpos_dataset": 18}
        # Action rows = frames * horizon (4 in the debug config).
        assert stats["actions"].num_transitions == 36 * cfg.model.action_horizon

        # Balance weights from the stats pass use FRAME counts via the cache.
        mixture, loaded_stats = build_rlds_dataset(cfg, split="train")
        cache = tmp_path / "norm_stats_cache" / "mix_test.json"
        assert json.loads(cache.read_text())["per_dataset_transitions"] == transitions
        assert set(np.round(mixture.probs, 6)) == {0.5}  # 18 vs 18 frames
    finally:
        OXE_NAMED_MIXTURES.pop("mix_test", None)
