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
