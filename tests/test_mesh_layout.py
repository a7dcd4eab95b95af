"""Host-aware mesh layout (reference mh_sharding.py:27-60) and sharded
checkpoint restore for eval."""

import dataclasses

import jax
import numpy as np

from lap_tpu.parallel.mesh import _host_aware_layout


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    process_index: int


def _devices(hosts: int, per_host: int):
    return [FakeDev(h * per_host + i, h) for h in range(hosts) for i in range(per_host)]


def test_intra_host_fsdp_groups_never_cross_hosts():
    grid = _host_aware_layout(_devices(4, 4), fsdp_devices=2, tp_devices=1)
    assert grid.shape == (8, 2, 1)
    for row in grid.reshape(8, 2):
        assert len({d.process_index for d in row}) == 1


def test_cross_host_fsdp_groups_are_whole_hosts():
    # fsdp=8 with 4 devices/host -> each group = exactly 2 whole hosts.
    grid = _host_aware_layout(_devices(4, 4), fsdp_devices=8, tp_devices=1)
    assert grid.shape == (2, 8, 1)
    host_sets = [sorted({d.process_index for d in row}) for row in grid.reshape(2, 8)]
    assert host_sets == [[0, 1], [2, 3]]
    # No host appears in two groups.
    assert not (set(host_sets[0]) & set(host_sets[1]))


def test_pure_fsdp_uses_all_hosts():
    grid = _host_aware_layout(_devices(2, 4), fsdp_devices=8, tp_devices=1)
    assert grid.shape == (1, 8, 1)


def test_single_host_defers_to_topology_mesh():
    assert _host_aware_layout(_devices(1, 8), fsdp_devices=2, tp_devices=1) is None


def test_infeasible_layouts_return_none():
    # 4 devices/host, model group of 3 doesn't divide.
    assert _host_aware_layout(_devices(2, 4), fsdp_devices=3, tp_devices=1) is None


def test_tp_innermost_within_host():
    grid = _host_aware_layout(_devices(2, 8), fsdp_devices=2, tp_devices=2)
    assert grid.shape == (4, 2, 2)
    for group in grid.reshape(4, 4):
        assert len({d.process_index for d in group}) == 1


# ---------------------------------------------------------------------------
# Sharded / partial checkpoint restore (eval path)
# ---------------------------------------------------------------------------


def _tiny_state():
    import jax.numpy as jnp

    from lap_tpu.training.state import TrainState

    return TrainState(
        step=jnp.asarray(2),
        params={"w": jnp.arange(16.0).reshape(4, 4), "b": jnp.ones(4)},
        opt_state={"m": jnp.zeros((4, 4)), "v": jnp.zeros((4, 4))},
        ema_params={"w": jnp.full((4, 4), 2.0), "b": jnp.full(4, 3.0)},
    )


def test_restore_params_sharded_and_partial(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from lap_tpu.training.checkpoints import (
        CheckpointManager,
        restore_params_sharded,
    )

    mgr = CheckpointManager(tmp_path / "ck")
    mgr.save(2, _tiny_state())
    mgr.wait_until_finished()

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("fsdp",))
    shardings = {
        "w": NamedSharding(mesh, PartitionSpec("fsdp")),
        "b": NamedSharding(mesh, PartitionSpec()),
    }
    # The `params` item holds EMA weights ({'params': tree} wrapper).
    params = restore_params_sharded(tmp_path / "ck" / "2" / "params", shardings)
    np.testing.assert_allclose(np.asarray(params["w"]), np.full((4, 4), 2.0))
    assert params["w"].sharding.spec == PartitionSpec("fsdp")

    # Partial restore of ONLY the raw params subtree from train_state
    # (optimizer state must not be read); the wrapper is auto-unwrapped.
    raw = restore_params_sharded(
        tmp_path / "ck" / "2" / "train_state", {"params": shardings}, partial=True
    )
    assert set(raw.keys()) == {"w", "b"}
    np.testing.assert_allclose(np.asarray(raw["w"]), np.arange(16.0).reshape(4, 4))
    assert raw["w"].sharding.spec == PartitionSpec("fsdp")
