import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec

from lap_tpu.parallel import (
    activation_sharding_constraint,
    data_sharding,
    fsdp_sharding,
    make_mesh,
    pick_fsdp_devices,
    set_mesh,
)


def test_mesh_shapes():
    mesh = make_mesh(fsdp_devices=4)
    assert mesh.shape == {"dp": 2, "fsdp": 4, "tp": 1}
    mesh = make_mesh(fsdp_devices=2, tp_devices=2)
    assert mesh.shape == {"dp": 2, "fsdp": 2, "tp": 2}


def test_mesh_invalid():
    with pytest.raises(ValueError):
        make_mesh(fsdp_devices=3)  # 8 % 3 != 0


def test_pick_fsdp_devices():
    assert pick_fsdp_devices(16, 8) == 8
    assert pick_fsdp_devices(3, 8) == 2
    assert pick_fsdp_devices(1, 8) == 1
    assert pick_fsdp_devices(5, 12) == 4


def test_fsdp_sharding_rules():
    mesh = make_mesh(fsdp_devices=8)
    tree = {
        "big": jax.ShapeDtypeStruct((1024, 2048), jnp.float32),  # 8 MiB -> shard
        "small": jax.ShapeDtypeStruct((16, 16), jnp.float32),  # tiny -> replicate
        "odd": jax.ShapeDtypeStruct((1037, 1031), jnp.float32),  # no divisible dim
    }
    sh = fsdp_sharding(tree, mesh)
    assert sh["big"].spec == PartitionSpec(None, "fsdp")
    assert sh["small"].spec == PartitionSpec()
    assert sh["odd"].spec == PartitionSpec()


def test_fsdp_sharding_scan_stacked():
    # Stacked-layer param (L, D, F): shard the largest feature dim, not layers.
    mesh = make_mesh(fsdp_devices=8)
    tree = {"w": jax.ShapeDtypeStruct((18, 512, 2048), jnp.bfloat16)}
    sh = fsdp_sharding(tree, mesh)
    assert sh["w"].spec == PartitionSpec(None, None, "fsdp")


def test_data_sharding_and_constraint():
    mesh = make_mesh(fsdp_devices=4)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    gx = jax.device_put(x, data_sharding(mesh))
    # 16 rows over dp=2 * fsdp=4 = 8 shards -> 2 rows each
    assert gx.sharding.spec == PartitionSpec(("dp", "fsdp"))

    with set_mesh(mesh):

        @jax.jit
        def f(a):
            return activation_sharding_constraint(a * 2)

        y = f(gx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2)


def test_sharded_matmul_runs_on_mesh():
    # End-to-end: FSDP-sharded weight, data-sharded batch, jit computes.
    mesh = make_mesh(fsdp_devices=8)
    w = jnp.ones((1024, 1024), jnp.float32)
    wsh = fsdp_sharding({"w": w}, mesh, min_size_bytes=0)["w"]
    w = jax.device_put(w, wsh)
    x = jnp.ones((16, 1024), jnp.float32)
    x = jax.device_put(x, data_sharding(mesh))

    @jax.jit
    def f(x, w):
        return x @ w

    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 1024.0)
