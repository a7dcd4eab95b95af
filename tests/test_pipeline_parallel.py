"""Pipeline parallelism (pp): exactness of the GPipe harness.

The pipelined forward/backward must match a plain serial ``lax.scan`` over
the same stacked layers bit-for-bit in f32 on CPU — the schedule, bubble
masking, and ppermute plumbing must be numerically invisible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lap_tpu.parallel import make_pp_mesh, pipeline_apply, stage_params_sharding

D = 16
L = 8


def _toy_params(key, width=D, layers=L):
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (layers, width, width)) * 0.3,
        "b": jax.random.normal(kb, (layers, width)) * 0.1,
    }


def _toy_stage(layer_params, x):
    return jnp.tanh(x @ layer_params["w"] + layer_params["b"])


def _serial(params, x):
    def body(h, lp):
        return _toy_stage(lp, h), None

    out, _ = jax.lax.scan(body, x, params)
    return out


@pytest.mark.parametrize("pp,n_micro", [(2, 4), (4, 2), (8, 3)])
def test_pipeline_forward_matches_serial(pp, n_micro):
    mesh = make_pp_mesh(pp, devices=jax.devices("cpu")[:pp])
    params = _toy_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (n_micro * 2, D))
    got = jax.jit(
        lambda p, x: pipeline_apply(
            _toy_stage, p, x, mesh=mesh, n_microbatches=n_micro
        )
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_serial(params, x)), rtol=1e-6)


def test_pipeline_gradients_match_serial():
    pp, n_micro = 4, 4
    mesh = make_pp_mesh(pp, devices=jax.devices("cpu")[:pp])
    params = _toy_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, D))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (8, D))

    def loss_pp(p, x):
        y = pipeline_apply(_toy_stage, p, x, mesh=mesh, n_microbatches=n_micro)
        return jnp.mean((y - tgt) ** 2)

    def loss_serial(p, x):
        return jnp.mean((_serial(p, x) - tgt) ** 2)

    gp, gx = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
    sp, sx = jax.jit(jax.grad(loss_serial, argnums=(0, 1)))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        (gp, gx),
        (sp, sx),
    )


def test_pipeline_remat_gradients_match():
    pp, n_micro = 2, 2
    mesh = make_pp_mesh(pp, devices=jax.devices("cpu")[:pp])
    params = _toy_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, D))

    def loss(p, remat):
        y = pipeline_apply(
            _toy_stage, p, x, mesh=mesh, n_microbatches=n_micro, remat=remat
        )
        return jnp.sum(y**2)

    g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        g0,
        g1,
    )


def test_pipeline_composes_with_dp():
    """(dp=2, pp=4): batch shards over dp, layers over pp; params sharded by
    stage_params_sharding actually land with a pp-sharded layer axis."""
    mesh = make_pp_mesh(4, devices=jax.devices("cpu")[:8])
    assert dict(mesh.shape) == {"dp": 2, "pp": 4}
    params = _toy_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, stage_params_sharding(mesh, params))
    assert "pp" in str(params["w"].sharding.spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, D))

    got = jax.jit(
        lambda p, x: pipeline_apply(_toy_stage, p, x, mesh=mesh, n_microbatches=2)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_serial(params, x)), rtol=1e-6)


def test_pipeline_validates_shapes():
    mesh = make_pp_mesh(4, devices=jax.devices("cpu")[:4])
    params = _toy_params(jax.random.PRNGKey(0), layers=6)  # 6 % 4 != 0
    x = jnp.zeros((8, D))
    with pytest.raises(ValueError, match="not divisible by pp"):
        pipeline_apply(_toy_stage, params, x, mesh=mesh, n_microbatches=2)
    params = _toy_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="not divisible by dp"):
        pipeline_apply(_toy_stage, params, x, mesh=mesh, n_microbatches=3)
    with pytest.raises(ValueError, match="pp_devices >= 2"):
        make_pp_mesh(1, devices=jax.devices("cpu")[:1])


def test_pipeline_gemma_block_stage():
    """The real multi-expert Gemma Block as the pipeline stage: the pipelined
    stack matches running the same blocks serially — masks/positions ride the
    microbatch pytree untouched, the 2-expert activation list flows through."""
    from lap_tpu.models import gemma

    cfg = gemma.get_config("dummy")
    depth, batch, t0, t1 = cfg.depth, 4, 6, 3
    block = gemma.Block(configs=(cfg, cfg))

    total = t0 + t1
    positions = jnp.tile(jnp.arange(total)[None], (batch, 1))
    mask = jnp.tril(jnp.ones((total, total), bool))[None].repeat(batch, axis=0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, t0, cfg.width))
    x1 = jax.random.normal(jax.random.PRNGKey(2), (batch, t1, cfg.width))

    one_layer = block.init(
        jax.random.PRNGKey(0), [x0, x1], None, positions, mask, [None, None]
    )["params"]
    stacked = jax.tree.map(
        lambda v: jnp.stack(
            [v * (1.0 + 0.05 * i) for i in range(depth)]
        ),
        one_layer,
    )

    def stage(layer_params, mb):
        xs, _ = block.apply(
            {"params": layer_params},
            [mb["x0"], mb["x1"]],
            None,
            mb["positions"],
            mb["mask"],
            [None, None],
        )
        return {**mb, "x0": xs[0], "x1": xs[1]}

    mb = {"x0": x0, "x1": x1, "positions": positions, "mask": mask}

    def serial(params, mb):
        def body(h, lp):
            return stage(lp, h), None

        out, _ = jax.lax.scan(body, mb, params)
        return out

    mesh = make_pp_mesh(4, devices=jax.devices("cpu")[:4])
    got = jax.jit(
        lambda p, m: pipeline_apply(stage, p, m, mesh=mesh, n_microbatches=2)
    )(stacked, mb)
    want = jax.jit(serial)(stacked, mb)
    for k in ("x0", "x1"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=2e-4, atol=1e-5
        )
