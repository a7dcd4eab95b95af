"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

The reference (lihzha/lap) scales with DP+FSDP only (``mh_sharding.py``);
this module is a rebuild addition that closes the last classic parallelism
axis: depth. The TPU-native formulation follows the scaling-book recipe —
stack the per-layer parameters on a leading ``[L]`` axis (exactly the layout
``nn.scan`` already produces for the Gemma stacks), shard that axis over a
``pp`` mesh axis so each device holds ``L/P`` contiguous layers, and rotate
microbatch activations stage-to-stage with ``lax.ppermute`` inside
``jax.shard_map``. The schedule is plain GPipe: ``M`` microbatches drain
through ``P`` stages in ``M + P - 1`` ticks; bubble-tick garbage is masked
at the output so ``jax.grad`` through the whole thing yields exact gradients
(the backward pass is the transposed permutation, which jax derives
automatically from ``ppermute``).

Composition: the mesh may carry a data axis alongside ``pp`` (built by
``make_pp_mesh``); batches shard over ``dp`` while parameters shard over
``pp``, so pp multiplies with data parallelism the same way fsdp/tp do in
``mesh.py``. Within a stage, layers run under ``lax.scan`` with optional
rematerialization, mirroring the non-pipelined training path.

Use when a model's depth no longer fits a single FSDP group's HBM even with
full remat, or to keep weights resident across a pod slice without FSDP's
per-step all-gathers: pp moves activations (small) over ICI instead of
weights (large).
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

PP_AXIS = "pp"
PP_DATA_AXIS = "dp"


def make_pp_mesh(pp_devices: int, *, devices: list | None = None) -> Mesh:
    """A ``(dp, pp)`` mesh: the trailing (fastest-varying, tightest-ICI) axis
    is ``pp`` so stage-to-stage ``ppermute`` hops ride neighbor links; the
    leading remainder is data parallelism."""
    if devices is None:
        from lap_tpu.parallel.mesh import default_devices

        devices = default_devices()
    n = len(devices)
    if pp_devices < 2:
        raise ValueError("pipeline parallelism needs pp_devices >= 2")
    if n % pp_devices != 0:
        raise ValueError(f"{n} devices not divisible by pp_devices={pp_devices}")
    dev_array = np.asarray(devices).reshape(n // pp_devices, pp_devices)
    return Mesh(dev_array, (PP_DATA_AXIS, PP_AXIS))


def stage_params_sharding(mesh: Mesh, stacked_params):
    """Shardings placing each ``[L, ...]`` leaf's layer axis over ``pp``."""
    spec = NamedSharding(mesh, PartitionSpec(PP_AXIS))
    return jax.tree.map(lambda _: spec, stacked_params)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x,
    *,
    mesh: Mesh,
    n_microbatches: int,
    remat: bool = False,
):
    """Run ``x`` through ``L`` stacked layers as a ``P``-stage pipeline.

    Args:
        stage_fn: ``(layer_params, x) -> x`` — ONE layer. ``x`` is an
            arbitrary pytree of per-example arrays (leading batch dim); any
            leaf the layer does not transform (masks, positions) must be
            passed through unchanged so it stays with its microbatch.
        stacked_params: pytree whose every leaf has a leading ``[L]`` layer
            axis (the ``nn.scan`` checkpoint layout). ``L`` must divide by
            the mesh's pp size.
        x: pytree of ``[B, ...]`` arrays; ``B`` must divide by
            ``n_microbatches`` (after the dp shard, if the mesh has dp > 1).
        mesh: a mesh with a ``pp`` axis (and optionally a ``dp`` axis the
            batch dim shards over).
        n_microbatches: GPipe microbatch count ``M`` per dp shard. Bubble
            fraction is ``(P-1)/(M+P-1)``; M >= 2*P keeps it under ~33%.
        remat: rematerialize each layer in the backward pass (the training
            default elsewhere in this repo, ``gemma.Module.remat_policy``).

    Returns:
        pytree like ``x``: the activations after all ``L`` layers.
    """
    pp = mesh.shape[PP_AXIS]
    has_dp = PP_DATA_AXIS in mesh.shape and mesh.shape[PP_DATA_AXIS] > 1
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % pp != 0:
        raise ValueError(f"{n_layers} layers not divisible by pp={pp}")
    batch = jax.tree.leaves(x)[0].shape[0]
    dp = mesh.shape.get(PP_DATA_AXIS, 1)
    if batch % (dp * n_microbatches) != 0:
        raise ValueError(
            f"batch {batch} not divisible by dp*microbatches = {dp}*{n_microbatches}"
        )

    layer = jax.checkpoint(stage_fn) if remat else stage_fn
    m = n_microbatches

    def run_stage(params_local, mb):
        """All of this stage's layers over one microbatch."""

        def body(h, layer_params):
            return layer(layer_params, h), None

        out, _ = jax.lax.scan(body, mb, params_local)
        return out

    def pp_fn(params_local, x_local):
        stage = jax.lax.axis_index(PP_AXIS)
        # [B_local, ...] -> [M, B_local/M, ...] microbatches.
        x_mb = jax.tree.map(
            lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:]), x_local
        )
        state = jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_mb)
        outputs = jax.tree.map(jnp.zeros_like, x_mb)
        shift = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(carry, t):
            state, outputs = carry
            # Stage 0 ingests microbatch t; later stages consume what the
            # previous tick's ppermute delivered (their microbatch t-stage).
            feed = jax.tree.map(lambda a: a[jnp.clip(t, 0, m - 1)], x_mb)
            cur = jax.tree.map(
                lambda f, s: jnp.where(stage == 0, f, s), feed, state
            )
            out = run_stage(params_local, cur)
            # The last stage emits microbatch t-(P-1); ticks before the
            # pipeline fills produce garbage, masked here (and therefore
            # receiving zero cotangent in the backward pass).
            out_idx = jnp.clip(t - (pp - 1), 0, m - 1)
            valid = (t >= pp - 1) & (stage == pp - 1)
            outputs = jax.tree.map(
                lambda os, o: os.at[out_idx].set(
                    jnp.where(valid, o, os[out_idx])
                ),
                outputs,
                out,
            )
            state = jax.tree.map(
                lambda o: jax.lax.ppermute(o, PP_AXIS, shift), out
            )
            return (state, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(m + pp - 1)
        )
        # Results live on the last stage only; bring every stage into
        # agreement so the out_spec can be pp-replicated. One psum of
        # activations per step — small next to the per-tick permutes.
        outputs = jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(stage == pp - 1, o, jnp.zeros_like(o)), PP_AXIS
            ),
            outputs,
        )
        return jax.tree.map(
            lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), outputs
        )

    batch_spec = PartitionSpec(PP_DATA_AXIS) if has_dp else PartitionSpec()
    in_specs = (
        jax.tree.map(lambda _: PartitionSpec(PP_AXIS), stacked_params),
        jax.tree.map(lambda _: batch_spec, x),
    )
    out_specs = jax.tree.map(lambda _: batch_spec, x)
    return jax.shard_map(
        pp_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(stacked_params, x)
