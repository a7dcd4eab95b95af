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

Composition:

- **dp**: the mesh may carry a data axis alongside ``pp`` (``make_pp_mesh``
  or ``mesh.make_mesh(pp_devices=N)``); batches shard over the data axes
  while layer parameters shard over ``pp``.
- **fsdp within a stage** (ZeRO-3): on a mesh with an ``fsdp`` axis, each
  stage's ``[L/P, ...]`` parameter slices are ADDITIONALLY stored sharded
  over fsdp along their largest divisible non-layer dim and all-gathered
  per layer inside the stage scan, so peak weight memory per device is
  ``layer_bytes * L/P / fsdp + one gathered layer``. The gather's transpose
  (``psum_scatter``) returns exact fsdp-sharded gradients. The batch shards
  over (dp, fsdp) jointly, mirroring the non-pipelined DATA_AXES layout.
- **tp**: NOT composed — the stages run inside ``shard_map`` where GSPMD's
  tp propagation is unavailable; ``mesh.make_mesh`` rejects pp x tp.

Trainer integration: ``set_pipeline(mesh, n_microbatches)`` makes the
pipeline the ambient layer-stack executor; ``gemma.Module.__call__`` routes
its scanned blocks through ``pipeline_apply`` whenever a pipeline context is
active (training forward only — KV-cache decode paths keep the serial
stack). ``scripts/train.py --pp_devices N`` drives this end to end.

Use when a model's depth no longer fits a single FSDP group's HBM even with
full remat, or to keep weights resident across a pod slice without FSDP's
per-step all-gathers: pp moves activations (small) over ICI instead of
weights (large).
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from lap_tpu.parallel.mesh import BATCH_AXIS, FSDP_AXIS, PP_AXIS, TP_AXIS

PP_DATA_AXIS = BATCH_AXIS


def make_pp_mesh(pp_devices: int, *, devices: list | None = None) -> Mesh:
    """A ``(dp, pp)`` mesh: the trailing (fastest-varying, tightest-ICI) axis
    is ``pp`` so stage-to-stage ``ppermute`` hops ride neighbor links; the
    leading remainder is data parallelism. For pp WITH within-stage fsdp use
    ``mesh.make_mesh(fsdp_devices=..., pp_devices=...)`` instead."""
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


# ---------------------------------------------------------------------------
# Ambient pipeline context (consumed by gemma.Module.__call__)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    mesh: Mesh
    n_microbatches: int


class _PipelineState(threading.local):
    config: PipelineConfig | None = None


_PP_STATE = _PipelineState()


@contextlib.contextmanager
def set_pipeline(mesh: Mesh, n_microbatches: int):
    """Make GPipe the ambient executor for scanned layer stacks.

    Inside this scope, ``gemma.Module`` training forwards (scan_layers=True,
    no KV cache) run their block stack through ``pipeline_apply`` on
    ``mesh``'s pp axis instead of a serial ``lax.scan``. Must wrap the TRACE
    of the train/val step (jit caches the traced route).
    """
    if PP_AXIS not in mesh.shape or mesh.shape[PP_AXIS] < 2:
        raise ValueError("set_pipeline needs a mesh with a pp axis of size >= 2")
    if n_microbatches < 1:
        raise ValueError("n_microbatches must be >= 1")
    if _PP_STATE.config is not None:
        raise ValueError("A pipeline context is already active.")
    _PP_STATE.config = PipelineConfig(mesh=mesh, n_microbatches=n_microbatches)
    try:
        yield
    finally:
        _PP_STATE.config = None


def current_pipeline() -> PipelineConfig | None:
    return _PP_STATE.config


# ---------------------------------------------------------------------------
# Parameter placement
# ---------------------------------------------------------------------------


def pp_param_fsdp_dim(shape: tuple[int, ...], fsdp_size: int) -> int:
    """Within-stage fsdp storage dim for a stacked ``[L, ...]`` leaf: the
    largest non-layer dim divisible by the fsdp size, or -1 (replicated
    within the stage). Shared by ``pipeline_apply``'s shard_map in_specs and
    ``sharding.fsdp_sharding``'s storage specs so the jitted train step never
    reshards parameters at the shard_map boundary."""
    if fsdp_size <= 1 or len(shape) < 2:
        return -1
    for dim in sorted(range(1, len(shape)), key=lambda i: (shape[i], i), reverse=True):
        if shape[dim] % fsdp_size == 0 and shape[dim] >= fsdp_size:
            return dim
    return -1


def pp_layer_param_spec(shape: tuple[int, ...], pp_size: int, fsdp_size: int) -> PartitionSpec:
    """PartitionSpec for one stacked layer leaf: layer axis over pp, plus
    within-stage fsdp on the dim ``pp_param_fsdp_dim`` picks."""
    parts: list = [PP_AXIS] + [None] * (len(shape) - 1)
    d = pp_param_fsdp_dim(shape, fsdp_size)
    if d >= 0:
        parts[d] = FSDP_AXIS
    while parts and parts[-1] is None:
        parts = parts[:-1]
    return PartitionSpec(*parts)


def stage_params_sharding(mesh: Mesh, stacked_params):
    """Shardings placing each ``[L, ...]`` leaf's layer axis over ``pp`` (and
    its largest divisible non-layer dim over ``fsdp`` when the mesh has one)."""
    fsdp = mesh.shape.get(FSDP_AXIS, 1)
    pp = mesh.shape[PP_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, pp_layer_param_spec(tuple(leaf.shape), pp, fsdp)
        ),
        stacked_params,
    )


# ---------------------------------------------------------------------------
# Stage memory accounting (the honest bound for the pp use case)
# ---------------------------------------------------------------------------


def pp_stage_footprint_bytes(
    stacked_params, other_params=None, *, pp: int, fsdp: int = 1, state_multiplier: float = 4.0
) -> dict:
    """Per-device parameter-memory arithmetic for a pipelined run.

    Resident bytes per device =
        layer_bytes / pp / fsdp        (stacked [L, ...] leaves, stored
                                        pp x fsdp sharded)
      + max_layer_bytes / fsdp * fsdp  (ONE gathered layer during compute)
      + other_bytes                    (embedder, norms, ViT, heads —
                                        replicated over pp)
    all times ``state_multiplier`` for the full train state (params + grads
    + Adam mu/nu = 4 copies at equal dtype; serving = 1).

    Worked at the gemma3 flagship shapes this bounds (bf16, fsdp=1):
    gemma3_12b stacked layers ~= 21.5 GB -> pp=4 stages hold ~5.4 GB of
    layer weights each (fits 16 GB v5e HBM with 4x state only at fsdp>=4);
    gemma3_27b ~= 50 GB -> pp=8 stages ~6.2 GB. ``check_pp_memory`` raises
    when the sum exceeds the device HBM instead of letting XLA OOM opaquely.
    """
    layer_leaves = jax.tree.leaves(stacked_params)
    layer_bytes = sum(
        int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize for x in layer_leaves
    )
    n_layers = layer_leaves[0].shape[0] if layer_leaves else 0
    one_layer_bytes = layer_bytes // max(n_layers, 1)
    other_bytes = 0
    if other_params is not None:
        other_bytes = sum(
            int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
            for x in jax.tree.leaves(other_params)
        )
    resident = layer_bytes / pp / fsdp + one_layer_bytes + other_bytes
    return {
        "layer_bytes": layer_bytes,
        "one_layer_bytes": one_layer_bytes,
        "other_bytes": other_bytes,
        "per_device_bytes": int(resident * state_multiplier),
    }


def check_pp_memory(
    stacked_params, other_params, *, pp: int, fsdp: int, hbm_bytes: int, state_multiplier: float = 4.0
) -> dict:
    """Raise with the arithmetic when a stage cannot fit ``hbm_bytes``."""
    fp = pp_stage_footprint_bytes(
        stacked_params, other_params, pp=pp, fsdp=fsdp, state_multiplier=state_multiplier
    )
    if fp["per_device_bytes"] > hbm_bytes:
        gib = 2**30
        raise ValueError(
            f"pipeline stage does not fit device HBM: layers "
            f"{fp['layer_bytes'] / gib:.2f} GiB / (pp={pp} * fsdp={fsdp}) + one "
            f"gathered layer {fp['one_layer_bytes'] / gib:.2f} GiB + non-layer "
            f"params {fp['other_bytes'] / gib:.2f} GiB, x{state_multiplier:g} for "
            f"the train state = {fp['per_device_bytes'] / gib:.2f} GiB > "
            f"{hbm_bytes / gib:.2f} GiB HBM. Raise pp_devices/fsdp_devices or "
            f"enable partitioned freezing."
        )
    return fp


# ---------------------------------------------------------------------------
# The GPipe executor
# ---------------------------------------------------------------------------


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x,
    *,
    mesh: Mesh,
    n_microbatches: int,
    remat: bool = False,
    static=None,
):
    """Run ``x`` through ``L`` stacked layers as a ``P``-stage pipeline.

    Args:
        stage_fn: ``(layer_params, x) -> x`` — ONE layer (or, with
            ``static``, ``(layer_params, x, static_mb) -> x``). ``x`` is an
            arbitrary pytree of per-example arrays (leading batch dim).
        stacked_params: pytree whose every leaf has a leading ``[L]`` layer
            axis (the ``nn.scan`` checkpoint layout). ``L`` must divide by
            the mesh's pp size.
        x: pytree of ``[B, ...]`` arrays; ``B`` must divide by
            ``n_microbatches`` (after the data shard, if the mesh has
            dp/fsdp axes of size > 1). Only leaves the layers TRANSFORM
            belong here: ``x`` is the carry that rides every stage-to-stage
            ``ppermute`` and the final cross-stage ``psum``.
        mesh: a mesh with a ``pp`` axis; optional ``dp``/``fsdp`` axes the
            batch dim shards over (fsdp additionally shards parameter
            storage within each stage — see module docstring). A ``tp`` axis
            of size > 1 is rejected.
        n_microbatches: GPipe microbatch count ``M`` per data shard. Bubble
            fraction is ``(P-1)/(M+P-1)``; M >= 2*P keeps it under ~33%.
        remat: rematerialize each layer in the backward pass (the training
            default elsewhere in this repo, ``gemma.Module.remat_policy``).
        static: optional pytree of ``[B, ...]`` arrays the layers read but
            never transform (attention masks, positions, adaRMS
            conditioning). Every stage holds the full batch locally (the
            batch in_spec has no pp component), so these are indexed per
            tick by microbatch id instead of riding the carry — at Gemma3's
            800-token budget the ``[B, T, T]`` boolean mask alone would
            otherwise dominate the ICI bytes of every ppermute hop and the
            closing psum. Gradients still flow to static leaves (adaRMS
            conditioning is a trained input) through the local indexing.

    Returns:
        pytree like ``x``: the activations after all ``L`` layers.
    """
    pp = mesh.shape[PP_AXIS]
    if mesh.shape.get(TP_AXIS, 1) > 1:
        raise ValueError("pipeline_apply does not compose with a tp axis > 1")
    fsdp = mesh.shape.get(FSDP_AXIS, 1)
    data_axes = tuple(a for a in (BATCH_AXIS, FSDP_AXIS) if a in mesh.shape)
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % pp != 0:
        raise ValueError(f"{n_layers} layers not divisible by pp={pp}")
    batch = jax.tree.leaves(x)[0].shape[0]
    dp = int(np.prod([mesh.shape[a] for a in data_axes])) if data_axes else 1
    if batch % (dp * n_microbatches) != 0:
        raise ValueError(
            f"batch {batch} not divisible by dp*microbatches = {dp}*{n_microbatches}"
        )
    has_static = static is not None
    if has_static:
        for leaf in jax.tree.leaves(static):
            if leaf.shape[0] != batch:
                raise ValueError(
                    f"static leaf batch {leaf.shape[0]} != carry batch {batch}"
                )
    else:
        static = {}

    m = n_microbatches

    # Within-stage fsdp: which dim of each STACKED leaf stores fsdp-sharded
    # (-1 = replicated). Inside the stage scan the leading layer dim is
    # consumed, so the gather axis is dim-1.
    fsdp_dims = jax.tree.map(
        lambda leaf: pp_param_fsdp_dim(tuple(leaf.shape), fsdp), stacked_params
    )

    def gather_layer(layer_params):
        if fsdp <= 1:
            return layer_params
        return jax.tree.map(
            lambda p, d: p
            if d < 0
            else jax.lax.all_gather(p, FSDP_AXIS, axis=d - 1, tiled=True),
            layer_params,
            fsdp_dims,
        )

    def gathered_stage(layer_params, h, st):
        # The gather lives INSIDE the (optional) remat boundary: with remat
        # the gathered weights are re-gathered in the backward pass instead
        # of saved as per-layer residuals — peak weight memory stays at the
        # sharded stage plus ONE gathered layer (ZeRO-3), at the standard
        # cost of one extra all-gather per layer in the backward.
        gathered = gather_layer(layer_params)
        return stage_fn(gathered, h, st) if has_static else stage_fn(gathered, h)

    layer = jax.checkpoint(gathered_stage) if remat else gathered_stage

    def run_stage(params_local, mb, st):
        """All of this stage's layers over one microbatch."""

        def body(h, layer_params):
            return layer(layer_params, h, st), None

        out, _ = jax.lax.scan(body, mb, params_local)
        return out

    def pp_fn(params_local, x_local, static_local):
        stage = jax.lax.axis_index(PP_AXIS)
        # [B_local, ...] -> [M, B_local/M, ...] microbatches.
        as_mb = lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:])  # noqa: E731
        x_mb = jax.tree.map(as_mb, x_local)
        static_mb = jax.tree.map(as_mb, static_local)
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
            # Untransformed inputs: stage s works on microbatch t-s at tick
            # t, and holds the full local batch — index instead of carrying.
            # Bubble ticks read a clipped (wrong) slice; their outputs are
            # masked below, so they contribute zero value and zero gradient.
            st = jax.tree.map(
                lambda a: a[jnp.clip(t - stage, 0, m - 1)], static_mb
            )
            out = run_stage(params_local, cur, st)
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

    batch_spec = PartitionSpec(data_axes) if data_axes else PartitionSpec()
    param_specs = jax.tree.map(
        lambda leaf: pp_layer_param_spec(tuple(leaf.shape), pp, fsdp),
        stacked_params,
    )
    in_specs = (
        param_specs,
        jax.tree.map(lambda _: batch_spec, x),
        jax.tree.map(lambda _: batch_spec, static),
    )
    out_specs = jax.tree.map(lambda _: batch_spec, x)
    return jax.shard_map(
        pp_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(stacked_params, x, static)
