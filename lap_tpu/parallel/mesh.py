"""Device-mesh construction for DP x FSDP x TP parallelism.

Capability parity with the reference multi-host FSDP mesh builder
(``src/lap/training/mh_sharding.py:14-77`` in lihzha/lap), redesigned for TPU:

- A 3-D logical mesh ``(dp, fsdp, tp)``. The reference only has
  ``(batch, fsdp)``; we add a tensor-parallel axis so attention heads and MLP
  hidden dims can shard over ICI. With ``tp=1`` the layout semantics match the
  reference exactly.
- FSDP groups are laid out so they are contiguous in the physical device
  order: when a group fits inside one host/slice it stays intra-host (gradient
  all-reduce rides ICI), and when it spans hosts it is built from whole hosts
  (reference ``mh_sharding.py:27-60`` behavior).
- A context-managed "current mesh" that activation-sharding constraints pick
  up from anywhere in model code without threading the mesh through call
  signatures.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import threading

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec

logger = logging.getLogger(__name__)

# Logical axis names.
BATCH_AXIS = "dp"
FSDP_AXIS = "fsdp"
TP_AXIS = "tp"
PP_AXIS = "pp"

# Data (batch dim) shards over dp AND fsdp: FSDP groups also act as extra
# data-parallel replicas (ZeRO-3 style), mirroring the reference DATA_AXIS
# = ("batch", "fsdp").
DATA_AXES = (BATCH_AXIS, FSDP_AXIS)

MESH_AXES = (BATCH_AXIS, FSDP_AXIS, TP_AXIS)


def default_devices() -> list:
    """Devices used for mesh construction.

    ``LAP_TPU_MESH_PLATFORM`` (e.g. "cpu") selects a specific backend — used
    by the test harness to build virtual multi-device CPU meshes even when a
    TPU plugin is registered in the same process.
    """
    import os

    platform = os.environ.get("LAP_TPU_MESH_PLATFORM")
    if platform:
        return jax.devices(platform)
    return jax.devices()


class _MeshState(threading.local):
    mesh: Mesh | None = None
    sequence_parallel: bool = False


_STATE = _MeshState()


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical parallelism layout.

    fsdp_devices * tp_devices must divide the total device count; the
    remaining factor becomes pure data parallelism.
    """

    fsdp_devices: int = 1
    tp_devices: int = 1

    def __post_init__(self):
        if self.fsdp_devices < 1 or self.tp_devices < 1:
            raise ValueError("fsdp_devices and tp_devices must be >= 1")


def make_mesh(
    fsdp_devices: int = 1,
    tp_devices: int = 1,
    pp_devices: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a ``Mesh`` with axes ``(dp, fsdp, tp)`` — or, with
    ``pp_devices > 1``, ``(pp, dp, fsdp, tp)`` (pp OUTERMOST in the device
    order; see the body comment).

    The physical device order (from ``mesh_utils.create_device_mesh`` when
    possible) is reshaped so that the tp axis varies fastest (tightest ICI
    neighborhood), then fsdp, then dp. This keeps each FSDP all-gather /
    reduce-scatter and each TP collective on physically adjacent chips.

    With pipeline parallelism the (dp, fsdp) data axes stay contiguous and
    innermost (the batch's data sharding and the within-stage weight gathers
    move the most bytes and must ride the tightest links; SPMD also reshards
    to/from contiguous tilings efficiently) while pp takes the outermost
    stride — its stage-to-stage ppermute moves one microbatch of activations
    per tick, the smallest collective in the step. pp does not compose with
    tp>1: the pipeline stages run inside ``jax.shard_map`` where the GSPMD
    tp propagation that tp relies on is unavailable (see
    ``lap_tpu/parallel/pipeline.py``).
    """
    if devices is None:
        devices = default_devices()
    n = len(devices)
    if pp_devices > 1:
        if tp_devices > 1:
            raise ValueError(
                "pp_devices > 1 does not compose with tp_devices > 1 (the "
                "pipeline runs inside shard_map, outside GSPMD tp "
                "propagation); use pp x fsdp x dp"
            )
        model_devices = fsdp_devices * pp_devices
        if n % model_devices != 0:
            raise ValueError(
                f"{n} devices not divisible by fsdp_devices*pp_devices ="
                f" {fsdp_devices}*{pp_devices}"
            )
        dp = n // model_devices
        # pp OUTERMOST: (dp, fsdp) stay contiguous in the device order so
        # the batch's PartitionSpec((dp, fsdp)) tiles over adjacent devices
        # (SPMD reshards to/from it efficiently — a (dp, pp, fsdp) order
        # makes every data<->model resharding cross the pp stride and SPMD
        # falls back to involuntary full rematerialization in the ViT
        # backward). Stage-to-stage ppermute traffic (one microbatch of
        # activations per tick, the smallest collective here) takes the
        # outer stride instead.
        shape = (pp_devices, dp, fsdp_devices, 1)
        try:
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
        except Exception:  # noqa: BLE001 - CPU/virtual meshes can reject topology hints
            dev_array = np.asarray(devices).reshape(shape)
        return Mesh(dev_array, (PP_AXIS, BATCH_AXIS, FSDP_AXIS, TP_AXIS))
    model_devices = fsdp_devices * tp_devices
    if n % model_devices != 0:
        raise ValueError(
            f"{n} devices not divisible by fsdp_devices*tp_devices ="
            f" {fsdp_devices}*{tp_devices}"
        )
    dp = n // model_devices
    shape = (dp, fsdp_devices, tp_devices)
    dev_array = _host_aware_layout(devices, fsdp_devices, tp_devices)
    if dev_array is None:
        try:
            dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
        except Exception:  # noqa: BLE001 - CPU/virtual meshes can reject topology hints
            dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, MESH_AXES)


def _host_aware_layout(devices, fsdp_devices: int, tp_devices: int):
    """Multi-host layout with whole-host model groups (reference
    ``mh_sharding.py:27-60``).

    When the model group (fsdp*tp) fits inside one host, every group stays
    intra-host (its collectives ride ICI); when it is larger, groups are
    built from whole hosts so no host straddles two groups. Returns None for
    single-host runs (topology-aware ``create_device_mesh`` does better
    there) or infeasible layouts (caller raises via reshape checks).
    """
    by_host: dict[int, list] = {}
    for d in devices:
        by_host.setdefault(d.process_index, []).append(d)
    p = len(by_host)
    if p <= 1:
        return None
    host_rows = [sorted(v, key=lambda d: d.id) for _, v in sorted(by_host.items())]
    d_per_host = len(host_rows[0])
    if any(len(r) != d_per_host for r in host_rows):
        return None
    model = fsdp_devices * tp_devices
    grid = np.array(host_rows, dtype=object)  # [P, D]
    if model <= d_per_host:
        if d_per_host % model != 0:
            return None
        # [P, D] -> (P * dp_per_host, fsdp, tp): model groups never cross hosts.
        return grid.reshape(p * (d_per_host // model), fsdp_devices, tp_devices)
    if model % d_per_host != 0 or p % (model // d_per_host) != 0:
        return None
    hosts_per_group = model // d_per_host
    # Whole-host groups: (dp_groups, hosts_per_group * D) -> (dp, fsdp, tp).
    return grid.reshape(p // hosts_per_group, fsdp_devices, tp_devices)


def pick_fsdp_devices(requested: int, n_devices: int | None = None) -> int:
    """Largest divisor of the device count that is <= requested.

    Mirrors the reference's graceful single-process fallback
    (``scripts/train.py:134-147``): asking for more FSDP shards than devices
    degrades to the best feasible layout instead of erroring.
    """
    if n_devices is None:
        n_devices = jax.device_count()
    requested = max(1, min(requested, n_devices))
    for cand in range(requested, 0, -1):
        if n_devices % cand == 0:
            return cand
    return 1


@contextlib.contextmanager
def set_mesh(
    mesh: Mesh,
    *,
    sequence_parallel: bool = False,
    pipeline_microbatches: int | None = None,
):
    """Make ``mesh`` the ambient mesh for activation sharding constraints.

    ``sequence_parallel=True`` additionally shards the token dim of rank-3
    activations over the tp axis (Megatron-SP style): the residual stream
    between attention/MLP regions lives sequence-sharded, so GSPMD replaces
    each tp all-reduce with a reduce-scatter + all-gather pair placed around
    the (per-token) norm regions — same bytes on the wire, 1/tp of the
    activation memory between regions. Numerically identical to tp-only.

    ``pipeline_microbatches`` (with a mesh carrying a ``pp`` axis of size
    >= 2) additionally enters the pipeline context (``pipeline.set_pipeline``)
    so ``gemma.Module`` training forwards traced inside this scope run their
    layer stacks as a GPipe pipeline.
    """
    if _STATE.mesh is not None:
        raise ValueError("A mesh is already active; nesting is not supported.")
    if sequence_parallel and mesh.shape.get(TP_AXIS, 1) <= 1:
        sequence_parallel = False  # sp is a tp layout refinement; no-op without tp.
    _STATE.mesh = mesh
    _STATE.sequence_parallel = sequence_parallel
    try:
        if pipeline_microbatches and mesh.shape.get(PP_AXIS, 1) > 1:
            from lap_tpu.parallel.pipeline import set_pipeline

            with set_pipeline(mesh, pipeline_microbatches):
                yield
        else:
            yield
    finally:
        _STATE.mesh = None
        _STATE.sequence_parallel = False


@contextlib.contextmanager
def suspend_mesh():
    """Temporarily clear the ambient mesh so activation sharding constraints
    become no-ops. Used while tracing code INSIDE ``jax.shard_map`` (the
    pipeline-parallel stage body): per-device code there has no global view
    for ``with_sharding_constraint`` to act on."""
    saved_mesh, saved_sp = _STATE.mesh, _STATE.sequence_parallel
    _STATE.mesh = None
    _STATE.sequence_parallel = False
    try:
        yield
    finally:
        _STATE.mesh = saved_mesh
        _STATE.sequence_parallel = saved_sp


def get_mesh() -> Mesh | None:
    return _STATE.mesh


def sequence_parallel_enabled() -> bool:
    return _STATE.mesh is not None and _STATE.sequence_parallel


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch pytree: batch dim over (dp, fsdp)."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def activation_sharding_constraint(pytree):
    """Constrain leading (batch) dim of every leaf to the data axes.

    Under ``set_mesh(..., sequence_parallel=True)`` rank-3 ``[B, T, D]``
    leaves whose token dim divides the tp size are additionally sharded
    ``[B@data, T@tp, D]`` (Megatron-SP residual layout). Leaves with
    non-divisible or short token dims (e.g. the action-expert suffix) keep
    the batch-only constraint, so mixed prefix/suffix lists stay valid.

    No-op outside a ``set_mesh`` scope so model code runs unchanged in
    single-device unit tests.
    """
    mesh = get_mesh()
    if mesh is None:
        return pytree
    batch_only = NamedSharding(mesh, PartitionSpec(DATA_AXES))
    if not _STATE.sequence_parallel:
        return jax.lax.with_sharding_constraint(pytree, batch_only)
    tp = mesh.shape.get(TP_AXIS, 1)
    seq_sharded = NamedSharding(mesh, PartitionSpec(DATA_AXES, TP_AXIS))

    def constrain(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 3 and shape[1] >= tp and shape[1] % tp == 0:
            return jax.lax.with_sharding_constraint(leaf, seq_sharded)
        return jax.lax.with_sharding_constraint(leaf, batch_only)

    return jax.tree.map(constrain, pytree)


def logical_to_sharding(mesh: Mesh, *axes: str | None) -> NamedSharding:
    """Build a NamedSharding from per-dim logical axis names.

    Accepted names: 'data' -> (dp, fsdp); 'fsdp' -> fsdp; 'tp' -> tp;
    None -> replicated dim.
    """
    table = {"data": DATA_AXES, "fsdp": FSDP_AXIS, "tp": TP_AXIS, None: None}
    return NamedSharding(mesh, PartitionSpec(*(table[a] for a in axes)))
