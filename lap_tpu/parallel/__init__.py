from lap_tpu.parallel.mesh import (
    BATCH_AXIS,
    DATA_AXES,
    FSDP_AXIS,
    TP_AXIS,
    activation_sharding_constraint,
    data_sharding,
    get_mesh,
    make_mesh,
    pick_fsdp_devices,
    replicated,
    sequence_parallel_enabled,
    set_mesh,
)
from lap_tpu.parallel.pipeline import (
    PP_AXIS,
    make_pp_mesh,
    pipeline_apply,
    stage_params_sharding,
)
from lap_tpu.parallel.sharding import fsdp_sharding

__all__ = [
    "BATCH_AXIS",
    "DATA_AXES",
    "FSDP_AXIS",
    "TP_AXIS",
    "activation_sharding_constraint",
    "data_sharding",
    "fsdp_sharding",
    "get_mesh",
    "make_mesh",
    "make_pp_mesh",
    "PP_AXIS",
    "pipeline_apply",
    "stage_params_sharding",
    "pick_fsdp_devices",
    "replicated",
    "sequence_parallel_enabled",
    "set_mesh",
]
