"""Parallelism: device mesh, sharding rules, data-parallel step wrappers."""
from srcgan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch_to,
    put_batch,
    put_replicated,
    replicated,
    spatial_sharding,
)
from srcgan_tpu.parallel.dp import (
    make_cas_2d_step,
    make_cas_dp_step,
    make_cas_dp_steps_u8,
    make_cyclegan_dp_steps,
    make_spatial_infer,
)
from srcgan_tpu.parallel.zero import (
    make_cas_zero1_step,
    make_cas_zero1_steps_u8,
    make_gd_zero1_step,
    zero1_gd_from_state,
    zero1_gd_put,
    zero1_from_state,
    zero1_init,
    zero1_opt_bytes_per_device,
    zero1_put,
)
from srcgan_tpu.parallel.fsdp import (
    fsdp_from_state,
    fsdp_full_params,
    fsdp_init,
    fsdp_put,
    fsdp_state_bytes_per_device,
    make_cas_fsdp_step,
    make_cas_fsdp_steps_u8,
)
from srcgan_tpu.parallel.tp import (
    make_cas_tp_step,
    make_tp_infer,
    tp_param_shardings,
    tp_shard_params,
)
from srcgan_tpu.parallel.pipeline import (
    make_cascade_pipeline_infer,
    make_rddb_trunk_pipeline_infer,
    make_trunk_pipeline_train,
    place_trunk_pipeline_params,
    stack_trunk_params,
)

__all__ = [
    "batch_sharding", "make_mesh", "pad_batch_to", "put_batch",
    "put_replicated", "replicated", "spatial_sharding", "make_cas_dp_step",
    "make_cas_dp_steps_u8", "make_cas_2d_step",
    "make_cyclegan_dp_steps", "make_spatial_infer",
    "make_cas_zero1_step", "make_cas_zero1_steps_u8",
    "make_gd_zero1_step", "zero1_gd_from_state", "zero1_gd_put",
    "zero1_from_state", "zero1_init",
    "zero1_opt_bytes_per_device", "zero1_put",
    "fsdp_from_state", "fsdp_full_params", "fsdp_init", "fsdp_put",
    "fsdp_state_bytes_per_device", "make_cas_fsdp_step",
    "make_cas_fsdp_steps_u8",
    "make_cas_tp_step", "make_tp_infer", "tp_param_shardings",
    "tp_shard_params", "make_cascade_pipeline_infer",
    "make_rddb_trunk_pipeline_infer", "make_trunk_pipeline_train",
    "place_trunk_pipeline_params", "stack_trunk_params",
]
