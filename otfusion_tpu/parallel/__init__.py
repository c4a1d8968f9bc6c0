"""Multi-chip scaling via jax.sharding Mesh + XLA SPMD collectives."""

from otfusion_tpu.parallel.mesh import (
    make_mesh,
    make_2d_mesh,
    resolve_mesh,
    replicated,
    place_replicated,
    place_state,
    data_axis_size,
    has_model_axis,
    batch_sharded,
    shard_batch,
    fusion_param_sharding,
    make_sharded_fusion_train_step,
    make_sharded_coupling_pipeline,
    make_dp_fusion_steps,
    make_dp_unimodal_steps,
    make_dp_tp_fusion_train_step,
)

__all__ = [
    "make_mesh",
    "make_2d_mesh",
    "resolve_mesh",
    "replicated",
    "place_replicated",
    "place_state",
    "data_axis_size",
    "has_model_axis",
    "batch_sharded",
    "shard_batch",
    "fusion_param_sharding",
    "make_sharded_fusion_train_step",
    "make_sharded_coupling_pipeline",
    "make_dp_fusion_steps",
    "make_dp_unimodal_steps",
    "make_dp_tp_fusion_train_step",
]
