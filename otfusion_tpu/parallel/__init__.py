"""Multi-chip scaling via jax.sharding Mesh + XLA SPMD collectives."""

from otfusion_tpu.parallel.mesh import (
    make_mesh,
    make_2d_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    fusion_param_sharding,
    make_sharded_fusion_train_step,
    make_dp_tp_fusion_train_step,
)

__all__ = [
    "make_mesh",
    "make_2d_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "fusion_param_sharding",
    "make_sharded_fusion_train_step",
    "make_dp_tp_fusion_train_step",
]
