"""Multi-chip scaling via jax.sharding Mesh + XLA SPMD collectives."""

from otfusion_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    make_sharded_fusion_train_step,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "make_sharded_fusion_train_step",
]
