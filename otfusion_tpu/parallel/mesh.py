"""Device mesh + sharding rules.

The reference is single-process/single-GPU with no collective backend at
all (SURVEY.md §2.6: no torch.distributed/NCCL anywhere); scaling here is
designed TPU-first instead of ported:

  * 1-D ``data`` mesh over all chips: batches shard over it, parameters
    and the (d_pet, d_mri) feature plan replicate. XLA's SPMD partitioner
    inserts the gradient psum over ICI — no hand-written comm.
  * the OT stage's large objects (cost matrices) shard by rows over the
    same axis: Sinkhorn's row-logsumexp is local, the column-logsumexp
    becomes an XLA all-reduce, again inserted automatically.

Multi-host later = the same Mesh over (dcn, ici) axes; nothing in the
step functions changes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Sequence | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, array, axis: str = DATA_AXIS):
    return jax.device_put(array, batch_sharded(mesh, np.ndim(array), axis))


def make_sharded_fusion_train_step(model, mesh: Mesh, **step_kwargs):
    """Data-parallel fusion train step: batch sharded over the mesh,
    state and coupling replicated. Returns (step_fn, place_batch) where
    ``place_batch`` shards host arrays before the call."""
    from otfusion_tpu.train.steps import make_fusion_train_step

    raw = make_fusion_train_step(model, donate=False, jit=False,
                                 **step_kwargs)
    rep = replicated(mesh)
    vol = batch_sharded(mesh, 5)
    lab = batch_sharded(mesh, 1)

    # XLA partitions the whole step (forward, OT solve, backward, update)
    # from these input shardings; the gradient all-reduce is implicit.
    step = jax.jit(
        raw,
        in_shardings=(rep, vol, vol, lab, rep, rep),
        out_shardings=(rep, rep),
    )

    def place_batch(mri, pet, labels):
        return (
            shard_batch(mesh, mri),
            shard_batch(mesh, pet),
            shard_batch(mesh, labels),
        )

    return step, place_batch
