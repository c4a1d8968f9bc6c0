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
MODEL_AXIS = "model"


def make_mesh(devices: Sequence | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def make_2d_mesh(
    data: int,
    model: int,
    devices: Sequence | None = None,
) -> Mesh:
    """(data, model) mesh for combined DP + tensor parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < data * model:
        raise ValueError(
            f"need {data * model} devices for a {data}x{model} mesh, "
            f"have {len(devices)}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, ndim: int, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, array, axis: str = DATA_AXIS):
    return jax.device_put(array, batch_sharded(mesh, np.ndim(array), axis))


def fusion_param_sharding(params, mesh: Mesh):
    """Tensor-parallel sharding rules for the fusion trunk.

    The OT-fusion head is dominated by wide Dense layers (2048-dim
    projections/fusions/attention/ffn at depth>=50). Shard every Dense
    kernel's OUTPUT dimension over the ``model`` axis (column parallelism
    — XLA inserts the all-gather/reduce-scatter pair); biases and conv/BN
    parameters replicate. Megatron-style split specialised to the fusion
    trunk; backbone convs stay replicated (MXU-bound, not memory-bound).
    """
    return jax.tree_util.tree_map_with_path(_tp_rule_factory(mesh), params)


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


def make_dp_tp_fusion_train_step(model, mesh: Mesh, **step_kwargs):
    """Combined data + tensor parallel train step over a 2-D
    (data, model) mesh: batches shard over ``data``, fusion-trunk Dense
    kernels shard over ``model`` (see fusion_param_sharding), everything
    else replicates. Sharding propagates from the placed inputs — XLA's
    SPMD partitioner inserts all collectives.

    Returns (step_fn, place_state, place_batch)."""
    from otfusion_tpu.train.steps import make_fusion_train_step

    raw = make_fusion_train_step(model, donate=False, jit=False,
                                 **step_kwargs)
    step = jax.jit(raw)

    def place_state(state):
        sharding_tree = jax.tree_util.tree_map_with_path(
            _tp_rule_factory(mesh), state
        )
        return jax.device_put(state, sharding_tree)

    def place_batch(mri, pet, labels):
        return (
            shard_batch(mesh, mri),
            shard_batch(mesh, pet),
            shard_batch(mesh, labels),
        )

    return step, place_state, place_batch


def _tp_rule_factory(mesh: Mesh):
    model_size = mesh.shape.get(MODEL_AXIS, 1)

    def rule(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        in_dense = any(n.startswith("Dense") or n in ("qkv", "proj", "fc")
                       for n in names)
        if (
            in_dense
            and names
            and names[-1] == "kernel"
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[-1] % model_size == 0  # e.g. not the tiny
            # num_classes classifier head
        ):
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        return NamedSharding(mesh, P())

    return rule
