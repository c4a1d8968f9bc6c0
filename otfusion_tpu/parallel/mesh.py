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

import functools
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Sequence | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def resolve_mesh(
    num_devices: int | str | None, tp_size: int = 1
) -> Mesh | None:
    """Trainer-facing mesh policy: ``1``/``None`` = single device (no
    mesh), ``0`` or ``"auto"`` = all visible devices, N = first N.
    ``tp_size > 1`` splits the chips into a 2-D (data, model) mesh —
    batches shard over ``data``, fusion-trunk Dense kernels over
    ``model``. Returns None when only one device would participate.

    Multi-process groups MUST span every global device: a mesh over a
    subset (or no mesh at all) would silently train one divergent model
    per process while weighting local losses by global counts
    (ADVICE.md round-2 finding 3). The --num-devices default (None)
    therefore implies "auto" under multi-host, and any EXPLICIT N that
    does not cover the group — including 1 — raises rather than being
    silently widened. ``tp_size > 1`` composes with multi-host: the 2-D
    mesh spans the group, consecutive (intra-process) devices fill the
    ``model`` axis so TP collectives stay host-local while the ``data``
    axis crosses hosts."""
    if jax.process_count() > 1:
        n_global = jax.device_count()
        if num_devices not in (None, 0, "auto") \
                and int(num_devices) != n_global:
            raise ValueError(
                f"--num-devices {num_devices} in a "
                f"{jax.process_count()}-process group: the mesh must "
                f"cover all {n_global} global devices (use 'auto' or "
                "omit the flag)")
        num_devices = "auto"
    if num_devices in (None, 1) and tp_size <= 1:
        return None
    devices = jax.devices()
    n = len(devices) if num_devices in (0, "auto") else int(num_devices)
    if n > len(devices):
        raise ValueError(
            f"--num-devices {n} requested but only {len(devices)} visible")
    if n <= 1:
        return None
    if tp_size > 1:
        if n % tp_size:
            raise ValueError(
                f"--num-devices {n} not divisible by --tp-size {tp_size}")
        return make_2d_mesh(n // tp_size, tp_size, devices[:n])
    return make_mesh(devices[:n])


def data_axis_size(mesh: Mesh) -> int:
    """Number of ways the batch/row dimension shards (the ``data`` axis
    of a 1-D or 2-D mesh)."""
    return mesh.shape.get(DATA_AXIS, 1)


def has_model_axis(mesh: Mesh) -> bool:
    return mesh.shape.get(MODEL_AXIS, 1) > 1


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


def place_replicated(tree, mesh: Mesh):
    """Replicate a pytree (train state, coupling, rng key) over the mesh.
    In a multi-process group device_put cannot target non-addressable
    shardings, so placement goes through make_array_from_process_local_data
    (every process holds the same SPMD-consistent host value)."""
    if jax.process_count() > 1:
        from otfusion_tpu.parallel.multihost import replicate_global

        return jax.tree_util.tree_map(
            lambda a: replicate_global(a, mesh), tree)
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), tree)


@functools.lru_cache(maxsize=32)
def _reshard_fn(sh):
    # Memoised per sharding so repeated placements reuse one jit wrapper
    # (a fresh lambda per call would defeat jax's own compile cache);
    # BOUNDED so long-lived processes that build many meshes (sequential
    # study runs, test sessions) don't pin every old Mesh alive through
    # retained executables.
    return jax.jit(lambda x: x, out_shardings=sh)


def _reshard_global(a, sh):
    """Collectively reshard a non-addressable global array to ``sh`` (a
    jitted identity with pinned out_shardings — XLA inserts the gather/
    scatter). COLLECTIVE: every process must reach this in the same
    order, which holds for ``place_state`` (all processes tree_map an
    identical state structure)."""
    return _reshard_fn(sh)(a)


def place_state(state, mesh: Mesh):
    """Place a train state for ``mesh``: replicated on a 1-D data mesh;
    on a 2-D (data, model) mesh, fusion-trunk Dense kernels column-shard
    over ``model`` (megatron-style, see ``_tp_rule_factory``) and
    everything else replicates. In a multi-process group device_put
    cannot target non-addressable shardings, so TP leaves place through
    ``place_global`` (make_array_from_callback) and replicated leaves
    through ``replicate_global`` (which also handles typed PRNG keys)."""
    if not has_model_axis(mesh):
        return place_replicated(state, mesh)
    sharding_tree = jax.tree_util.tree_map_with_path(
        _tp_rule_factory(mesh), state
    )
    if jax.process_count() > 1:
        from otfusion_tpu.parallel.multihost import (
            place_global,
            replicate_global,
        )

        def _place(a, sh):
            if isinstance(a, jax.Array) and not a.is_fully_addressable:
                # Already a global array — e.g. a best-restore keeps the
                # TRAINED opt_state, whose placement the TP step leaves
                # to the partitioner (out_shardings None entry), so GSPMD
                # may have drifted biases/Adam moments to model-sharded.
                # The host-value helpers below cannot read such leaves
                # (np.asarray on non-addressable shards raises); reshard
                # collectively instead.
                if a.sharding == sh or (a.sharding.is_fully_replicated
                                        and sh.is_fully_replicated):
                    return a
                return _reshard_global(a, sh)
            if sh.is_fully_replicated:
                return replicate_global(a, mesh)
            return place_global(a, sh)

        return jax.tree_util.tree_map(_place, state, sharding_tree)
    return jax.device_put(state, sharding_tree)


def _dp_wrap(raw, mesh: Mesh, batch_ndims: Sequence[int], n_rest: int,
             donate: bool = False, tp: bool = False,
             out_state: bool = False, state_shardings=None):
    """jit ``raw(state, *batch_arrays, *rest)`` for data parallelism.

    Batch arrays shard on dim 0, state and the ``n_rest`` trailing args
    replicate; XLA's SPMD partitioner inserts the gradient all-reduce.
    Semantics are identical to the single-device step (GSPMD is
    semantics-preserving), so losses/metrics/BatchNorm stats match the
    unsharded trainer modulo reduction order.

    The loader's final partial batch usually does not divide the mesh —
    in_shardings reject uneven dims — so a second, batch-replicated jit
    handles it (one redundant batch per epoch, numerics unchanged).

    The returned step accepts host numpy batches; trailing args are
    device_put to the replicated sharding (no-op when already placed).

    On a 2-D (data, model) mesh, pass ``tp=True``: the state's sharding
    is then left unconstrained (``in_shardings=None`` entry) so the
    caller's committed TP placement (``place_state``) propagates through
    the step — batches still shard over ``data`` only.
    """
    rep = replicated(mesh)
    state_sharding = None if tp else rep
    donate_args = (0,) if donate else ()
    # Multi-process: host code np.asarray()s step outputs (metrics,
    # preds, features), which requires fully-replicated arrays — pin
    # every non-state output replicated. XLA's allgather of a (B,)-sized
    # preds vector is noise. On the tp path the returned STATE must keep
    # its column-sharded placement, and under a PROCESS GROUP that
    # placement must be PINNED to the deterministic ``state_shardings``
    # tree (the ``place_state`` layout): each process compiles its
    # executable independently, so unpinned (None) output shardings let
    # the per-process partitioners make DIFFERENT layout choices for
    # biases/Adam moments — divergent runtime shardings that later
    # deadlock any sharding-dependent collective (observed live: a
    # 2-process flagship run resharded 59 leaves on one process and 64
    # on the other inside the best-restore's place_state, deadlocking
    # the group).
    if jax.process_count() > 1:
        if tp and state_shardings is not None:
            state_sharding = state_shardings
            out_shardings = ((state_shardings, rep) if out_state else rep)
        else:
            out_shardings = ((None, rep) if (tp and out_state) else rep)
    else:
        out_shardings = None
    main = jax.jit(
        raw,
        in_shardings=(state_sharding,
                      *[batch_sharded(mesh, nd) for nd in batch_ndims],
                      *[rep] * n_rest),
        out_shardings=out_shardings,
        donate_argnums=donate_args,
    )
    fallback = jax.jit(
        raw,
        in_shardings=(state_sharding,
                      *[rep] * (len(batch_ndims) + n_rest)),
        out_shardings=out_shardings,
        donate_argnums=donate_args,
    )
    n_dev = data_axis_size(mesh)
    n_batch = len(batch_ndims)
    multiprocess = jax.process_count() > 1

    def step(state, *args):
        batch = tuple(np.asarray(a) for a in args[:n_batch])
        if multiprocess:
            # Multi-host SPMD: each process feeds only its row block
            # (loader host_shard) — assemble the global batch-sharded
            # arrays from the local rows; batches that do not divide
            # the mesh fall back to allgather + the replicated
            # executable, exactly like the single-host remainder.
            from otfusion_tpu.parallel.multihost import (
                allgather_rows,
                global_batch_size,
                make_global_array,
                replicate_global,
            )

            rest = tuple(None if a is None else replicate_global(a, mesh)
                         for a in args[n_batch:])
            global_n = global_batch_size(batch[0].shape[0])
            if global_n % n_dev == 0:
                batch = tuple(
                    make_global_array(mesh, a, global_n) for a in batch
                )
                return main(state, *batch, *rest)
            batch = tuple(allgather_rows(a) for a in batch)
            return fallback(state, *batch, *rest)
        rest = tuple(None if a is None else jax.device_put(a, rep)
                     for a in args[n_batch:])
        fn = main if batch[0].shape[0] % n_dev == 0 else fallback
        return fn(state, *batch, *rest)

    return step


def _tp_state_shardings(mesh: Mesh, state_template):
    """The deterministic TP sharding tree for ``state_template`` — the
    exact layout ``place_state`` commits. Pinning a multi-process step's
    state in/out shardings to this tree keeps every process's
    independently-compiled executable on the SAME layout (unpinned
    outputs let per-process partitioners diverge, see ``_dp_wrap``)."""
    if state_template is None or not has_model_axis(mesh) \
            or jax.process_count() <= 1:
        return None
    return jax.tree_util.tree_map_with_path(
        _tp_rule_factory(mesh), state_template)


def make_dp_fusion_steps(model, mesh: Mesh, state_template=None,
                         **train_kwargs):
    """The fusion trainer's full step family, parallel over ``mesh``:
    (train_step, eval_step, feature_extract_step), all drop-in compatible
    with the single-device factories in train/steps.py. The caller places
    the state once with ``place_state``. On a 1-D mesh this is pure DP;
    on a 2-D (data, model) mesh the committed TP placement of the state
    (fusion-trunk Dense kernels column-sharded over ``model``) propagates
    through every step while batches shard over ``data``. Under a
    multi-process group pass the placed state as ``state_template`` so
    the TP layout is PINNED through every executable."""
    from otfusion_tpu.train.steps import (
        make_feature_extract_step,
        make_fusion_eval_step,
        make_fusion_train_step,
    )

    tp = has_model_axis(mesh)
    state_sh = _tp_state_shardings(mesh, state_template)
    train_raw = make_fusion_train_step(model, jit=False, **train_kwargs)
    eval_raw = make_fusion_eval_step(model, jit=False)
    feat_raw = make_feature_extract_step(model, jit=False)
    # (state, mri, pet, labels, tv, rng) / (…, tv) / (state, mri, pet)
    return (
        _dp_wrap(train_raw, mesh, (5, 5, 1), 2, donate=True, tp=tp,
                 out_state=True, state_shardings=state_sh),
        _dp_wrap(eval_raw, mesh, (5, 5, 1), 1, tp=tp,
                 state_shardings=state_sh),
        _dp_wrap(feat_raw, mesh, (5, 5), 0, tp=tp,
                 state_shardings=state_sh),
    )


def make_dp_unimodal_steps(model, mesh: Mesh, state_template=None,
                           **train_kwargs):
    """(train_step, eval_step) for the unimodal trainer over ``mesh``
    (DP on a 1-D mesh; DP + Dense-kernel TP on a 2-D mesh). Pass the
    placed state as ``state_template`` under multi-process groups (see
    ``make_dp_fusion_steps``)."""
    from otfusion_tpu.train.steps import (
        make_unimodal_eval_step,
        make_unimodal_train_step,
    )

    tp = has_model_axis(mesh)
    state_sh = _tp_state_shardings(mesh, state_template)
    train_raw = make_unimodal_train_step(model, jit=False, **train_kwargs)
    eval_raw = make_unimodal_eval_step(model, jit=False)
    # (state, vol, labels, rng) / (state, vol, labels)
    return (
        _dp_wrap(train_raw, mesh, (5, 1), 1, donate=True, tp=tp,
                 out_state=True, state_shardings=state_sh),
        _dp_wrap(eval_raw, mesh, (5, 1), 0, tp=tp,
                 state_shardings=state_sh),
    )


def make_sharded_coupling_pipeline(mesh: Mesh, axis: str = DATA_AXIS):
    """The per-epoch EGW+FOT coupling pipeline, sharded over the mesh.

    Sharding layout (the design promised by this module's docstring):
      * label groups (L, cap, d) shard the FEATURE axis d — the per-label
        GW cost builds (x xᵀ over d) contract the sharded dim, so XLA
        emits a psum over ICI and every chip holds a (cap, d/n) slice;
      * the (d_pet, d_mri) FOT cost matrix and its Sinkhorn solve shard
        by ROWS: the row-logsumexp is chip-local, the column-logsumexp
        becomes an all-reduce, both inserted by the SPMD partitioner;
      * the returned feature plan Tv stays row-sharded on device — the
        DP train step re-places (all-gathers) it lazily on first use.

    Requires d % n_devices == 0 (true at production: 2048 over 8); the
    caller (CouplingService) falls back to the replicated pipeline
    otherwise.

    Works across process boundaries too: every process holds the same
    global numpy groups (the feature step returns the replicated global
    batch), so each assembles the feature-sharded inputs from its own
    addressable shards via ``jax.make_array_from_callback``. Under
    multi-process the returned Tv is pinned replicated (host code
    np.asarray()s it for the train step's rest placement); single-process
    keeps the row-sharded layout.
    """
    from otfusion_tpu.train.coupling import coupling_pipeline_impl

    feat = NamedSharding(mesh, P(None, None, axis))
    rep = NamedSharding(mesh, P())
    multiprocess = jax.process_count() > 1
    row = rep if multiprocess else NamedSharding(mesh, P(axis, None))
    n_dev = data_axis_size(mesh)

    # pjit rejects kwargs when in_shardings is set, and the impl's
    # config args are keyword-only — shim them to positional statics.
    def _positional(pet_g, mri_g, pet_m, mri_m, epsilon,
                    gw_max_iterations, sinkhorn_max_iterations,
                    fot_epsilon, fot_max_iterations):
        return coupling_pipeline_impl(
            pet_g, mri_g, pet_m, mri_m, epsilon=epsilon,
            gw_max_iterations=gw_max_iterations,
            sinkhorn_max_iterations=sinkhorn_max_iterations,
            fot_epsilon=fot_epsilon,
            fot_max_iterations=fot_max_iterations)

    jitted = jax.jit(
        _positional,
        static_argnums=(4, 5, 6, 7, 8),
        in_shardings=(feat, feat, rep, rep),
        # Pin only Tv's layout (row-sharded); solver logs replicate.
        out_shardings=(row, rep, rep),
    )

    def _place(host_np, sharding):
        """Host numpy feeds in_shardings directly in a single process;
        across processes each host materialises only its addressable
        shards of the (identical) global value."""
        if not multiprocess:
            return np.asarray(host_np)
        host_np = np.asarray(host_np)
        return jax.make_array_from_callback(
            host_np.shape, sharding, lambda idx: host_np[idx])

    def pipeline(pet_groups, mri_groups, pet_mask, mri_mask, *,
                 epsilon=5e-3, gw_max_iterations=2000,
                 sinkhorn_max_iterations=2000, fot_epsilon=5e-3,
                 fot_max_iterations=2000):
        if pet_groups.shape[-1] % n_dev or mri_groups.shape[-1] % n_dev:
            raise ValueError(
                f"feature dims {pet_groups.shape[-1]}/"
                f"{mri_groups.shape[-1]} not divisible by mesh size "
                f"{n_dev}")
        return jitted(_place(pet_groups, feat), _place(mri_groups, feat),
                      _place(pet_mask, rep), _place(mri_mask, rep),
                      epsilon, gw_max_iterations,
                      sinkhorn_max_iterations, fot_epsilon,
                      fot_max_iterations)

    return pipeline


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
