"""Multi-host (multi-process) execution support.

The reference is strictly single-process (SURVEY.md §2.6); this module is
the TPU-native scale-out path it never had: ``jax.distributed`` process
groups, per-host batch sharding, and global-array assembly via
``jax.make_array_from_process_local_data`` — the standard JAX multi-host
recipe (each process feeds only its addressable shard; XLA's collectives
ride ICI/DCN underneath the same ``Mesh`` the single-host path uses).

Nothing else in the framework changes shape: ``resolve_mesh`` already
builds its mesh from ``jax.devices()`` (global across processes once
``initialize_multihost`` has run), the DP/TP step families keep their
in_shardings, and GSPMD inserts the cross-host collectives.

Verified in-tree with real multi-process CPU groups (Gloo collectives):
tests/test_multihost.py spawns two 4-device processes and checks the
fusion train step's global loss against the single-process value.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join (or auto-detect) a ``jax.distributed`` process group.

    Arguments default to the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, which ``jax.distributed.initialize`` also reads
    natively on supported platforms). Returns True when a multi-process
    group is active after the call; a no-op single-process setup returns
    False. Idempotent: calling after initialization just reports state.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # Do NOT touch jax.process_count() here — it initialises the XLA
    # backend, after which distributed.initialize refuses to run.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1  # already joined
    if coordinator_address is None and num_processes is None:
        # Nothing to join — plain single-process run.
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def host_shard_spec() -> Tuple[int, int]:
    """(process_index, process_count) — the loader's ``host_shard``."""
    return jax.process_index(), jax.process_count()


def host_rows(global_batch: int, index: Optional[int] = None,
              count: Optional[int] = None) -> slice:
    """Contiguous row block of a global batch owned by one host.

    Matches the device order of a mesh built over ``jax.devices()``
    (devices sort by process), so row block p feeds process p's
    addressable shards. Uneven remainders go to the leading hosts,
    mirroring ``np.array_split``.
    """
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    base, extra = divmod(global_batch, count)
    start = index * base + min(index, extra)
    return slice(start, start + base + (1 if index < extra else 0))


def make_global_array(mesh, local: np.ndarray, global_batch: int,
                      sharding=None):
    """Assemble one global batch-sharded array from this host's rows
    (jax.make_array_from_process_local_data)."""
    from otfusion_tpu.parallel.mesh import batch_sharded

    local = np.asarray(local)
    sharding = sharding or batch_sharded(mesh, local.ndim)
    global_shape = (global_batch,) + local.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, local, global_shape)


def allgather_rows(local: np.ndarray) -> np.ndarray:
    """Gather every host's rows into the full host-local batch (the
    replicated-fallback path for batches that do not divide the mesh).
    Handles unequal per-host row counts — process_allgather needs equal
    shapes, so rows are padded to the max count and trimmed after."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return np.asarray(local)
    local = np.asarray(local)
    counts = multihost_utils.process_allgather(
        np.asarray([local.shape[0]]), tiled=False).reshape(-1)
    n_max = int(counts.max())
    padded = local
    if local.shape[0] < n_max:
        pad = np.zeros((n_max - local.shape[0],) + local.shape[1:],
                       local.dtype)
        padded = np.concatenate([local, pad], axis=0)
    gathered = multihost_utils.process_allgather(padded, tiled=False)
    return np.concatenate(
        [np.asarray(gathered[p])[: int(counts[p])]
         for p in range(len(counts))], axis=0)


def global_batch_size(local_rows: int) -> int:
    """Sum of every host's local row count (scalar allgather)."""
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return int(local_rows)
    counts = multihost_utils.process_allgather(
        np.asarray([local_rows]), tiled=False)
    return int(np.sum(counts))


def replicate_global(value, mesh):
    """Replicated placement that works across processes: device_put
    rejects non-addressable shardings, so the global replicated array is
    assembled from each process's (identical, SPMD-consistent) host copy
    via make_array_from_process_local_data."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    if isinstance(value, jax.Array) and not value.is_fully_addressable:
        # Already a global array (e.g. the coupling pipeline's replicated
        # Tv): np.asarray would raise on non-addressable shards. A
        # replicated array's local shard IS the global value — re-place
        # from it; anything else must be resharded by its producer.
        if not value.sharding.is_fully_replicated:
            raise ValueError(
                "replicate_global got a non-replicated global array "
                f"(sharding {value.sharding}); reshard it at the "
                "producer")
        value = np.asarray(value.addressable_data(0))
    if jnp.issubdtype(getattr(value, "dtype", None), jax.dtypes.prng_key):
        # typed PRNG keys can't round-trip through numpy — place the
        # underlying uint32 data and re-wrap
        impl = jax.random.key_impl(value)
        data = np.asarray(jax.random.key_data(value))
        placed = jax.make_array_from_process_local_data(rep, data,
                                                        data.shape)
        return jax.random.wrap_key_data(placed, impl=impl)
    host = np.asarray(value)
    return jax.make_array_from_process_local_data(rep, host, host.shape)


def place_global(value, sharding):
    """Place an SPMD-consistent host value into an ARBITRARY
    NamedSharding across processes.

    device_put rejects non-addressable shardings; every process holds
    the identical full host array (e.g. a freshly-initialised TP kernel)
    and ``jax.make_array_from_callback`` asks each process only for its
    addressable shards — the standard multi-host placement recipe for
    sharded (not just replicated) layouts."""
    host = np.asarray(value)
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def is_primary() -> bool:
    """True on the process that owns filesystem artifacts (results.txt,
    checkpoints, metrics) — process 0."""
    return jax.process_index() == 0


def warmup_collectives(*meshes) -> None:
    """Establish every collective clique a mesh will use, NOW, while the
    processes are still in lockstep.

    XLA's CPU (Gloo) collectives initialise a context per device-set the
    first time that set communicates, and the context handshake reads
    the peer's address from the coordination service with a HARD 30 s
    timeout (``GetKeyValue() timed out``, not configurable from JAX).
    Big per-process compiles skew the processes by minutes on loaded
    hosts, so a clique first touched mid-training can miss the handshake
    window and kill the group — while an ALREADY-established clique
    tolerates arbitrary peer skew (measured: a 70 s one-sided stall at a
    warm psum just waits; tests/test_multihost.py relies on this).

    For each mesh this runs one tiny psum over every individual axis
    (creating the per-axis subgroup cliques, e.g. the (data 4) columns
    of a 4x2 DPxTP mesh) plus one over all axes together (the
    all-device clique used by replication/allgather). Single-process
    groups return immediately. TPU ICI collectives don't use Gloo, but
    the warmup is a few microseconds of device time there — safe to call
    unconditionally after ``resolve_mesh`` under --multihost."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    for mesh in meshes:
        if mesh is None:
            continue
        names = tuple(mesh.axis_names)
        shape = tuple(mesh.shape[n] for n in names)
        host = np.ones(shape, np.float32)
        arr = jax.make_array_from_callback(
            shape, NamedSharding(mesh, P(*names)), lambda idx: host[idx])
        axis_sets = [(n,) for n in names]
        if len(names) > 1:
            axis_sets.append(names)
        for axes in axis_sets:
            f = jax.jit(
                jax.shard_map(lambda v: jax.lax.psum(v, axes), mesh=mesh,
                              in_specs=P(*names), out_specs=P(*(
                                  None if n in axes else n for n in names))),
            )
            # block (not np.asarray: the psum output keeps non-addressable
            # shards on the other axes) — the clique must exist on return
            jax.block_until_ready(f(arr))


__all__ = [
    "allgather_rows",
    "global_batch_size",
    "host_rows",
    "host_shard_spec",
    "initialize_multihost",
    "is_primary",
    "make_global_array",
    "place_global",
    "replicate_global",
]
