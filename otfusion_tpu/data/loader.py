"""Batching and host->device feeding.

The reference uses torch DataLoader worker processes
(MRI_PET_OT.py:1023-1036). Here loading is a thread pool over the pure-
NumPy NIfTI reader (``num_workers`` threads, the reference flag), with an
LRU cache of preprocessed volumes (the ADNI cohort — hundreds of ~128^3
volumes — fits host RAM comfortably once resized, so epochs after the
first pay zero I/O; cohorts beyond the cache cap evict least-recently-
used). The training loops additionally wrap iteration in ``prefetch``,
assembling the next batch on a background thread while the device
computes the current step — the cold first epoch overlaps I/O with
compute instead of serialising them.

Batch shapes are static except the final partial batch, which is yielded
at its true size (reference DataLoader semantics; losses/metrics stay
exact). XLA compiles at most two signatures per step — the full batch and
the remainder — both cached across epochs.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import random
import threading
from collections import OrderedDict
from typing import Dict, Iterable, Iterator, List, Sequence, Tuple

import numpy as np

from otfusion_tpu.data.preprocess import load_volume


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Double-buffered iteration: a background thread keeps up to
    ``depth`` items ready while the consumer works on the current one.

    The worker only touches host NumPy (never jitted/device code — see
    CLAUDE.md); device dispatch stays on the consuming thread.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    errors: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer thread
            errors.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if errors:
                raise errors[0]
            return
        yield item


class _VolumeCache:
    """LRU cache of preprocessed volumes with thread-pool loading."""

    def __init__(self, target_shape, max_items: int = 2048,
                 num_workers: int = 8):
        self.target_shape = tuple(target_shape)
        self.max_items = max_items
        self._cache: OrderedDict[str, np.ndarray] = OrderedDict()
        self._pool = cf.ThreadPoolExecutor(max_workers=max(1, num_workers))

    def get_many(self, paths: Sequence[str]) -> List[np.ndarray]:
        missing = list({p for p in paths if p not in self._cache})
        loaded: Dict[str, np.ndarray] = {}
        if missing:
            results = self._pool.map(
                lambda p: load_volume(p, self.target_shape), missing
            )
            loaded = dict(zip(missing, results))
        # Serve this call entirely from cache + the just-loaded batch
        # (never re-read something evicted mid-call), THEN enforce the cap.
        out = []
        for p in paths:
            if p in loaded:
                out.append(loaded[p])
            else:
                self._cache.move_to_end(p)
                out.append(self._cache[p])
        for p, vol in loaded.items():
            self._cache[p] = vol
        while len(self._cache) > self.max_items:
            self._cache.popitem(last=False)
        return out


def _host_rows(idx: List[int], host_shard) -> List[int]:
    """Per-host contiguous row block of one global batch (multi-host
    loading: every process walks the SAME seeded global order but loads
    only its rows, matching parallel.multihost.host_rows — uneven
    remainders go to the leading hosts like np.array_split)."""
    if host_shard is None:
        return idx
    index, count = host_shard
    base, extra = divmod(len(idx), count)
    start = index * base + min(index, extra)
    return idx[start : start + base + (1 if index < extra else 0)]


def _augment_np(vol: np.ndarray, rng: random.Random) -> np.ndarray:
    """Host-side random axis flips (reference _augment, p=0.5 per axis)."""
    for axis in range(3):
        if rng.random() < 0.5:
            vol = np.flip(vol, axis=axis)
    return np.ascontiguousarray(vol)


def _augment_rng(seed: int, epoch: int, sample_idx: int,
                 stream: int = 0) -> random.Random:
    """Fresh RNG per (seed, epoch, sample[, modality stream]).

    Augmentation randomness must NOT consume the shuffle RNG's stream:
    under multi-host loading each process augments only its own row
    block, so shared-stream draws desynchronise the next epoch's shuffle
    across hosts whenever local row counts differ (ADVICE.md round-2
    finding 2) — global batches would then be assembled from DIFFERENT
    permutations per host. Keying on the global sample index keeps every
    host's shuffle state identical and makes the augmentation itself
    independent of which host loads the row."""
    return random.Random(
        (seed * 2654435761 + epoch * 97003 + sample_idx * 31 + stream)
        % (2 ** 63)
    )


def _stack(vols: List[np.ndarray], target_shape,
           dtype=np.float32) -> np.ndarray:
    """np.stack that tolerates an empty host row block (multi-host final
    partial batches smaller than the process count leave trailing hosts
    with zero rows — they must still yield a correctly-shaped batch for
    the allgather fallback, ADVICE.md round-2 finding 4)."""
    if not vols:
        return np.empty((0, *target_shape, 1), dtype)
    return np.stack(vols).astype(dtype, copy=False)


def feed_dtype_for(compute_dtype) -> np.dtype:
    """The dtype volumes should be SHIPPED to the device in, given the
    model's compute dtype.

    In bf16 mode the backbone stem casts its input to bf16 before the
    first conv (``flax.linen.Conv`` promotes x to the layer dtype), so
    feeding pre-cast bf16 volumes is BIT-IDENTICAL to feeding f32 — both
    reach the MXU as ``bf16(round-to-nearest-even(x))`` — while halving
    host->device transfer bytes and the batch's HBM footprint (the
    volumes are the largest per-step transfer: 2 x B x side^3 x 4 bytes
    at the fusion production shape). The cast runs on the loader/prefetch
    thread, overlapped with device compute. Any non-bf16 compute dtype
    keeps the f32 feed (tests/test_feed_dtype.py asserts the bf16
    equivalence bitwise)."""
    import ml_dtypes  # jax dependency, always present

    if np.dtype(compute_dtype) == np.dtype(ml_dtypes.bfloat16):
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(np.float32)


class Loader:
    """Unimodal loader over (path, label) samples."""

    def __init__(
        self,
        samples: Sequence[Tuple[str, int]],
        target_shape,
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        seed: int = 42,
        cache: _VolumeCache | None = None,
        host_shard: "Tuple[int, int] | None" = None,
        feed_dtype=np.float32,
    ):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.seed = seed
        self.rng = random.Random(seed)  # shuffle stream ONLY (see
        # _augment_rng: augmentation draws live on their own keys)
        self.cache = cache or _VolumeCache(target_shape)
        self.host_shard = host_shard
        self.feed_dtype = np.dtype(feed_dtype)
        self._epoch = 0

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self._epoch += 1
        order = list(range(len(self.samples)))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = _host_rows(order[start : start + bs], self.host_shard)
            paths = [self.samples[i][0] for i in idx]
            labels = [self.samples[i][1] for i in idx]
            vols = self.cache.get_many(paths)
            if self.augment:
                vols = [
                    _augment_np(v, _augment_rng(self.seed, self._epoch, i))
                    for v, i in zip(vols, idx)
                ]
            yield (_stack(vols, self.cache.target_shape, self.feed_dtype),
                   np.asarray(labels, np.int32))


class MultimodalLoader:
    """Paired loader over (mri_path, pet_path, label) samples."""

    def __init__(
        self,
        samples: Sequence[Tuple[str, str, int]],
        target_shape,
        batch_size: int,
        shuffle: bool = False,
        augment: bool = False,
        seed: int = 42,
        cache: _VolumeCache | None = None,
        host_shard: "Tuple[int, int] | None" = None,
        feed_dtype=np.float32,
    ):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.seed = seed
        self.rng = random.Random(seed)  # shuffle stream ONLY
        self.cache = cache or _VolumeCache(target_shape)
        self.host_shard = host_shard
        self.feed_dtype = np.dtype(feed_dtype)
        self._epoch = 0

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(
        self,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        self._epoch += 1
        order = list(range(len(self.samples)))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = _host_rows(order[start : start + bs], self.host_shard)
            mri_paths = [self.samples[i][0] for i in idx]
            pet_paths = [self.samples[i][1] for i in idx]
            labels = [self.samples[i][2] for i in idx]
            vols = self.cache.get_many(mri_paths + pet_paths)
            mri = vols[: len(idx)]
            pet = vols[len(idx) :]
            if self.augment:
                # per-modality independent flips (reference _augment,
                # MRI_PET_OT.py:342-374): distinct streams per modality
                mri = [
                    _augment_np(v, _augment_rng(self.seed, self._epoch, i, 0))
                    for v, i in zip(mri, idx)
                ]
                pet = [
                    _augment_np(v, _augment_rng(self.seed, self._epoch, i, 1))
                    for v, i in zip(pet, idx)
                ]
            yield (
                _stack(mri, self.cache.target_shape, self.feed_dtype),
                _stack(pet, self.cache.target_shape, self.feed_dtype),
                np.asarray(labels, np.int32),
            )
