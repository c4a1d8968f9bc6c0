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
    ):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.rng = random.Random(seed)
        self.cache = cache or _VolumeCache(target_shape)
        self.host_shard = host_shard

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
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
                vols = [_augment_np(v, self.rng) for v in vols]
            yield np.stack(vols), np.asarray(labels, np.int32)


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
    ):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.rng = random.Random(seed)
        self.cache = cache or _VolumeCache(target_shape)
        self.host_shard = host_shard

    def __len__(self) -> int:
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def __iter__(
        self,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
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
                mri = [_augment_np(v, self.rng) for v in mri]
                pet = [_augment_np(v, self.rng) for v in pet]
            yield (
                np.stack(mri),
                np.stack(pet),
                np.asarray(labels, np.int32),
            )
