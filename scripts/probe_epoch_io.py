"""Decompose the measured end-to-end epoch (bench.py:bench_epoch) into
host-I/O vs device time.

bench_epoch on the 1-CPU box reported a steady epoch of 276 s where the
component sum (6 train steps x 0.44 s + 1 eval batch x 0.22 s + 31 ms
coupling + cached I/O) predicts ~5 s. This probe walks the SAME three
loaders (train/feature/eval at the bench config: 64 pairs @128^3, B8,
bf16 feed, shared _VolumeCache) WITHOUT touching the device, timing two
passes — cold (first epoch's I/O) and warm (steady-state, cache-served).
Whatever the warm pass costs is honest host-side epoch overhead; the
remainder of the measured epoch is device/tunnel time, to be compared
against step-time x step-count.

CPU-only by construction (no jax import on the hot path).

    python scripts/probe_epoch_io.py [--data ~/.cache/otfusion_bench/adni128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def walk(loader, tag, results):
    t0 = time.time()
    n = 0
    for batch in loader:
        n += batch[0].shape[0] if hasattr(batch[0], "shape") else 1
    dt = time.time() - t0
    results[tag] = round(dt, 2)
    print(f"# {tag}: {dt:.2f} s ({n} samples)", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=os.path.expanduser(
        "~/.cache/otfusion_bench/adni128"))
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
    )
    from otfusion_tpu.data.loader import MultimodalLoader, _VolumeCache, prefetch
    from otfusion_tpu.data.splits import stratified_split

    ds = MultimodalNiftiDataset(
        root_dir=args.data, class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY)
    labels = [s[2] for s in ds.samples]
    train_idx, val_idx = stratified_split(labels, 0.25, 7)
    train_samples = [ds.samples[i] for i in train_idx]
    val_samples = [ds.samples[i] for i in val_idx]

    shape = (128, 128, 128)
    cache = _VolumeCache(shape, num_workers=4)
    import ml_dtypes  # bf16 feed, as the bf16 trainer uses

    feed = ml_dtypes.bfloat16
    mk = lambda samples, b, shuf, aug: MultimodalLoader(
        samples, shape, b, shuffle=shuf, augment=aug, seed=7,
        cache=cache, feed_dtype=feed)

    results = {}
    # cold pass = first epoch's I/O; warm pass = steady state
    for rnd in ("cold", "warm"):
        walk(prefetch(iter(mk(train_samples, args.batch, True, True))),
             f"train_{rnd}", results)
        walk(prefetch(iter(mk(train_samples, 16, False, False))),
             f"feature_{rnd}", results)
        walk(prefetch(iter(mk(val_samples, 16, False, False))),
             f"eval_{rnd}", results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
