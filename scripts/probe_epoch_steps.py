"""Per-step instrumentation of the REAL flagship trainer epoch.

bench_epoch measures 32 s/train-step where the identical jitted step
measures 0.44 s in bench.py and the isolated pieces (fresh-numpy H2D
~3 s/batch at the tunnel's ~22 MB/s, warm loader ~0.5 s/batch
overlapped) account for <4 s. This wraps `_run_train_epoch` with a
timing twin that splits every iteration into: wait-for-batch (loader /
prefetch), dispatch (the `train_step(...)` call returning), and fetch
(the lagged metric conversion) — plus coarse timers around the coupling
and eval phases — and runs the production-shape bench cohort for 2
epochs on the real chip.

    python scripts/probe_epoch_steps.py [--epochs 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--data", default=os.path.expanduser(
        "~/.cache/otfusion_bench/adni128"))
    args = ap.parse_args()

    from otfusion_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from otfusion_tpu.train import loop as L

    def timed_train_epoch(train_step, state, loader, extra_args, rng_base):
        from collections import deque

        total_loss, total_correct, total_n = 0.0, 0, 0
        pending = deque()
        it = iter(L.prefetch(iter(loader)))
        i = 0
        while True:
            t0 = time.time()
            try:
                batch = next(it)
            except StopIteration:
                break
            t_batch = time.time() - t0
            rng = jax.random.fold_in(rng_base, i)
            t0 = time.time()
            state, met = train_step(state, *batch, *extra_args, rng)
            t_disp = time.time() - t0
            pending.append((met, L._global_n(batch[-1].shape[0])))
            t0 = time.time()
            if len(pending) > L._PIPELINE_LAG:
                met0, n = pending.popleft()
                total_loss += float(met0["loss"]) * n
                total_correct += int(met0["correct"])
                total_n += n
            t_fetch = time.time() - t0
            print(f"#   step {i}: wait_batch {t_batch:.2f}s | dispatch "
                  f"{t_disp:.2f}s | fetch {t_fetch:.2f}s",
                  file=sys.stderr, flush=True)
            i += 1
        t0 = time.time()
        for met0, n in pending:
            total_loss += float(met0["loss"]) * n
            total_correct += int(met0["correct"])
            total_n += n
        print(f"#   drain: {time.time()-t0:.2f}s", file=sys.stderr,
              flush=True)
        return state, total_loss / total_n, total_correct / total_n

    L._run_train_epoch = timed_train_epoch

    # Coarse wall timers around the other phases via the phase clock.
    orig_phase = L._clock.phase if hasattr(L, "_clock") else None

    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
    )
    from otfusion_tpu.data.splits import stratified_split
    from otfusion_tpu.train.loop import run_fusion_training

    ds = MultimodalNiftiDataset(
        root_dir=args.data, class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY)
    labels = [s[2] for s in ds.samples]
    train_idx, val_idx = stratified_split(labels, 0.25, 7)

    import tempfile

    import jax.numpy as jnp

    with tempfile.TemporaryDirectory(prefix="probe_epoch_") as save:
        run_fusion_training(
            samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
            class_names=CLASS_NAMES_MRI_BINARY, model_depth=101,
            target_shape=(128,) * 3, batch_size=8, lr=1e-4,
            epochs=args.epochs, seed=7, variant="per_epoch_attn",
            dtype=jnp.bfloat16, s2d_stem=True, num_workers=4,
            progress=False, save_path=save, latest_every=args.epochs,
        )
        with open(os.path.join(save, "metrics.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                print(f"# epoch {r['epoch']}: {r['epoch_seconds']:.1f}s "
                      f"phases {r.get('phase_seconds')}", file=sys.stderr)


if __name__ == "__main__":
    main()
