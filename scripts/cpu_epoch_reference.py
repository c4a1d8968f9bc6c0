"""Measure the CPU-reference anchor for the north-star epoch-time claim
(BASELINE.json: ">=10x epoch-time speedup over the reference nojax
path"; VERDICT r4 weak #5 asked for the epoch number to be MEASURED,
not inferred).

The reference nojax path pins JAX to CPU with JIT disabled
(MRI_PET_OT.py:18-27) and solves its per-epoch coupling on host; its
epoch = train steps + coupling + eval on CPU. A full depth-101 @128^3
CPU epoch is infeasible to run outright on this host (hundreds of
seconds PER STEP), so this script measures the per-sample CPU train and
eval step cost at batch 1 — the smallest honest anchor, linear in batch
for conv nets — and composes the epoch estimate:

    cpu_epoch ~= n_train * cpu_train_step_B1
               + n_val * cpu_eval_step_B1
               + cpu_coupling          (measured separately by bench.py)

Run on a QUIET host (1 concurrent pytest halves CPU throughput).
Prints one JSON line. Compare against bench.py's measured `epoch_s`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    # CPU backend, single process — must be set before backend init.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from otfusion_tpu.models import MultimodalOTFusion
    from otfusion_tpu.models.resnet3d import feature_dim
    from otfusion_tpu.train import create_train_state
    from otfusion_tpu.train.steps import (
        make_fusion_eval_step,
        make_fusion_train_step,
    )

    depth, side, batch = 101, 128, 1
    model = MultimodalOTFusion(num_classes=2, depth=depth,
                               variant="per_epoch_attn",
                               dtype=jnp.float32)  # nojax path is f32
    d = feature_dim(depth)
    rng = np.random.default_rng(5)
    shape = (batch, side, side, side, 1)
    mri = jnp.asarray(rng.normal(size=shape), jnp.float32)
    pet = jnp.asarray(rng.normal(size=shape), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=batch))
    tv = jnp.full((d, d), 1.0 / (d * d), jnp.float32)
    state = create_train_state(model, jax.random.key(0), (mri, pet),
                               1e-4, t_feature=tv)
    # donate=False: the timing loop reuses `state` across calls (a
    # donated buffer would be dead after the warm-up execution); memory
    # headroom is irrelevant for a 2-call CPU timing.
    train_step = make_fusion_train_step(model, donate=False)
    eval_step = make_fusion_eval_step(model)
    key = jax.random.key(1)

    def timed(fn, n=2):
        ts = []
        for i in range(n):
            t0 = time.time()
            out = fn(i)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts)  # best-of: robust to ambient load

    # one warm-up compile each, then timed executions
    state, met = train_step(state, mri, pet, labels, tv, key)
    float(met["loss"])
    t_train = timed(lambda i: train_step(state, mri, pet, labels, tv,
                                         jax.random.fold_in(key, i))[1][
                                             "loss"])
    eval_step(state, mri, pet, labels, tv)
    t_eval = timed(lambda i: eval_step(state, mri * (1.0 + i * 1e-6),
                                       pet, labels, tv)["loss"])

    # Production-epoch composition at the bench_epoch shape (64 pairs,
    # 48 train / 16 val at B8 — batch-linear extrapolation from B1).
    n_train, n_val = 48, 16
    est = n_train * t_train + n_val * t_eval
    print(json.dumps({
        "cpu_train_step_b1_s": round(t_train, 2),
        "cpu_eval_step_b1_s": round(t_eval, 2),
        "host_nproc": os.cpu_count(),
        "epoch_estimate_s_excl_coupling": round(est, 1),
        "note": "add bench.py's cpu_ref_s_this_host for the coupling "
                "term; compare with bench.py epoch_s",
    }), flush=True)


if __name__ == "__main__":
    main()
