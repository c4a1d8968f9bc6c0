"""Benchmark: per-epoch OT coupling (EGW per label + FOT) on TPU vs the
reference's CPU-NumPy solver path.

The reference computes its coupling once per epoch on CPU (JAX pinned to
CPU with JIT disabled, MRI_PET_OT.py:18-27; POT/NumPy in the nojax
variant) at the shapes used in production: 2 labels x 64 samples/label of
2048-dim features (``--max-jax-samples`` default), then a 2048x2048
feature plan. BASELINE.md's north-star is a >=10x epoch-time speedup of
exactly this path; since the OT solve dominates the reference's epoch
overhead, this benchmark times the identical algorithm (same epsilons,
same convergence thresholds, same iteration caps):

  * TPU: otfusion_tpu.train.coupling.coupling_pipeline — one jitted
    program (vmapped per-label entropic GW + fused block-diagonal FOT).
  * CPU baseline: float64 NumPy log-domain implementation of the same
    math (the reference's own solver family: NumPy Sinkhorn matrix
    scaling, perturbot/match/utils.py:6-115, driven by the same BCD
    structure as fot.py).

Prints ONE JSON line: value = TPU couplings/sec; vs_baseline = speedup of
the TPU pipeline over the CPU-NumPy pipeline (target >= 10).
"""

import json
import sys
import time

import numpy as np


def _numpy_reference_epoch(pet_g, mri_g, eps=5e-3):
    """Reference-style CPU solve: per-label entropic GW + FOT."""
    sys.path.insert(0, "tests")
    from oracles import entropic_gw_np, fot_np

    ts_blocks = []
    for l in range(pet_g.shape[0]):
        ts_blocks.append(
            entropic_gw_np(pet_g[l], mri_g[l], epsilon=eps,
                           outer_iterations=2000, tol=1e-5)
        )
    n = sum(b.shape[0] for b in ts_blocks)
    ts = np.zeros((n, n))
    o = 0
    for b in ts_blocks:
        ts[o : o + b.shape[0], o : o + b.shape[1]] = b
        o += b.shape[0]
    x = np.concatenate([pet_g[l] for l in range(pet_g.shape[0])])
    y = np.concatenate([mri_g[l] for l in range(mri_g.shape[0])])
    return fot_np(x, y, ts, epsilon=eps)


def main():
    import jax
    import jax.numpy as jnp

    from otfusion_tpu.cli.common import enable_compilation_cache
    from otfusion_tpu.train.coupling import coupling_pipeline

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    L, cap, d = 2, 64, 2048
    base = rng.normal(size=(L, cap, d)).astype(np.float32)
    mri_g = base + 0.1 * rng.normal(size=(L, cap, d)).astype(np.float32)
    pet_g = (base @ rng.normal(size=(d, d)).astype(np.float32) * 0.02)
    mask = np.ones((L, cap), bool)

    args = (
        jnp.asarray(pet_g), jnp.asarray(mri_g),
        jnp.asarray(mask), jnp.asarray(mask),
    )
    kwargs = dict(epsilon=5e-3, gw_max_iterations=2000,
                  sinkhorn_max_iterations=2000, fot_epsilon=5e-3,
                  fot_max_iterations=2000)

    # Timing methodology (tunneled-TPU-safe, conservative): on this
    # backend block_until_ready is effectively a no-op and identical
    # inputs can be served from a cache, so each timed call (a) perturbs
    # the input with the previous output (no caching/pipelining) and
    # (b) synchronises by FETCHING a scalar to the host — the measured
    # time therefore INCLUDES a full host round-trip (~tens of ms through
    # the tunnel), an upper bound on the coupling's device time.
    def run_once(scale):
        out = coupling_pipeline(args[0] * scale, *args[1:], **kwargs)
        return out, float(jnp.sum(out[0]))

    (tv, gw, fot_res), acc = run_once(1.0)
    for i in range(4):  # first post-compile calls carry server warm-up
        (tv, gw, fot_res), acc = run_once(1.0 + (acc + i) * 1e-7)

    n_runs = 10
    t0 = time.time()
    for i in range(n_runs):
        (tv, gw, fot_res), acc = run_once(1.0 + (acc + i) * 1e-7)
    tpu_time = (time.time() - t0) / n_runs

    cpu_times = []
    for _ in range(2):  # min of 2: robust to ambient host load
        t0 = time.time()
        tv_np = _numpy_reference_epoch(pet_g, mri_g)
        cpu_times.append(time.time() - t0)
    cpu_time = min(cpu_times)

    # Same problem, comparable answers (both satisfy the same marginals).
    agree = float(np.abs(np.asarray(tv).sum(1) - 1.0 / d).max())
    speedup = cpu_time / tpu_time
    print(
        f"# TPU coupling: {tpu_time*1000:.0f} ms | CPU-NumPy reference: "
        f"{cpu_time:.1f} s | speedup {speedup:.1f}x | marginal dev {agree:.1e} "
        f"| gw iters {np.asarray(gw.n_iters).tolist()} "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "per_epoch_ot_coupling_speedup_vs_cpu_numpy",
        "value": round(1.0 / tpu_time, 3),
        "unit": "couplings/s (2x64x2048 EGW + 2048^2 FOT)",
        "vs_baseline": round(speedup, 2),
    }))


if __name__ == "__main__":
    main()
