"""Honest timing: fused Pallas GW kernel vs the XLA while_loop solver.

Production shape: 2 labels x 64 samples x 2048-dim features (the
--max-jax-samples cap). Methodology follows bench.py (chained inputs,
scalar fetch per call — includes host RTT through the tunnel).

Usage: python scripts/bench_gw_kernel.py [--cap 64] [--runs 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--chain", type=int, default=16,
                    help="solves per jitted call — amortises the ~25 ms "
                         "host RTT through the tunnel that would "
                         "otherwise dominate both timings")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from otfusion_tpu.cli.common import enable_compilation_cache
    from otfusion_tpu.ops.gromov import egw_per_label
    from otfusion_tpu.experimental.gw_kernel import egw_per_label_pallas

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    L, cap, d = 2, args.cap, args.d
    z = rng.normal(size=(L, cap, 8))
    x = (z @ rng.normal(size=(8, d))
         + 0.05 * rng.normal(size=(L, cap, d))).astype(np.float32)
    y = (z @ rng.normal(size=(8, d))
         + 0.05 * rng.normal(size=(L, cap, d))).astype(np.float32)
    mask = jnp.ones((L, cap), bool)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    base_solvers = {
        "xla_while_loop": lambda a, b: egw_per_label(
            a, b, mask, mask, epsilon=5e-3, max_iterations=2000,
            sinkhorn_max_iterations=2000),
        "pallas_fused": lambda a, b: egw_per_label_pallas(
            a, b, mask, mask, epsilon=5e-3, max_iterations=2000),
    }
    K = args.chain

    def chained(solve):
        # K solves serialised on-device (each input perturbed by the
        # previous output so nothing pipelines or caches); one host RTT.
        def run(a, b):
            def step(carry, _):
                a_cur, acc = carry
                res = solve(a_cur, b)
                s = jnp.sum(res.coupling)
                return (a_cur * (1.0 + s * 1e-9), acc + s), res.n_iters
            (a_fin, acc), iters = jax.lax.scan(
                step, (a, jnp.float32(0.0)), None, length=K)
            return acc, iters
        return jax.jit(run)

    results = {}
    for name, base in base_solvers.items():
        solve = chained(base)
        acc, iters = solve(xj, yj)
        float(acc)  # warm-up + sync
        t0 = time.time()
        for i in range(args.runs):
            acc, iters = solve(xj * (1.0 + float(acc) * 1e-9), yj)
            float(acc)
        dt = (time.time() - t0) / (args.runs * K)
        res = jax.jit(base)(xj, yj)
        results[name] = (dt, res)
        print(f"{name}: {dt*1000:.2f} ms/solve (chain {K}, RTT "
              f"amortised)  iters={np.asarray(res.n_iters).tolist()} "
              f"converged={np.asarray(res.converged).tolist()}",
              flush=True)

    t_x = np.asarray(results["xla_while_loop"][1].coupling)
    t_p = np.asarray(results["pallas_fused"][1].coupling)
    print(f"plan max|diff| = {np.abs(t_x - t_p).max():.2e}")
    speedup = results["xla_while_loop"][0] / results["pallas_fused"][0]
    print(f"pallas speedup over XLA: {speedup:.2f}x "
          f"({'WIN' if speedup > 1 else 'LOSS'}) on {jax.devices()[0]}")


if __name__ == "__main__":
    main()
