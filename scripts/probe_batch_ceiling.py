"""Probe the single-copy batch ceiling between the known-good B=8 and
the known-HTTP-500 B=12 (docs/perf_notes.md lever 3), measuring
throughput + MFU at each compiling size — one of round-5's
profiler-guided attempts past 30% MFU: larger batches raise arithmetic
intensity in exactly the 64-channel early-stage convs the perf trace
blames for the residual gap.

Also (optionally, --xla-flags-probe) checks whether XLA_FLAGS reach the
server-side compiler in this tunneled environment: compiles a trivial
jit with a bogus flag — if nothing rejects it, flag sweeps are
unverifiable here and the result records that as the documented dead
end rather than reporting placebo numbers.

Usage: python scripts/probe_batch_ceiling.py [--batches 9 10 11]
Writes one JSON line per probe to stdout; run on a quiet chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[9, 10, 11])
    ap.add_argument("--s2d", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    from otfusion_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import bench

    for b in args.batches:
        try:
            step_s, sps, mfu, flops = bench.bench_train_step(
                batch=b, s2d_stem=args.s2d)
            print(json.dumps({
                "batch": b, "ok": True,
                "step_ms": round(step_s * 1000, 1),
                "samples_per_s": round(sps, 2),
                "mfu": mfu and round(mfu, 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"batch": b, "ok": False,
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
