"""Grad-accum compile-ceiling probe (VERDICT r3 weak #2 / next-step 3).

Attempts to compile (and, if compile succeeds, run + time) ONE flagship
fusion train step with gradient accumulation at a requested shape on the
real TPU, printing a single RESULT line per invocation. Run one config
per process so a server-side compile failure (HTTP 500 through the
remote-compile tunnel) can't poison subsequent probes:

    python scripts/probe_grad_accum.py --batch 8 --accum 2 --remat
    python scripts/probe_grad_accum.py --batch 4 --accum 2 --side 128
    ...

The round-3 negative result said "ANY two-microbatch structure of the
depth-101 @128^3 body fails"; the judge's objection: a microbatch-4 scan
body is SMALLER than the single B=8 body that compiles fine, so a pure
resource-ceiling explanation is incomplete. The decisive configs:

  * --batch 4 --accum 2 (microbatch 2, effective B4): plain B4 compiles,
    so failure here isolates the ACCUM STRUCTURE, not body size.
  * --batch 8 --accum 2 --remat: remat shrinks live activations ~2x; if
    the ceiling is server-side compile memory over live buffers this
    should pass where non-remat failed.
  * --no-donate variants rule out donation-aliasing interactions.
"""

import argparse
import os
import sys
import time

import numpy as np

# repo-root import without PYTHONPATH (setting PYTHONPATH perturbs the
# axon TPU plugin registration in this environment)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=101)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--side", type=int, default=128)
    p.add_argument("--accum", type=int, default=2)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-donate", action="store_true")
    p.add_argument("--runs", type=int, default=6,
                   help="timed executions after compile (0 = compile only)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from otfusion_tpu.cli.common import enable_compilation_cache
    from otfusion_tpu.models import MultimodalOTFusion
    from otfusion_tpu.models.resnet3d import feature_dim
    from otfusion_tpu.train import create_train_state
    from otfusion_tpu.train.steps import make_fusion_train_step

    enable_compilation_cache()
    tag = (f"depth{args.depth} B{args.batch} @{args.side}^3 "
           f"accum{args.accum} remat={args.remat} "
           f"donate={not args.no_donate}")
    print(f"# probing {tag}", file=sys.stderr, flush=True)

    model = MultimodalOTFusion(
        num_classes=2, depth=args.depth, variant="per_epoch_attn",
        dtype=jnp.bfloat16, remat=args.remat, s2d_stem=True,
    )
    d = feature_dim(args.depth)
    rng = np.random.default_rng(1)
    shape = (args.batch, args.side, args.side, args.side, 1)
    mri = jnp.asarray(rng.normal(size=shape), jnp.float32)
    pet = jnp.asarray(rng.normal(size=shape), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=args.batch))
    tv = jnp.full((d, d), 1.0 / (d * d), jnp.float32)
    state = create_train_state(model, jax.random.key(0), (mri, pet),
                               1e-4, t_feature=tv)
    step = make_fusion_train_step(model, donate=not args.no_donate,
                                  grad_accum=args.accum)
    key = jax.random.key(1)

    t0 = time.time()
    try:
        state, met = step(state, mri, pet, labels, tv, key)
        float(met["loss"])
    except Exception as e:
        dt = time.time() - t0
        print(f"RESULT {tag} | COMPILE_FAIL after {dt:.0f}s | "
              f"{type(e).__name__}: {str(e)[:300]}")
        return 1
    compile_s = time.time() - t0
    times = []
    eps = jnp.float32(0.0)
    for i in range(args.runs):
        t0 = time.time()
        state, met = step(state, mri * (1.0 + eps), pet, labels, tv,
                          jax.random.fold_in(key, i))
        eps = met["loss"] * 1e-9
        float(met["loss"])
        times.append(time.time() - t0)
    med = float(np.median(times)) if times else float("nan")
    print(f"RESULT {tag} | OK compile={compile_s:.0f}s "
          f"step={med*1000:.0f}ms "
          f"({args.batch/med:.2f} samples/s effective-B{args.batch})"
          if times else
          f"RESULT {tag} | OK compile={compile_s:.0f}s (compile-only)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
