"""MFU probe (VERDICT r4 item 7): can the flagship's dual-backbone step
beat 30% MFU by restructuring how the two ResNet3D backbones execute?

Hypothesis under test: the residual MFU gap is the 64-channel layer-1/2
conv tail (docs/perf_notes.md "where the time goes") — with C=64 the
implicit-GEMM fills only half the MXU's 128 lanes. The flagship runs TWO
architecturally identical depth-101 backbones (MRI + PET, separate
weights; models/fusion.py:139-143). ``jax.vmap``-ing ONE backbone apply
over a stacked modality axis presents XLA with batched convs over both
weight sets at once — twice the per-conv work, which XLA may lower as
grouped convolution (2 groups x 64 ch = 128 lanes) or at least schedule
as one larger fusion.

Isolates the backbone core (forward + backward of a scalar loss at the
production shape, depth-101 B8 @128^3 bf16 s2d) so the comparison is not
diluted by the fusion head / optimiser tail. One config per process
invocation (round-4 gotcha: a failed big compile can wedge the tunnel —
keep blast radii separate):

    python scripts/probe_mfu.py seq    # two sequential applies (today's
                                       # structure, models/fusion.py)
    python scripts/probe_mfu.py vmap   # vmap over stacked modality axis
    python scripts/probe_mfu.py opts --flag xla_tpu_scoped_vmem_limit_kib=65536
                                       # compiler_options probe: does the
                                       # axon server-side compile honor
                                       # per-jit TPU flags at all?

Each run prints one JSON line with compile seconds, median step ms over
10 chained iterations, samples/s, and (when the cost model responds)
XLA-FLOPs + MFU. Results land in docs/perf_notes.md either way (win or
documented dead end, same rigor as the Pallas negative results).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # repo root; PYTHONPATH breaks axon registration

PEAK_BF16 = 1.97e14  # v5e per-chip bf16 peak (jax-ml.github.io/scaling-book)


def _inputs(batch, side):
    rng = np.random.default_rng(11)
    shape = (batch, side, side, side, 1)
    return (rng.normal(size=shape).astype(np.float32),
            rng.normal(size=shape).astype(np.float32))


def _backbone(depth, remat=False):
    import jax.numpy as jnp

    from otfusion_tpu.models.resnet3d import ResNet3DBackbone

    return ResNet3DBackbone(depth=depth, dtype=jnp.bfloat16, remat=remat,
                            s2d_stem=True)


def _time_loop(step, args0, n_warm=4, n_runs=10):
    """Chained honest timing: perturb the first arg on the previous loss,
    fetch a scalar per call (bench.py methodology)."""
    import jax.numpy as jnp

    eps = jnp.float32(0.0)
    times, out = [], None
    for i in range(n_warm + n_runs):
        t0 = time.time()
        out = step(args0[0] * (1.0 + eps), *args0[1:])
        eps = out * 1e-9
        float(out)
        times.append(time.time() - t0)
    return float(np.median(times[n_warm:])), times


def probe_seq(depth, batch, side):
    """Two sequential backbone applies — the current fusion structure."""
    import jax
    import jax.numpy as jnp

    bb = _backbone(depth)
    mri, pet = _inputs(batch, side)
    mri, pet = jnp.asarray(mri), jnp.asarray(pet)
    v_mri = bb.init(jax.random.key(0), mri, train=True)
    v_pet = bb.init(jax.random.key(1), pet, train=True)

    def loss_fn(p_mri, p_pet, x_mri, x_pet):
        f_mri, _ = bb.apply(
            {"params": p_mri, "batch_stats": v_mri["batch_stats"]},
            x_mri, train=True, mutable=["batch_stats"])
        f_pet, _ = bb.apply(
            {"params": p_pet, "batch_stats": v_pet["batch_stats"]},
            x_pet, train=True, mutable=["batch_stats"])
        return (jnp.mean(jnp.square(f_mri.astype(jnp.float32)))
                + jnp.mean(jnp.square(f_pet.astype(jnp.float32))))

    @jax.jit
    def step(x_mri, x_pet):
        l, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            v_mri["params"], v_pet["params"], x_mri, x_pet)
        # consume the grads so nothing is DCE'd; one scalar out
        return l + sum(jnp.sum(jnp.abs(g)) for g in
                       jax.tree_util.tree_leaves(grads)) * 1e-12

    return step, (mri, pet)


def probe_vmap(depth, batch, side):
    """One vmapped apply over a stacked modality axis (params + inputs)."""
    import jax
    import jax.numpy as jnp

    bb = _backbone(depth)
    mri, pet = _inputs(batch, side)
    x2 = jnp.stack([jnp.asarray(mri), jnp.asarray(pet)])
    v_mri = bb.init(jax.random.key(0), x2[0], train=True)
    v_pet = bb.init(jax.random.key(1), x2[1], train=True)
    stack = lambda a, b: jnp.stack([a, b])
    params2 = jax.tree_util.tree_map(stack, v_mri["params"],
                                     v_pet["params"])
    stats2 = jax.tree_util.tree_map(stack, v_mri["batch_stats"],
                                    v_pet["batch_stats"])

    def one(p, s, x):
        f, _ = bb.apply({"params": p, "batch_stats": s}, x, train=True,
                        mutable=["batch_stats"])
        return jnp.mean(jnp.square(f.astype(jnp.float32)))

    def loss_fn(p2, x2):
        return jnp.sum(jax.vmap(one, in_axes=(0, 0, 0))(p2, stats2, x2))

    @jax.jit
    def step(x2):
        l, grads = jax.value_and_grad(loss_fn)(params2, x2)
        return l + sum(jnp.sum(jnp.abs(g)) for g in
                       jax.tree_util.tree_leaves(grads)) * 1e-12

    return step, (x2,)


def probe_fwdcmp(depth, batch, side):
    """Forward-only seq-vs-vmap comparison in one process. Fallback for
    the fwd+bwd probes: BOTH full-gradient arms broke this environment's
    remote-compile server (broken pipe after ~30 min, twice on
    2026-08-21), while forward-only graphs of this size compile in
    minutes. The forward pass carries the same 64-channel early-conv
    structure, so if vmap-over-modality doesn't improve MXU fill here it
    won't in the backward either."""
    import jax
    import jax.numpy as jnp

    bb = _backbone(depth)
    mri, pet = _inputs(batch, side)
    x2 = jnp.stack([jnp.asarray(mri), jnp.asarray(pet)])
    v_mri = bb.init(jax.random.key(0), x2[0], train=False)
    v_pet = bb.init(jax.random.key(1), x2[1], train=False)
    stack = lambda a, b: jnp.stack([a, b])
    vars2 = jax.tree_util.tree_map(stack, v_mri, v_pet)

    @jax.jit
    def step_seq(x2):
        f1 = bb.apply(v_mri, x2[0], train=False)
        f2 = bb.apply(v_pet, x2[1], train=False)
        return (jnp.mean(jnp.square(f1.astype(jnp.float32)))
                + jnp.mean(jnp.square(f2.astype(jnp.float32))))

    @jax.jit
    def step_vmap(x2):
        f = jax.vmap(lambda v, x: bb.apply(v, x, train=False))(vars2, x2)
        return jnp.sum(jnp.mean(jnp.square(f.astype(jnp.float32)),
                                axis=(1, 2)))

    out = {"mode": "fwdcmp", "depth": depth, "batch": batch, "side": side}
    for name, step in (("seq", step_seq), ("vmap", step_vmap)):
        t0 = time.time()
        float(step(x2))
        out[f"{name}_compile_s"] = round(time.time() - t0, 1)
        med, times = _time_loop(step, (x2,))
        out[f"{name}_fwd_ms"] = round(med * 1000, 1)
        out[f"{name}_all_ms"] = [round(t * 1000) for t in times]
        print(f"# {name}: {med*1000:.0f} ms fwd-only "
              f"(compile {out[f'{name}_compile_s']}s)", file=sys.stderr,
              flush=True)
    return out


def probe_opts(depth, batch, side, flags):
    """Does axon's server-side compile accept per-jit compiler_options?
    Compiles the seq step twice — default vs with the given TPU flags —
    and reports whether the options are honored (accepted + timing
    delta) or rejected (the documented dead end)."""
    import jax

    step, args0 = probe_seq(depth, batch, side)
    lowered = jax.jit(lambda *a: step(*a)).lower(*args0)
    opts = {}
    for kv in flags:
        k, _, v = kv.partition("=")
        opts[k] = v if not v.isdigit() else int(v)
    t0 = time.time()
    compiled = lowered.compile(compiler_options=opts)
    compile_s = time.time() - t0
    med, _ = _time_loop(lambda *a: compiled(*a), args0)
    return {"mode": "opts", "flags": opts, "compile_s": round(compile_s, 1),
            "step_ms": round(med * 1000, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["seq", "vmap", "opts", "fwdcmp"])
    ap.add_argument("--depth", type=int, default=101)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--side", type=int, default=128)
    ap.add_argument("--flag", action="append", default=[],
                    help="key=value compiler option (opts mode)")
    args = ap.parse_args()

    from otfusion_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if args.mode == "opts":
        rec = probe_opts(args.depth, args.batch, args.side, args.flag)
        print(json.dumps(rec), flush=True)
        return
    if args.mode == "fwdcmp":
        rec = probe_fwdcmp(args.depth, args.batch, args.side)
        print(json.dumps(rec), flush=True)
        return

    build = {"seq": probe_seq, "vmap": probe_vmap}[args.mode]
    step, args0 = build(args.depth, args.batch, args.side)

    # No cost-model twin: a second full compile of this fwd+bwd body
    # costs 30+ min through the tunnel and broke the server on the first
    # attempt (rc=124 run, 2026-08-21); the seq-vs-vmap comparison is
    # relative, and absolute MFU context comes from bench.py's train
    # step (30.4% with the head+optimiser included).
    flops = None

    t0 = time.time()
    first = step(*args0)
    float(first)
    compile_s = time.time() - t0
    med, times = _time_loop(step, args0)
    rec = {
        "mode": args.mode, "depth": args.depth, "batch": args.batch,
        "side": args.side, "compile_s": round(compile_s, 1),
        "step_ms": round(med * 1000, 1),
        "samples_per_s": round(2 * args.batch / med, 2),  # 2 modalities
        "flops": flops,
        "mfu": flops and round(flops / med / PEAK_BF16, 4),
        "all_ms": [round(t * 1000) for t in times],
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
