"""Legacy RIMA ensemble tester (reference test.py): load trained fold
checkpoints and evaluate the deep ensemble on a held-out split with
uncertainty metrics — no training."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from otfusion_tpu.cli.common import apply_device_flag, resolve_dtype, set_seed


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate a deep ensemble of GAMMA fold checkpoints",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--data-root", type=str, required=True)
    parser.add_argument("--label-file", type=str, required=True)
    parser.add_argument("--checkpoints", type=str, nargs="+", required=True,
                        help="fold checkpoint directories (ensemble members)")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--oct-shape", type=int, nargs=3,
                        default=(96, 96, 96))
    parser.add_argument("--fundus-size", type=int, default=384)
    parser.add_argument("--num-classes", type=int, default=2)
    parser.add_argument("--max-jax-samples", type=int, default=64)
    parser.add_argument("--ot-epsilon", type=float, default=5e-3)
    parser.add_argument("--output", type=str, default=None,
                        help="write metrics JSON here")
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    args = parser.parse_args(argv)
    apply_device_flag(args.device)
    set_seed(args.seed)

    import jax
    import jax.numpy as jnp

    from otfusion_tpu.data.gamma import GammaDataset, GammaLoader
    from otfusion_tpu.models.legacy_fusion import LegacyMultiModalFusion
    from otfusion_tpu.train.coupling import coupling_pipeline, group_and_pad
    from otfusion_tpu.train.ensemble import (
        collect_member_logits,
        evaluate_ensemble,
    )
    from otfusion_tpu.train.legacy_steps import make_legacy_eval_step
    from otfusion_tpu.train.train_state import create_train_state
    from otfusion_tpu.utils.checkpoint import restore_checkpoint

    dataset = GammaDataset(args.data_root, args.label_file,
                           oct_shape=args.oct_shape,
                           fundus_size=args.fundus_size)
    loader = GammaLoader(dataset, range(len(dataset)), args.batch_size)
    from otfusion_tpu.models.legacy_fusion import probe_oct_dim

    oct_dim = probe_oct_dim(args.oct_shape)
    model = LegacyMultiModalFusion(
        num_classes=args.num_classes, oct_feature_dim=oct_dim,
        dtype=resolve_dtype(args.dtype),
    )
    eval_step = make_legacy_eval_step(model)

    fundus0, oct0, _ = next(iter(loader))
    template = create_train_state(
        model, jax.random.key(args.seed),
        (jnp.asarray(fundus0), jnp.asarray(oct0),
         jnp.zeros((oct_dim, 2048), jnp.float32)),
        1e-4,
    )

    states, tvs = [], []
    for ckpt in args.checkpoints:
        state = restore_checkpoint(ckpt, template)
        states.append(state)
        # member-specific coupling from the full cohort features
        f_all, o_all, y_all = [], [], []
        for fundus, oct_vol, labels in loader:
            out = eval_step(state, jnp.asarray(fundus),
                            jnp.asarray(oct_vol), jnp.asarray(labels),
                            jnp.zeros((oct_dim, 2048), jnp.float32))
            f_all.append(np.asarray(out["fundus_feat"]))
            o_all.append(np.asarray(out["oct_feat"]))
            y_all.append(labels)
        f_all, o_all = np.concatenate(f_all), np.concatenate(o_all)
        y_all = np.concatenate(y_all)
        o_g, o_m = group_and_pad(o_all, y_all, args.num_classes,
                                 args.max_jax_samples)
        f_g, f_m = group_and_pad(f_all, y_all, args.num_classes,
                                 args.max_jax_samples)
        tv, _, _ = coupling_pipeline(
            jnp.asarray(o_g), jnp.asarray(f_g),
            jnp.asarray(o_m), jnp.asarray(f_m), epsilon=args.ot_epsilon,
        )
        tvs.append(tv)

    batches = [
        (jnp.asarray(f), jnp.asarray(o), jnp.asarray(l))
        for f, o, l in loader
    ]
    member_logits, labels = collect_member_logits(states, eval_step,
                                                  batches, tvs)
    metrics = evaluate_ensemble(member_logits, labels)
    print(json.dumps(metrics, indent=2, default=float))
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(metrics, f, indent=2, default=float)
    return metrics


if __name__ == "__main__":
    main()
