"""Legacy RIMA trainer (reference main.py): 5-fold CV over the GAMMA
fundus+OCT cohort, per-batch bidirectional OT inside the jitted step,
per-epoch full-train coupling recompute for validation, best-weighted-F1
checkpointing, and a final deep-ensemble evaluation across folds
(test.py parity) with the calibration battery.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import deque
from pathlib import Path

import numpy as np

from otfusion_tpu.cli.common import (
    apply_device_flag,
    resolve_dtype,
    set_seed,
)


def kfold_indices(n: int, n_splits: int, seed: int):
    """sklearn KFold(shuffle=True) parity via sklearn itself."""
    from sklearn.model_selection import KFold

    return list(KFold(n_splits=n_splits, shuffle=True,
                      random_state=seed).split(np.arange(n)))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train legacy fundus+OCT OT fusion (GAMMA cohort)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--data-root", type=str, required=True,
                        help="MGamma root (sibling multi-modality_images)")
    parser.add_argument("--label-file", type=str, required=True)
    parser.add_argument("--folds", type=int, default=5)
    parser.add_argument("--max-folds", type=int, default=None,
                        help="Train only the first K folds")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save-path", type=str,
                        default="results/GAMMA_legacy")
    parser.add_argument("--oct-shape", type=int, nargs=3,
                        default=(96, 96, 96))
    parser.add_argument("--fundus-size", type=int, default=384)
    parser.add_argument("--num-classes", type=int, default=2)
    parser.add_argument("--max-jax-samples", type=int, default=64)
    parser.add_argument("--ot-epsilon", type=float, default=5e-3)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    args = parser.parse_args(argv)
    apply_device_flag(args.device)
    set_seed(args.seed)

    import jax
    import jax.numpy as jnp

    from otfusion_tpu.data.gamma import GammaDataset, GammaLoader
    from otfusion_tpu.metrics.classification import classification_metrics
    from otfusion_tpu.models.legacy_fusion import (
        LegacyMultiModalFusion,
        probe_oct_dim,
    )
    from otfusion_tpu.train.coupling import coupling_pipeline, group_and_pad
    from otfusion_tpu.train.ensemble import (
        collect_member_logits,
        evaluate_ensemble,
    )
    from otfusion_tpu.train.legacy_steps import (
        make_legacy_eval_step,
        make_legacy_train_step,
    )
    from otfusion_tpu.train.train_state import create_train_state
    from otfusion_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    os.makedirs(args.save_path, exist_ok=True)
    dataset = GammaDataset(args.data_root, args.label_file,
                           oct_shape=args.oct_shape,
                           fundus_size=args.fundus_size)
    print(f"GAMMA cohort: {len(dataset)} cases")

    oct_dim = probe_oct_dim(args.oct_shape)
    model = LegacyMultiModalFusion(
        num_classes=args.num_classes, oct_feature_dim=oct_dim,
        dtype=resolve_dtype(args.dtype),
    )
    # bf16 mode ships bf16 fundus/OCT batches (exact — see
    # data/loader.py:feed_dtype_for)
    from otfusion_tpu.data.loader import feed_dtype_for

    feed = feed_dtype_for(resolve_dtype(args.dtype))

    def compute_eval_coupling(state, loader, eval_step):
        f_all, o_all, y_all = [], [], []
        for fundus, oct_vol, labels in loader:
            out = eval_step(state, jnp.asarray(fundus),
                            jnp.asarray(oct_vol), jnp.asarray(labels),
                            jnp.zeros((oct_dim, 2048), jnp.float32))
            f_all.append(np.asarray(out["fundus_feat"]))
            o_all.append(np.asarray(out["oct_feat"]))
            y_all.append(labels)
        f_all = np.concatenate(f_all)
        o_all = np.concatenate(o_all)
        y_all = np.concatenate(y_all)
        o_g, o_m = group_and_pad(o_all, y_all, args.num_classes,
                                 args.max_jax_samples)
        f_g, f_m = group_and_pad(f_all, y_all, args.num_classes,
                                 args.max_jax_samples)
        tv, _, _ = coupling_pipeline(
            jnp.asarray(o_g), jnp.asarray(f_g),
            jnp.asarray(o_m), jnp.asarray(f_m),
            epsilon=args.ot_epsilon,
        )
        return tv  # (d_oct, d_fundus)

    folds = kfold_indices(len(dataset), args.folds, args.seed)
    if args.max_folds:
        folds = folds[: args.max_folds]

    fold_states, fold_tvs = [], []
    eval_step = make_legacy_eval_step(model)
    train_step = make_legacy_train_step(model, ot_epsilon=args.ot_epsilon)

    for fold, (train_idx, val_idx) in enumerate(folds):
        print(f"\n=== Fold {fold + 1}/{len(folds)} "
              f"({len(train_idx)} train / {len(val_idx)} val) ===")
        train_loader = GammaLoader(dataset, train_idx, args.batch_size,
                                   shuffle=True, augment=True,
                                   seed=args.seed + fold, feed_dtype=feed)
        feat_loader = GammaLoader(dataset, train_idx, args.batch_size,
                                  feed_dtype=feed)
        val_loader = GammaLoader(dataset, val_idx, args.batch_size,
                                 feed_dtype=feed)

        fundus0, oct0, _ = next(iter(val_loader))
        state = create_train_state(
            model, jax.random.key(args.seed + fold),
            (jnp.asarray(fundus0), jnp.asarray(oct0),
             jnp.zeros((oct_dim, 2048), jnp.float32)),
            args.lr, optimizer="adamw",
        )

        best_f1 = -1.0
        fold_dir = os.path.join(args.save_path, f"fold{fold}")
        rng = jax.random.key(args.seed + 100 + fold)
        for epoch in range(1, args.epochs + 1):
            correct = total = 0
            loss_sum = 0.0
            # lagged metric fetches — same pipelining as the main epoch
            # loops (train/loop.py:_run_train_epoch): don't stall the
            # dispatch queue on a device->host round-trip every step
            pending = deque()
            for i, (fundus, oct_vol, labels) in enumerate(train_loader):
                state, met = train_step(
                    state, jnp.asarray(fundus), jnp.asarray(oct_vol),
                    jnp.asarray(labels),
                    jax.random.fold_in(rng, epoch * 10_000 + i),
                )
                pending.append((met, len(labels)))
                if len(pending) > 2:
                    met, n = pending.popleft()
                    loss_sum += float(met["loss"]) * n
                    correct += int(met["correct"])
                    total += n
            for met, n in pending:
                loss_sum += float(met["loss"]) * n
                correct += int(met["correct"])
                total += n
            tv = compute_eval_coupling(state, feat_loader, eval_step)
            preds, targets = [], []
            for fundus, oct_vol, labels in val_loader:
                out = eval_step(state, jnp.asarray(fundus),
                                jnp.asarray(oct_vol), jnp.asarray(labels),
                                tv)
                preds.extend(np.asarray(out["preds"]).tolist())
                targets.extend(labels.tolist())
            m = classification_metrics(targets, preds, args.num_classes)
            print(f"fold {fold} epoch {epoch:03d} | "
                  f"train_loss={loss_sum / total:.4f} "
                  f"train_acc={correct / total:.4f} | val_f1={m['f1']:.4f}")
            if m["f1"] > best_f1:
                best_f1 = m["f1"]
                save_checkpoint(fold_dir, state,
                                {"epoch": epoch, "fold": fold, **m})
        state = restore_checkpoint(fold_dir, state)
        fold_states.append(state)
        fold_tvs.append(compute_eval_coupling(state, feat_loader, eval_step))

    # Deep-ensemble evaluation over the last fold's validation set
    # (test.py evaluates the member ensemble on held-out data).
    _, (train_idx, val_idx) = len(folds) - 1, folds[-1]
    val_loader = GammaLoader(dataset, val_idx, args.batch_size,
                             feed_dtype=feed)
    batches = [
        (jnp.asarray(f), jnp.asarray(o), jnp.asarray(l))
        for f, o, l in val_loader
    ]
    member_logits, labels = collect_member_logits(
        fold_states, eval_step, batches, fold_tvs
    )
    metrics = evaluate_ensemble(member_logits, labels)
    metrics_path = os.path.join(args.save_path, "ensemble_metrics.json")
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=2, default=float)
    print("\nEnsemble:", json.dumps(metrics, indent=2, default=float))
    return metrics


if __name__ == "__main__":
    main()
