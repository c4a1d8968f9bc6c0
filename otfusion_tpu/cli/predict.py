"""Standalone inference driver (serving surface).

The reference has NO prediction-only entry point for its unimodal or
fusion models (only the legacy GAMMA ``test.py``): the flagship
recomputes the train-set coupling every epoch and evaluates in-loop
(MRI_PET_OT_OT_per_epoch_attn.py:1233-1356), so a trained model could
not be served without the training features. The trainers now persist a
serving manifest (``model_config.json``) and — for the flagship — the
final coupling (``t_feature.npy``) beside the best checkpoint; this
driver restores them, predicts over a directory of (paired) NIfTI
volumes, writes ``predictions.csv`` (paths, true label when class
subfolders provide one, predicted label, per-class softmax
probabilities), and prints the usual metrics block when labels exist.

Usage::

    python -m otfusion_tpu.cli.predict --run-dir runs/flagship \
        --data-dir datasets/ADNI/MRI-PET [--output predictions.csv]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import time
from pathlib import Path


def load_manifest(run_dir: str) -> dict:
    path = Path(run_dir) / "model_config.json"
    if not path.exists():
        raise FileNotFoundError(
            f"{path} not found — predict needs the serving manifest the "
            "trainers write next to the checkpoint (retrain, or create "
            "it by hand: see cli/predict.py docstring)")
    with open(path) as f:
        return json.load(f)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Prediction-only inference from a trained run "
        "directory (best checkpoint + serving manifest)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--run-dir", required=True,
                        help="Training --save-path: holds best_model/, "
                        "model_config.json (and t_feature.npy for the "
                        "flagship)")
    parser.add_argument("--data-dir", required=True,
                        help="Root of the class folders to predict on "
                        "(same layout the trainers consume)")
    parser.add_argument("--output", default=None,
                        help="Predictions CSV path (default: "
                        "<run-dir>/predictions.csv)")
    # Forward-only serving has no stored backward activations, so it
    # sustains larger batches than training: measured on a real v5e
    # (flagship depth-101 @128^3 bf16, s2d stem) B=16 runs 215 ms/batch
    # = 74.2 samples/s vs B=8's 128 ms = 62.7 (+18%). Predictions are
    # batch-size independent (eval-mode BN uses running stats; the
    # 3-token attention is per-sample), so the default is the faster 16.
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--max-samples-per-class", type=int, default=None)
    parser.add_argument("--device", default=None,
                        help="jax platform override (e.g. cpu)")
    parser.add_argument("--stem", choices=("auto", "as-trained"),
                        default="auto",
                        help="'auto' serves plain-stem ResNet3D "
                        "checkpoints through the faster space-to-depth "
                        "stem (exact weight-space rewrite at load, "
                        "models/resnet3d.py:s2d_stem_kernel — inference "
                        "has no optimiser moments, so the rewrite is "
                        "free); 'as-trained' keeps the checkpoint's "
                        "layout")
    parser.add_argument("--fold-bn", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="Fold eval-mode BatchNorm into the conv "
                        "kernels at load (exact — utils/checkpoint.py:"
                        "fold_conv_bn_params / fold_zoo_conv_bn); covers "
                        "inline-ResNet3D, MedicalNet and Res2Net "
                        "backbones (swin/unetr have no BN)")
    args = parser.parse_args(argv)

    from otfusion_tpu.cli.common import apply_device_flag

    apply_device_flag(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from otfusion_tpu.data.loader import (Loader, MultimodalLoader,
                                          _VolumeCache, feed_dtype_for)
    from otfusion_tpu.metrics.classification import classification_metrics
    from otfusion_tpu.train.train_state import create_train_state
    from otfusion_tpu.utils.checkpoint import (fold_state_for_serving,
                                               restore_checkpoint,
                                               rewrite_stem_params)

    def _fold(state, module_specs):
        # Inference-only BN fold: exact in eval mode, removes every BN
        # scale/shift op from the serving graph and device_puts the
        # folded state once (fold_state_for_serving). The inline ResNet3D
        # folds by the _ConvBN signature; MedicalNet/Res2Net by the
        # family's explicit conv<->BN pairing.
        print("Serving with BatchNorm folded into the conv kernels "
              "(--no-fold-bn disables)")
        return fold_state_for_serving(state, module_specs)

    def _graft_s2d(state, s2d_state, module_names):
        # Serve-time plain->s2d stem rewrite: graft every backbone's
        # rewritten kernels into the s2d-initialised state. BN stats
        # live on output channels — unchanged by the stem kernel
        # layout, grafted verbatim.
        params = dict(state.params)
        for name in module_names:
            params[name] = rewrite_stem_params(
                state.params[name], s2d_state.params[name])
        print("Serving with the space-to-depth stem "
              "(lossless rewrite; --stem as-trained disables)")
        return s2d_state.replace(params=params,
                                 batch_stats=state.batch_stats)

    cfg = load_manifest(args.run_dir)
    target_shape = tuple(cfg["target_shape"])
    num_classes = int(cfg["num_classes"])
    dtype = jnp.dtype(cfg.get("dtype", "float32"))
    ckpt_dir = os.path.join(args.run_dir, "best_model")
    out_path = args.output or os.path.join(args.run_dir, "predictions.csv")
    cache = _VolumeCache(target_shape, num_workers=args.num_workers)

    if cfg["kind"] == "fusion":
        from otfusion_tpu.data.datasets import MultimodalNiftiDataset
        from otfusion_tpu.models import MultimodalOTFusion
        from otfusion_tpu.train.steps import make_fusion_eval_step

        table_a = {k: int(v) for k, v in cfg["class_names"].items()}
        if cfg.get("class_names_b"):
            # Trainers persist the second-modality table verbatim — the
            # only reliable source (a name heuristic cannot recover e.g.
            # T1->T2 pairings).
            table_b = {k: int(v) for k, v in cfg["class_names_b"].items()}
        else:
            # Legacy manifest (pre class_names_b): derive the PET-side
            # names the way the ADNI cohorts are laid out. Refuse to
            # guess further — silently pairing table_a with itself
            # (which is what a no-op MRI->PET rename or missing folders
            # would mean) predicts on the wrong modality (the T1/T2
            # trap).
            table_b = {
                k.replace("MRI", "PET"): v for k, v in table_a.items()
            }
            missing = [name for name in table_b
                       if not (Path(args.data_dir) / name).is_dir()]
            if missing or table_b.keys() == table_a.keys():
                raise FileNotFoundError(
                    "legacy manifest has no class_names_b and the "
                    "second-modality folders cannot be derived from "
                    f"class_names {sorted(table_a)} "
                    f"(missing/underivable: {missing or 'same names'}) "
                    f"under {args.data_dir} — add \"class_names_b\" to "
                    f"{Path(args.run_dir) / 'model_config.json'} (the "
                    "second-modality class-folder table the run was "
                    "trained with)")
        dataset = MultimodalNiftiDataset(
            root_dir=args.data_dir,
            class_names_a=table_a,
            class_names_b=table_b,
            max_samples_per_class=args.max_samples_per_class,
        )
        # (an empty cohort raises inside MultimodalNiftiDataset with the
        # folder names — no silent 0-sample run reaches the model)
        print(f"Found {len(dataset)} paired samples")
        loader = MultimodalLoader(dataset.samples, target_shape,
                                  args.batch_size, shuffle=False,
                                  cache=cache,
                                  feed_dtype=feed_dtype_for(dtype))
        # --stem auto: the default ResNet3D backbones' plain stem is
        # exactly rewritable to the faster space-to-depth layout; serve
        # through it (registry backbones ignore s2d_stem — no rewrite).
        cfg_s2d = bool(cfg.get("s2d_stem", False))
        s2d_rewrite = (args.stem == "auto" and not cfg_s2d
                       and not cfg.get("mri_backbone")
                       and not cfg.get("pet_backbone")
                       # the 2x2 space-to-depth needs even H/W
                       and target_shape[1] % 2 == 0
                       and target_shape[2] % 2 == 0)

        def _build(s2d, fold=False):
            return MultimodalOTFusion(
                num_classes=num_classes,
                depth=int(cfg["model_depth"]),
                projection_dropout=float(
                    cfg.get("projection_dropout", 0.0)),
                variant=cfg["variant"],
                mri_backbone=cfg.get("mri_backbone", ""),
                pet_backbone=cfg.get("pet_backbone", ""),
                s2d_stem=s2d,
                raw_plan=bool(cfg.get("raw_plan", False)),
                fold_bn=fold,
                dtype=dtype,
            )

        model = _build(cfg_s2d)
        tv = None
        if cfg["variant"] == "per_epoch_attn":
            tv_path = os.path.join(args.run_dir, "t_feature.npy")
            if not os.path.exists(tv_path):
                raise FileNotFoundError(
                    f"{tv_path} not found — the flagship's attention "
                    "consumes the final training coupling at inference; "
                    "retrain (the trainer persists it) or point "
                    "--run-dir at a run that has one")
            tv = jnp.asarray(np.load(tv_path))
        mri0, pet0, _ = next(iter(loader))
        state = create_train_state(
            model, jax.random.key(0),
            (jnp.asarray(mri0[:1]), jnp.asarray(pet0[:1])),
            1e-3, t_feature=tv,
        )
        state = restore_checkpoint(ckpt_dir, state)
        if s2d_rewrite:
            model = _build(True)
            s2d_state = create_train_state(
                model, jax.random.key(0),
                (jnp.asarray(mri0[:1]), jnp.asarray(pet0[:1])),
                1e-3, t_feature=tv,
            )
            state = _graft_s2d(state, s2d_state,
                               ("mri_backbone", "pet_backbone"))
        # BN fold covers every conv backbone family: inline ResNet3D
        # (fold_conv_bn_params) and MedicalNet/Res2Net (fold_zoo_conv_bn);
        # the LayerNorm zoo (swin/unetr) has nothing to fold.
        from otfusion_tpu.models.registry import fold_bn_supported

        fold_mods = {
            m: (spec or "")
            for m, spec in (("mri_backbone", cfg.get("mri_backbone")),
                            ("pet_backbone", cfg.get("pet_backbone")))
            if fold_bn_supported(spec or "")}
        if args.fold_bn and fold_mods:
            model = _build(cfg_s2d or s2d_rewrite, fold=True)
            state = _fold(state, fold_mods)
        eval_step = make_fusion_eval_step(model)

        def run_batch(batch):
            mri, pet, labels = batch
            return eval_step(state, jnp.asarray(mri), jnp.asarray(pet),
                             jnp.asarray(labels), tv)

        sample_paths = [(s[0], s[1]) for s in dataset.samples]
    else:
        from otfusion_tpu.data.datasets import NiftiDataset
        from otfusion_tpu.models import ResNet3DClassifier
        from otfusion_tpu.train.steps import make_unimodal_eval_step

        table = {k: int(v) for k, v in cfg["class_names"].items()}
        dataset = NiftiDataset(
            root_dir=args.data_dir, class_names=table,
            max_samples_per_class=args.max_samples_per_class,
        )
        # (an empty cohort raises inside NiftiDataset — see above)
        print(f"Found {len(dataset)} samples")
        loader = Loader(dataset.samples, target_shape, args.batch_size,
                        shuffle=False, cache=cache,
                        feed_dtype=feed_dtype_for(dtype))
        cfg_s2d = bool(cfg.get("s2d_stem", False))
        s2d_rewrite = (args.stem == "auto" and not cfg_s2d
                       and target_shape[1] % 2 == 0
                       and target_shape[2] % 2 == 0)
        model = ResNet3DClassifier(
            depth=int(cfg["model_depth"]), num_classes=num_classes,
            s2d_stem=cfg_s2d, dtype=dtype,
        )
        vol0, _ = next(iter(loader))
        state = create_train_state(model, jax.random.key(0),
                                   (jnp.asarray(vol0[:1]),), 1e-3)
        state = restore_checkpoint(ckpt_dir, state)
        if s2d_rewrite:
            model = ResNet3DClassifier(
                depth=int(cfg["model_depth"]), num_classes=num_classes,
                s2d_stem=True, dtype=dtype,
            )
            s2d_state = create_train_state(model, jax.random.key(0),
                                           (jnp.asarray(vol0[:1]),), 1e-3)
            state = _graft_s2d(state, s2d_state, ("backbone",))
        if args.fold_bn:
            model = ResNet3DClassifier(
                depth=int(cfg["model_depth"]), num_classes=num_classes,
                s2d_stem=cfg_s2d or s2d_rewrite, fold_bn=True, dtype=dtype,
            )
            state = _fold(state, {"backbone": ""})  # inline ResNet3D
        eval_step = make_unimodal_eval_step(model)

        def run_batch(batch):
            vol, labels = batch
            return eval_step(state, jnp.asarray(vol), jnp.asarray(labels))

        sample_paths = [(s[0],) for s in dataset.samples]

    from otfusion_tpu.data.loader import prefetch

    preds, targets, probs = [], [], []
    # Double-buffer serving: the background thread keeps the next batch's
    # volume reads + trilinear resizes ready while the device runs the
    # current forward step (same overlap the training loops use).
    t0 = time.time()
    for batch in prefetch(iter(loader)):
        out = run_batch(batch)
        logits = np.asarray(out["logits"], np.float32)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs.append(e / e.sum(axis=-1, keepdims=True))
        preds.extend(np.asarray(out["preds"]).tolist())
        targets.extend(np.asarray(batch[-1]).tolist())
    elapsed = time.time() - t0
    probs = np.concatenate(probs) if probs else np.zeros((0, num_classes))
    if preds and elapsed > 0:
        print(f"Predicted {len(preds)} samples in {elapsed:.2f} s "
              f"({len(preds) / elapsed:.1f} samples/s end-to-end, "
              "I/O + resize + forward)")

    path_cols = (["mri_path", "pet_path"] if cfg["kind"] == "fusion"
                 else ["path"])
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(path_cols + ["label", "pred"]
                   + [f"prob_{c}" for c in range(num_classes)])
        for paths, label, pred, p in zip(sample_paths, targets, preds,
                                         probs):
            w.writerow([*paths, label, pred]
                       + [f"{float(x):.6f}" for x in p])
    print(f"Wrote {len(preds)} predictions to {out_path}")

    # Class folders double as labels — report the usual metrics block.
    t = np.asarray(targets)
    p = np.asarray(preds)
    if len(t):
        m = classification_metrics(t, p, num_classes)
        acc = float((t == p).mean())
        print(f"Accuracy: {acc:.4f} Precision: {m['precision']:.4f} "
              f"Recall: {m['recall']:.4f} F1: {m['f1']:.4f} "
              f"Specificity: {m['specificity']:.4f}")
    return out_path


if __name__ == "__main__":
    main()
