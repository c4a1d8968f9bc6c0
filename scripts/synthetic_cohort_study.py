"""Architecture-separation study on the hard synthetic cohort
(VERDICT round-1 next-step 5).

The reference's committed CSVs show OT+attn > mmfusion > unimodal
(comparative_results/best_mri_pet_ot_attention_results.csv 0.9167 vs
best_mmfusion_results.csv 0.8750 vs best_pretraining_results.csv 0.8611).
Real ADNI parity is impossible here, so this study reproduces the
ORDERING on a synthetic cohort that is hard enough to separate the
architectures: per-modality signal dropout (unimodal models cap below
fusion) + a small class gap with structured nuisance (room for the OT
alignment regulariser to matter).

Trains flagship (per_epoch_attn) / mmfusion / both unimodal baselines
over N seeds and writes the aggregator-schema CSV next to a summary
markdown under examples/synthetic_demo/.

Usage: python scripts/synthetic_cohort_study.py [--seeds 3] [--epochs 12]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCHEMA = ["setup", "modality", "model_depth", "data_split", "dropout",
          "pretrained", "attention_target", "best_val_loss", "best_epoch",
          "val_acc", "precision", "recall", "f1_score", "specificity"]

# Args that change the generated cohorts or the training recipe: a workdir
# may only be resumed by a sweep whose values for these all match (mixing
# e.g. v2/v3 generator knobs in one workdir would silently merge
# incomparable legs — hard_cohort_summary.md's NEVER-merge rule).
_PROVENANCE_KEYS = ("epochs", "fusion_epochs", "lr", "fusion_lr",
                    "n_per_class", "side", "depth", "class_gap", "noise",
                    "signal_dropout", "signal_jitter", "shared_severity",
                    "s2d_stem")


def _write_provenance(workdir, args, fusion_lr, fusion_epochs):
    """Record the sweep's generator/recipe knobs in the workdir (read by
    resume runs and scripts/harvest_cohort_runs.py). Raises if the
    workdir was produced by a sweep with different knobs."""
    vals = {k: getattr(args, k) for k in _PROVENANCE_KEYS}
    vals["fusion_lr"] = fusion_lr
    vals["fusion_epochs"] = fusion_epochs
    path = os.path.join(workdir, "study_args.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        diff = {k: (prev.get(k), v) for k, v in vals.items()
                if prev.get(k) != v}
        if diff:
            raise SystemExit(
                f"workdir {workdir} was written by a sweep with different "
                f"knobs: {diff} — resuming would mix incomparable legs "
                "(use a fresh --keep-runs dir)")
    else:
        with open(path, "w") as f:
            json.dump(vals, f, indent=1)


def _completed_row_meta(run_dir, expected_epochs):
    """If ``run_dir`` holds a COMPLETED training run (its epoch loop
    reached ``expected_epochs``), return its best_model.meta.json dict;
    else None. A best_model.meta.json alone is NOT completion — it exists
    from the first improving epoch of a still-running sweep."""
    latest = os.path.join(run_dir, "latest.meta.json")
    best = os.path.join(run_dir, "best_model.meta.json")
    if not (os.path.exists(latest) and os.path.exists(best)):
        return None
    with open(latest) as f:
        if json.load(f).get("epoch", 0) < expected_epochs:
            return None
    with open(best) as f:
        return json.load(f)


def build_cohort(tmp, seed, n_per_class, shape, knobs):
    from otfusion_tpu.data import make_synthetic_adni

    return make_synthetic_adni(
        os.path.join(tmp, f"adni_s{seed}"), n_per_class=n_per_class,
        shape=shape, seed=seed, **knobs,
    )


def split(n, seed, val_fraction=0.25):
    from otfusion_tpu.data.splits import stratified_split

    return stratified_split([0] * (n // 2) + [1] * (n - n // 2),
                            val_fraction, seed)


def _write_csv(out_dir, rows, partial=False):
    """Write the aggregator-schema CSV. In-progress sweeps write a
    distinct ``.partial.csv`` name so an interrupted run can never
    clobber a curated/committed hard_cohort_results.csv (it is only
    promoted to the final name when the whole sweep finishes)."""
    os.makedirs(out_dir, exist_ok=True)
    name = ("hard_cohort_results.partial.csv" if partial
            else "hard_cohort_results.csv")
    csv_path = os.path.join(out_dir, name)
    tmp_path = csv_path + ".tmp"
    with open(tmp_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(SCHEMA)
        w.writerows(rows)
    os.replace(tmp_path, csv_path)
    return csv_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--seed-offset", type=int, default=0,
                    help="first seed (run disjoint seed ranges on "
                         "different hosts/venues and merge the CSVs)")
    ap.add_argument("--epochs", type=int, default=12)
    # Fusion stages fine-tune PRETRAINED backbones: the reference runs
    # them at lr 1e-5 for 50 epochs (its fusion CLI defaults) — an order
    # of magnitude below its unimodal pretraining lr. A shared high lr
    # wrecks the pretrained features (measured: flagship 0.75 < unimodal
    # 0.875 at lr 1e-3); scale the same ratio to this cohort size.
    ap.add_argument("--fusion-lr", type=float, default=None,
                    help="fusion-stage lr (default: --lr / 5)")
    ap.add_argument("--fusion-epochs", type=int, default=None,
                    help="fusion-stage epochs (default: 1.5x --epochs)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--n-per-class", type=int, default=32)
    ap.add_argument("--side", type=int, default=24)
    ap.add_argument("--depth", type=int, default=10)
    # v2 cohort knobs (VERDICT r2 next-step 3): complementary
    # per-modality evidence — each scan is an INDEPENDENT noisy view of
    # the class channel (signal_jitter), so fusion gains sqrt(2) SNR
    # over either modality; signal_dropout stacks the round-2 regime
    # where one scan per patient is uninformative.
    ap.add_argument("--class-gap", type=float, default=0.35)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--signal-dropout", type=float, default=0.5)
    ap.add_argument("--signal-jitter", type=float, default=0.5)
    # v3 knob: class-relevant CROSS-MODAL shared structure (latent
    # severity shared across a patient's scans, rendered as amplitude in
    # MRI but POSITION in PET) — the regime the v2 generator provably
    # lacked (hard_cohort_summary.md) and the one the flagship's OT
    # manifold alignment targets.
    ap.add_argument("--shared-severity", type=float, default=0.0)
    # Study legs must be stem-homogeneous to merge (cohort_study_report
    # pairs per-seed deltas across legs run in different rounds): the
    # committed v2/v3 legs trained the plain stem, so the study keeps
    # plain as ITS default even though fresh trainer runs now default to
    # s2d (train/loop.py:_resolve_stem).
    ap.add_argument("--s2d-stem", action=argparse.BooleanOptionalAction,
                    default=False)
    # Default AWAY from examples/synthetic_demo: the committed v2/v3
    # artifacts live there and a default-path run must never overwrite
    # them (merge legs explicitly via scripts/cohort_study_report.py).
    ap.add_argument("--out-dir", default=None,
                    help="CSV/summary output dir (default: the workdir)")
    ap.add_argument("--keep-runs", default=None,
                    help="directory to keep run outputs (default: temp); "
                         "re-pointing at a previous sweep's dir RESUMES "
                         "it — completed runs (epoch loop finished) are "
                         "harvested instead of retrained")
    args = ap.parse_args()

    from otfusion_tpu.cli.common import enable_compilation_cache
    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
        NiftiDataset,
    )
    from otfusion_tpu.data.splits import stratified_split
    from otfusion_tpu.train.loop import (
        run_fusion_training,
        run_unimodal_training,
    )

    enable_compilation_cache()
    shape = (args.side,) * 3
    rows = []
    workdir = args.keep_runs or tempfile.mkdtemp(prefix="cohort_study_")
    os.makedirs(workdir, exist_ok=True)
    out_dir = args.out_dir or workdir

    knobs = dict(class_gap=args.class_gap, noise=args.noise,
                 signal_dropout=args.signal_dropout,
                 signal_jitter=args.signal_jitter,
                 shared_severity=args.shared_severity)
    fusion_lr = args.fusion_lr or args.lr / 5.0
    fusion_epochs = args.fusion_epochs or int(args.epochs * 1.5)
    _write_provenance(workdir, args, fusion_lr, fusion_epochs)
    for seed in range(args.seed_offset, args.seed_offset + args.seeds):
        tree = build_cohort(workdir, seed, args.n_per_class, shape, knobs)
        ds = MultimodalNiftiDataset(
            root_dir=str(tree), class_names_a=CLASS_NAMES_MRI_BINARY,
            class_names_b=CLASS_NAMES_PET_BINARY)
        labels = [s[2] for s in ds.samples]
        train_idx, val_idx = stratified_split(labels, 0.25, seed)

        # Stage 1 — unimodal pretraining, exactly the reference workflow
        # (train_mri.sh / train_pet.sh before train_both.sh): the
        # committed reference CSVs' flagship wins use pretrained
        # backbones (best_mri_pet_ot_attention_results.csv rows with
        # pretrained=yes carry the 0.9167 peak). Training the fusion
        # variants from scratch buries the OT pathway in backbone noise
        # (measured: from-scratch flagship 0.778 vs mmfusion 0.861).
        pretrained = {}
        for modality, table in (("mri", CLASS_NAMES_MRI_BINARY),
                                ("pet", CLASS_NAMES_PET_BINARY)):
            uds = NiftiDataset(root_dir=str(tree), class_names=table)
            ulabels = [s[1] for s in uds.samples]
            utr, uva = stratified_split(ulabels, 0.25, seed)
            save = os.path.join(workdir, f"unimodal_{modality}_s{seed}")
            b = _completed_row_meta(save, args.epochs)
            if b is not None:
                print(f"seed {seed} unimodal-{modality}: resumed "
                      f"(val_acc={b['val_acc']:.4f})", flush=True)
            else:
                res = run_unimodal_training(
                    samples=uds.samples, train_idx=utr, val_idx=uva,
                    class_names=table, model_depth=args.depth,
                    target_shape=shape, batch_size=8, lr=args.lr,
                    epochs=args.epochs, seed=seed, progress=False,
                    save_path=save, s2d_stem=args.s2d_stem,
                    # tiny epochs (~1s): the every-epoch 'latest' write
                    # dominates wall time otherwise (22-33s measured)
                    latest_every=5,
                )
                b = res["best_summary"]
                print(f"seed {seed} unimodal-{modality}: "
                      f"val_acc={b['val_acc']:.4f}", flush=True)
            pretrained[modality] = os.path.join(save, "best_model")
            rows.append(["pretraining", modality, args.depth,
                         f"seed{seed}", "none", "no", "none",
                         f"{b['val_loss']:.4f}", b["epoch"],
                         f"{b['val_acc']:.4f}", f"{b['precision']:.4f}",
                         f"{b['recall']:.4f}", f"{b['f1']:.4f}",
                         f"{b['specificity']:.4f}"])

        # Stage 2 — fusion variants from the pretrained backbones
        # (train_both.sh --mri/pet-pretrained semantics).
        common = dict(
            samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
            class_names=CLASS_NAMES_MRI_BINARY, model_depth=args.depth,
            target_shape=shape, batch_size=8, lr=fusion_lr,
            epochs=fusion_epochs, seed=seed, max_jax_samples=16,
            gw_max_iterations=200, sinkhorn_max_iterations=200,
            progress=False, s2d_stem=args.s2d_stem,
            mri_pretrained=pretrained["mri"],
            pet_pretrained=pretrained["pet"],
            latest_every=5,  # see the unimodal stage note
        )
        for variant, setup in (("per_epoch_attn", "mri_pet_ot_attention"),
                               ("mmfusion", "mmfusion")):
            save = os.path.join(workdir, f"{setup}_s{seed}")
            b = _completed_row_meta(save, fusion_epochs)
            if b is not None:
                print(f"seed {seed} {setup}: resumed "
                      f"(val_acc={b['val_acc']:.4f})", flush=True)
            else:
                res = run_fusion_training(
                    **common, variant=variant, save_path=save,
                )
                b = res["best_summary"]
                print(f"seed {seed} {setup}: val_acc={b['val_acc']:.4f} "
                      f"f1={b['f1']:.4f}", flush=True)
            rows.append([setup, "mri_pet", args.depth, f"seed{seed}",
                         "0.3", "yes", "none" if variant == "mmfusion"
                         else "pet", f"{b['val_loss']:.4f}",
                         b["epoch"], f"{b['val_acc']:.4f}",
                         f"{b['precision']:.4f}", f"{b['recall']:.4f}",
                         f"{b['f1']:.4f}", f"{b['specificity']:.4f}"])

        # Crash-durable sweep: rewrite the (partial-named) CSV after
        # every completed seed so a wall-clock kill loses at most the
        # in-flight seed (scripts/harvest_cohort_runs.py can still
        # rebuild rows from the run dirs if even this write never
        # happened) — and a resumed sweep picks up where it stopped.
        _write_csv(out_dir, rows, partial=True)

    csv_path = _write_csv(out_dir, rows)

    def mean_acc(setup, modality=None):
        vals = [float(r[9]) for r in rows if r[0] == setup
                and (modality is None or r[1] == modality)]
        return float(np.mean(vals)), float(np.std(vals)), len(vals)

    summary = {
        "ot_attention": mean_acc("mri_pet_ot_attention"),
        "mmfusion": mean_acc("mmfusion"),
        "unimodal_mri": mean_acc("pretraining", "mri"),
        "unimodal_pet": mean_acc("pretraining", "pet"),
    }
    md_path = os.path.join(out_dir, "hard_cohort_summary.md")
    with open(md_path, "w") as f:
        f.write(
            "# Hard synthetic cohort: architecture separation\n\n"
            f"{args.seeds} seeds, {args.n_per_class}/class, "
            f"{args.side}^3 volumes, depth {args.depth}, "
            f"{args.epochs} unimodal epochs (lr {args.lr:g}), "
            f"{fusion_epochs} fusion epochs (lr {fusion_lr:g}).\n"
            f"Cohort: class_gap={args.class_gap:g}, noise={args.noise:g}, "
            f"signal_dropout={args.signal_dropout:g}, "
            f"signal_jitter={args.signal_jitter:g}, "
            f"shared_severity={args.shared_severity:g} "
            "(see data/synthetic.py).\n"
            "Reference ordering targeted: OT+attn 0.9167 > mmfusion "
            "0.8750 > unimodal 0.8611\n(comparative_results/*.csv).\n\n"
            "| setup | mean val acc | std | n |\n|---|---|---|---|\n")
        for k, (m, s, n) in summary.items():
            f.write(f"| {k} | {m:.4f} | {s:.4f} | {n} |\n")
    print("\nSummary:")
    for k, (m, s, n) in summary.items():
        print(f"  {k}: {m:.4f} +- {s:.4f} (n={n})")
    print(f"wrote {csv_path} and {md_path}")


if __name__ == "__main__":
    main()
