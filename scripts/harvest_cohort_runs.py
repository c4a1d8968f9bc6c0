"""Reconstruct a cohort-study CSV leg from a study workdir.

`scripts/synthetic_cohort_study.py` only writes its aggregator-schema
CSV after ALL seeds finish, but every training stage persists a
`best_model.meta.json` (epoch + full best-val metric row) and a
`model_config.json` into its run directory as it completes. This tool
rebuilds the per-seed CSV rows from those artifacts so a study that was
interrupted mid-sweep (host preemption, wall-clock budget) still yields
a mergeable leg for `scripts/cohort_study_report.py` — only COMPLETE
seeds (all four variants present) are emitted, since the report's
paired per-seed deltas require the full quartet.

A run directory is only harvested if its epoch loop actually FINISHED:
`best_model.meta.json` exists from the first improving epoch of a
still-running (or killed) training, so its presence alone would emit an
undertrained row and bias the report's paired deltas. Completion is
verified against the sweep's epoch counts — read from the workdir's
`study_args.json` (written by synthetic_cohort_study.py) or passed via
--epochs/--fusion-epochs; without either, the trainer-epilogue artifact
confusion_matrix.png (written only after the loop) is required instead.

Usage:
  python scripts/harvest_cohort_runs.py WORKDIR [--out leg.csv]
                                        [--epochs N --fusion-epochs M]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCHEMA = ["setup", "modality", "model_depth", "data_split", "dropout",
          "pretrained", "attention_target", "best_val_loss", "best_epoch",
          "val_acc", "precision", "recall", "f1_score", "specificity"]

# run-dir name -> (setup, modality, dropout, pretrained, attention_target)
VARIANTS = {
    "unimodal_mri": ("pretraining", "mri", "none", "no", "none"),
    "unimodal_pet": ("pretraining", "pet", "none", "no", "none"),
    "mri_pet_ot_attention": ("mri_pet_ot_attention", "mri_pet", "0.3",
                             "yes", "pet"),
    "mmfusion": ("mmfusion", "mri_pet", "0.3", "yes", "none"),
}


def _run_finished(run_dir, expected_epochs):
    """True iff the run's epoch loop completed. With a known epoch count,
    require latest.meta.json to have reached it; otherwise fall back to
    the trainer-epilogue artifact (confusion_matrix.png is written only
    AFTER the loop, train/loop.py epilogue)."""
    if expected_epochs is not None:
        latest = os.path.join(run_dir, "latest.meta.json")
        if not os.path.exists(latest):
            return False
        with open(latest) as f:
            return json.load(f).get("epoch", 0) >= expected_epochs
    return os.path.exists(os.path.join(run_dir, "confusion_matrix.png"))


def read_study_args(workdir):
    """Sweep provenance (epoch counts + generator knobs), if recorded."""
    path = os.path.join(workdir, "study_args.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def harvest(workdir, epochs=None, fusion_epochs=None):
    """Return (rows, complete_seeds, partial_seeds). ``epochs`` /
    ``fusion_epochs`` verify run completion (see _run_finished); they
    default to the workdir's study_args.json when present."""
    study = read_study_args(workdir) or {}
    epochs = epochs if epochs is not None else study.get("epochs")
    fusion_epochs = (fusion_epochs if fusion_epochs is not None
                     else study.get("fusion_epochs"))
    if epochs is None and fusion_epochs is None:
        print("no epoch counts (args or study_args.json): falling back "
              "to the confusion_matrix.png epilogue marker",
              file=sys.stderr)
    found = {}  # seed -> {variant: row}
    pat = re.compile(
        r"^(unimodal_mri|unimodal_pet|mri_pet_ot_attention|mmfusion)"
        r"_s(\d+)$")
    for name in sorted(os.listdir(workdir)):
        m = pat.match(name)
        if not m:
            continue
        variant, seed = m.group(1), int(m.group(2))
        run_dir = os.path.join(workdir, name)
        meta_path = os.path.join(run_dir, "best_model.meta.json")
        cfg_path = os.path.join(run_dir, "model_config.json")
        if not (os.path.exists(meta_path) and os.path.exists(cfg_path)):
            continue
        expected = (fusion_epochs if variant in
                    ("mri_pet_ot_attention", "mmfusion") else epochs)
        if not _run_finished(run_dir, expected):
            print(f"{name}: training incomplete "
                  f"(expected epoch {expected}) — skipped",
                  file=sys.stderr)
            found.setdefault(seed, {})
            continue
        with open(meta_path) as f:
            meta = json.load(f)
        with open(cfg_path) as f:
            cfg = json.load(f)
        setup, modality, dropout, pretrained, attn = VARIANTS[variant]
        row = [setup, modality, cfg.get("model_depth", ""),
               f"seed{seed}", dropout, pretrained, attn,
               f"{meta['val_loss']:.4f}", meta["epoch"],
               f"{meta['val_acc']:.4f}", f"{meta['precision']:.4f}",
               f"{meta['recall']:.4f}", f"{meta['f1']:.4f}",
               f"{meta['specificity']:.4f}"]
        found.setdefault(seed, {})[variant] = row

    complete = sorted(s for s, v in found.items() if len(v) == 4)
    partial = sorted(s for s, v in found.items() if len(v) < 4)
    rows = [row for s in complete
            for row in (found[s][v] for v in VARIANTS)]
    return rows, complete, partial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--out", default=None,
                    help="output CSV path (default: "
                         "WORKDIR/harvested_<workdir-name>.csv)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="unimodal epoch count the sweep trained for "
                         "(default: workdir study_args.json)")
    ap.add_argument("--fusion-epochs", type=int, default=None,
                    help="fusion epoch count (default: study_args.json)")
    args = ap.parse_args()

    rows, complete, partial = harvest(args.workdir, epochs=args.epochs,
                                      fusion_epochs=args.fusion_epochs)
    if partial:
        print(f"skipping partial seeds (not all 4 variants done): {partial}",
              file=sys.stderr)
    if not complete:
        print("no complete seeds found", file=sys.stderr)
        sys.exit(1)
    # Name the leg after the workdir so legs harvested from different
    # sweeps (different generator knobs!) are hard to mix by accident.
    base = os.path.basename(os.path.normpath(args.workdir))
    out = args.out or os.path.join(args.workdir, f"harvested_{base}.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(SCHEMA)
        w.writerows(rows)
    # Provenance sidecar: the CSV itself records no generator knobs, and
    # legs from different generators (e.g. v2 vs v3 shared_severity)
    # must NEVER be merged in one cohort_study_report leg set.
    study = read_study_args(args.workdir)
    with open(out + ".provenance.json", "w") as f:
        json.dump({"workdir": os.path.abspath(args.workdir),
                   "seeds": complete, "study_args": study}, f, indent=1)
    if study is None:
        print("WARNING: no study_args.json in the workdir — this leg's "
              "generator knobs are unrecorded; merge it only with legs "
              "you know share them (cohort_study_report.py --tag).",
              file=sys.stderr)
    print(f"harvested seeds {complete} -> {out}")


if __name__ == "__main__":
    main()
