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

Usage:
  python scripts/harvest_cohort_runs.py WORKDIR [--out leg.csv]
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


def harvest(workdir):
    """Return (rows, complete_seeds, partial_seeds)."""
    found = {}  # seed -> {variant: row}
    pat = re.compile(
        r"^(unimodal_mri|unimodal_pet|mri_pet_ot_attention|mmfusion)"
        r"_s(\d+)$")
    for name in sorted(os.listdir(workdir)):
        m = pat.match(name)
        if not m:
            continue
        variant, seed = m.group(1), int(m.group(2))
        meta_path = os.path.join(workdir, name, "best_model.meta.json")
        cfg_path = os.path.join(workdir, name, "model_config.json")
        if not (os.path.exists(meta_path) and os.path.exists(cfg_path)):
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
                    help="output CSV path (default: WORKDIR/harvested.csv)")
    args = ap.parse_args()

    rows, complete, partial = harvest(args.workdir)
    if partial:
        print(f"skipping partial seeds (not all 4 variants done): {partial}",
              file=sys.stderr)
    if not complete:
        print("no complete seeds found", file=sys.stderr)
        sys.exit(1)
    out = args.out or os.path.join(args.workdir, "harvested.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(SCHEMA)
        w.writerows(rows)
    print(f"harvested seeds {complete} -> {out}")


if __name__ == "__main__":
    main()
