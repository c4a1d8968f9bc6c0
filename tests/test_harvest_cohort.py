"""scripts/harvest_cohort_runs.py — rebuild a cohort-study CSV leg from
persisted run dirs (best_model.meta.json + model_config.json), emitting
only seeds with the full four-variant quartet."""

import csv
import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_harvest():
    spec = importlib.util.spec_from_file_location(
        "harvest_cohort_runs",
        os.path.join(REPO, "scripts", "harvest_cohort_runs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_run(workdir, name, val_acc, epoch=3):
    d = workdir / name
    d.mkdir()
    meta = {"epoch": epoch, "val_loss": 1.0 - val_acc,
            "val_acc": val_acc, "precision": val_acc, "recall": val_acc,
            "f1": val_acc, "specificity": val_acc}
    (d / "best_model.meta.json").write_text(json.dumps(meta))
    (d / "model_config.json").write_text(json.dumps({"model_depth": 10}))


def test_harvest_complete_and_partial_seeds(tmp_path):
    mod = _load_harvest()
    # seed 5: full quartet; seed 6: missing mmfusion (partial)
    for variant, acc in (("unimodal_mri", 0.70), ("unimodal_pet", 0.60),
                         ("mri_pet_ot_attention", 0.80),
                         ("mmfusion", 0.75)):
        _write_run(tmp_path, f"{variant}_s5", acc)
    for variant in ("unimodal_mri", "unimodal_pet",
                    "mri_pet_ot_attention"):
        _write_run(tmp_path, f"{variant}_s6", 0.5)
    (tmp_path / "adni_s5").mkdir()  # cohort dir must be ignored

    rows, complete, partial = mod.harvest(str(tmp_path))
    assert complete == [5] and partial == [6]
    assert len(rows) == 4
    by_setup = {r[0]: r for r in rows}
    assert set(by_setup) == {"pretraining", "mri_pet_ot_attention",
                             "mmfusion"} or len(rows) == 4
    flag = next(r for r in rows if r[0] == "mri_pet_ot_attention")
    assert flag[3] == "seed5" and flag[9] == "0.8000" and flag[8] == 3
    # schema matches the study script's (what cohort_study_report merges)
    assert mod.SCHEMA[0] == "setup" and len(mod.SCHEMA) == 14
    for r in rows:
        assert len(r) == len(mod.SCHEMA)


def test_harvest_csv_merges_with_report(tmp_path):
    """The harvested leg must load through cohort_study_report.load_rows
    alongside a study-script leg (identical header)."""
    mod = _load_harvest()
    for variant, acc in (("unimodal_mri", 0.70), ("unimodal_pet", 0.60),
                         ("mri_pet_ot_attention", 0.80),
                         ("mmfusion", 0.75)):
        _write_run(tmp_path, f"{variant}_s9", acc)
    rows, complete, _ = mod.harvest(str(tmp_path))
    out = tmp_path / "leg.csv"
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(mod.SCHEMA)
        w.writerows(rows)

    spec = importlib.util.spec_from_file_location(
        "cohort_study_report",
        os.path.join(REPO, "scripts", "cohort_study_report.py"))
    report = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(report)
    header, loaded = report.load_rows([str(out)])
    assert header == mod.SCHEMA
    assert len(loaded) == 4
