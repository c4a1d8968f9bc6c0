"""scripts/harvest_cohort_runs.py — rebuild a cohort-study CSV leg from
persisted run dirs, emitting only seeds whose full four-variant quartet
FINISHED training (best_model.meta.json exists from the first improving
epoch, so completion is verified against latest.meta.json's epoch /
the sweep's recorded epoch counts). Plus the study script's resume
helpers (_completed_row_meta / _write_provenance)."""

import csv
import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.fast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


EPOCHS, FUSION_EPOCHS = 12, 18


def _write_run(workdir, name, val_acc, epoch=3, last_epoch=None,
               epilogue=True):
    d = workdir / name
    d.mkdir()
    meta = {"epoch": epoch, "val_loss": 1.0 - val_acc,
            "val_acc": val_acc, "precision": val_acc, "recall": val_acc,
            "f1": val_acc, "specificity": val_acc}
    (d / "best_model.meta.json").write_text(json.dumps(meta))
    (d / "model_config.json").write_text(json.dumps({"model_depth": 10}))
    if last_epoch is None:
        last_epoch = FUSION_EPOCHS if (
            "mmfusion" in name or "attention" in name) else EPOCHS
    (d / "latest.meta.json").write_text(json.dumps({"epoch": last_epoch}))
    if epilogue:
        (d / "confusion_matrix.png").write_bytes(b"\x89PNG")


def _study_args(workdir, **over):
    vals = {"epochs": EPOCHS, "fusion_epochs": FUSION_EPOCHS, "lr": 1e-3,
            "fusion_lr": 2e-4, "n_per_class": 48, "side": 16, "depth": 10,
            "class_gap": 0.35, "noise": 0.25, "signal_dropout": 0.5,
            "signal_jitter": 0.5, "shared_severity": 0.35,
            "s2d_stem": False}
    vals.update(over)
    (workdir / "study_args.json").write_text(json.dumps(vals))


def test_harvest_complete_and_partial_seeds(tmp_path):
    mod = _load("harvest_cohort_runs")
    # seed 5: full quartet; seed 6: missing mmfusion (partial)
    for variant, acc in (("unimodal_mri", 0.70), ("unimodal_pet", 0.60),
                         ("mri_pet_ot_attention", 0.80),
                         ("mmfusion", 0.75)):
        _write_run(tmp_path, f"{variant}_s5", acc)
    for variant in ("unimodal_mri", "unimodal_pet",
                    "mri_pet_ot_attention"):
        _write_run(tmp_path, f"{variant}_s6", 0.5)
    (tmp_path / "adni_s5").mkdir()  # cohort dir must be ignored
    _study_args(tmp_path)

    rows, complete, partial = mod.harvest(str(tmp_path))
    assert complete == [5] and partial == [6]
    assert len(rows) == 4
    assert {r[0] for r in rows} == {"pretraining", "mri_pet_ot_attention",
                                    "mmfusion"}
    flag = next(r for r in rows if r[0] == "mri_pet_ot_attention")
    assert flag[3] == "seed5" and flag[9] == "0.8000" and flag[8] == 3
    # schema matches the study script's (what cohort_study_report merges)
    assert mod.SCHEMA[0] == "setup" and len(mod.SCHEMA) == 14
    for r in rows:
        assert len(r) == len(mod.SCHEMA)


def test_harvest_skips_unfinished_runs(tmp_path):
    """ADVICE r4 (medium): a run killed mid-training has
    best_model.meta.json from its first improving epoch — it must NOT be
    harvested as complete (undertrained row biases paired deltas)."""
    mod = _load("harvest_cohort_runs")
    _study_args(tmp_path)
    for variant, acc in (("unimodal_mri", 0.70), ("unimodal_pet", 0.60),
                         ("mri_pet_ot_attention", 0.80)):
        _write_run(tmp_path, f"{variant}_s7", acc)
    # mmfusion killed at epoch 15 of 18: best meta exists, loop unfinished
    _write_run(tmp_path, "mmfusion_s7", 0.50, epoch=1, last_epoch=15,
               epilogue=False)

    rows, complete, partial = mod.harvest(str(tmp_path))
    assert complete == [] and partial == [7] and rows == []

    # explicit args override study_args.json
    rows, complete, _ = mod.harvest(str(tmp_path), epochs=EPOCHS,
                                    fusion_epochs=15)
    assert complete == [7] and len(rows) == 4


def test_harvest_epilogue_marker_fallback(tmp_path):
    """Without epoch counts (no study_args.json, no args), completion
    falls back to the trainer-epilogue confusion_matrix.png."""
    mod = _load("harvest_cohort_runs")
    for variant in ("unimodal_mri", "unimodal_pet",
                    "mri_pet_ot_attention"):
        _write_run(tmp_path, f"{variant}_s8", 0.7)
    _write_run(tmp_path, "mmfusion_s8", 0.5, epilogue=False)
    rows, complete, partial = mod.harvest(str(tmp_path))
    assert complete == [] and partial == [8]
    (tmp_path / "mmfusion_s8" / "confusion_matrix.png").write_bytes(b"x")
    rows, complete, _ = mod.harvest(str(tmp_path))
    assert complete == [8] and len(rows) == 4


def test_harvest_csv_merges_with_report(tmp_path):
    """The harvested leg must load through cohort_study_report.load_rows
    alongside a study-script leg (identical header)."""
    mod = _load("harvest_cohort_runs")
    _study_args(tmp_path)
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

    report = _load("cohort_study_report")
    header, loaded = report.load_rows([str(out)])
    assert header == mod.SCHEMA
    assert len(loaded) == 4


def test_study_resume_helpers(tmp_path):
    """synthetic_cohort_study resume: _completed_row_meta only accepts
    finished runs; _write_provenance refuses mismatched workdirs."""
    study = _load("synthetic_cohort_study")
    _write_run(tmp_path, "unimodal_mri_s3", 0.7, epoch=5, last_epoch=12)
    d = str(tmp_path / "unimodal_mri_s3")
    meta = study._completed_row_meta(d, 12)
    assert meta is not None and meta["epoch"] == 5
    assert study._completed_row_meta(d, 20) is None
    assert study._completed_row_meta(str(tmp_path / "nope"), 12) is None

    class A:
        pass

    args = A()
    for k in study._PROVENANCE_KEYS:
        setattr(args, k, 1.0)
    study._write_provenance(str(tmp_path), args, 2e-4, 18)
    study._write_provenance(str(tmp_path), args, 2e-4, 18)  # match: ok
    with pytest.raises(SystemExit):
        study._write_provenance(str(tmp_path), args, 1e-4, 18)
