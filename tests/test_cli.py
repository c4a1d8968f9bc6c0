"""End-to-end CLI smoke tests (quick-test config at miniature scale —
the rebuild's analogue of train_both_quick_test.sh)."""

import json
from pathlib import Path

import numpy as np
import pytest

from otfusion_tpu.data import make_synthetic_adni


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("adni_cli")
    return make_synthetic_adni(root, n_per_class=4, shape=(12, 12, 12))


def _common_flags(tree, out, extra=()):
    return [
        "--data-dir", str(tree),
        "--save-path", str(out),
        "--epochs", "2",
        "--batch-size", "2",
        "--target-shape", "12", "12", "12", "--val-fraction", "0.34",
        "--model-depth", "10",
        "--dtype", "float32",
        *extra,
    ]


def test_unimodal_cli_end_to_end(tree, tmp_path):
    from otfusion_tpu.cli.train_unimodal import main

    out = tmp_path / "run"
    result = main(_common_flags(tree, out, ["--classes", "AD", "CN"]))
    assert np.isfinite(result["best_val_loss"])
    assert (out / "results.txt").exists()
    assert (out / "patient_ids.json").exists()
    assert (out / "confusion_matrix.png").exists()
    assert (out / "best_model").is_dir()
    text = (out / "results.txt").read_text()
    assert "Best Epoch:" in text


def test_flagship_cli_end_to_end(tree, tmp_path):
    from otfusion_tpu.cli.train_ot_attn import main
    from otfusion_tpu.utils.reporting import parse_results_file

    out = tmp_path / "attn"
    result = main(_common_flags(tree, out, ["--max-jax-samples", "4",
                                            "--gw-max-iterations", "50"]))
    assert np.isfinite(result["best_val_loss"])
    assert (out / "train_split.json").exists()
    assert (out / "val_split.json").exists()
    assert (out / "patient_ids_all.json").exists()
    assert (out / "confusion_matrix.png").exists()
    row = parse_results_file(out / "results.txt")
    assert row is not None and row["best_epoch"] in ("1", "2")

    # Resume from the emitted split: same membership
    out2 = tmp_path / "attn2"
    split_file = out / "val_split.json"  # bare-list is rejected for now
    combined = tmp_path / "combined.json"
    combined.write_text(json.dumps({
        "train": json.loads((out / "train_split.json").read_text()),
        "val": json.loads((out / "val_split.json").read_text()),
    }))
    result2 = main(_common_flags(tree, out2,
                                 ["--max-jax-samples", "4",
                                  "--gw-max-iterations", "50",
                                  "--load-patient-ids", str(combined),
                                  "--epochs", "1"]))
    v1 = json.loads((out / "val_split.json").read_text())
    v2 = json.loads((out2 / "val_split.json").read_text())
    assert sorted(e["mri_path"] for e in v1) == sorted(
        e["mri_path"] for e in v2)


def test_mmfusion_cli(tree, tmp_path):
    from otfusion_tpu.cli.train_mmfusion import main

    out = tmp_path / "mm"
    result = main(_common_flags(tree, out))
    assert np.isfinite(result["best_val_loss"])


def test_generate_split_and_aggregate(tree, tmp_path):
    from otfusion_tpu.cli.aggregate_results import main as agg_main
    from otfusion_tpu.cli.generate_split import main as split_main

    ids = {"AD_MRI_130_FIN": [f"001_S_400{i}" for i in range(5)]}
    src = tmp_path / "ids.json"
    src.write_text(json.dumps(ids))
    dst = tmp_path / "split.json"
    split_main(["--input", str(src), "--output", str(dst)])
    split = json.loads(dst.read_text())
    assert len(split["train"]["AD_MRI_130_FIN"]) == 4

    # aggregate over a fabricated results dir
    run = tmp_path / "agg" / "mdepth101_drop0.1_all_with_pretrain"
    run.mkdir(parents=True)
    (run / "results.txt").write_text(
        "t\n" + "=" * 80 + "\n\nBest Validation Loss: 0.3497\n"
        "Best Metrics | Epoch: 35 Acc: 0.9167 Precision: 0.9130 "
        "Recall: 0.9100 F1: 0.9111 Specificity: 0.9100\n"
    )
    out_csv = tmp_path / "best.csv"
    agg_main(["--results-dir", str(tmp_path / "agg"),
              "--output", str(out_csv)])
    lines = out_csv.read_text().strip().split("\n")
    assert len(lines) == 2
    assert "0.9167" in lines[1] and "with_pretrain" in lines[1]

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
