"""Metrics + reporting tests (validated against sklearn where applicable)."""

import numpy as np
import pytest

from otfusion_tpu.metrics import (
    aurc_eaurc,
    brier_score,
    classification_metrics,
    diag_fraction,
    expected_calibration_error,
    foscttm,
    negative_log_likelihood,
    relative_mse,
    uncertainty_metrics,
)
from otfusion_tpu.utils.reporting import (
    ResultsWriter,
    collect_best_results,
    parse_results_file,
    parse_setup_fields,
    write_results_csv,
    CSV_COLUMNS,
)


def test_classification_matches_sklearn(rng):
    from sklearn.metrics import precision_recall_fscore_support

    y_true = rng.integers(0, 3, size=100)
    y_pred = rng.integers(0, 3, size=100)
    ours = classification_metrics(y_true, y_pred, 3)
    p, r, f1, _ = precision_recall_fscore_support(
        y_true, y_pred, average="macro", zero_division=0
    )
    assert abs(ours["precision"] - p) < 1e-12
    assert abs(ours["recall"] - r) < 1e-12
    assert abs(ours["f1"] - f1) < 1e-12
    assert 0.0 <= ours["specificity"] <= 1.0


def test_perfect_predictions():
    y = [0, 1, 0, 1, 1]
    m = classification_metrics(y, y, 2)
    assert m["precision"] == m["recall"] == m["f1"] == 1.0
    assert m["specificity"] == 1.0


def test_ece_perfectly_calibrated():
    # confident & correct -> ece ~ 1 - conf
    probs = np.array([[0.9, 0.1]] * 100)
    labels = np.array([0] * 90 + [1] * 10)
    ece = expected_calibration_error(probs, labels)
    assert ece < 1e-6  # acc 0.9 == conf 0.9


def test_aurc_perfect_ordering():
    # higher confidence -> correct; lower -> wrong: risk curve is optimal
    probs = np.stack([np.linspace(0.99, 0.51, 10),
                      1 - np.linspace(0.99, 0.51, 10)], 1)
    labels = np.array([0] * 5 + [1] * 5)  # top-5 confident are correct
    aurc, eaurc = aurc_eaurc(probs, labels)
    assert 0 <= aurc <= 1
    assert eaurc >= -1e-9


def test_nll_brier_basic():
    logits = np.array([[10.0, 0.0], [0.0, 10.0]])
    labels = np.array([0, 1])
    assert negative_log_likelihood(logits, labels) < 1e-3
    probs = np.array([[1.0, 0.0], [0.0, 1.0]])
    assert brier_score(probs, labels) == 0.0


def test_uncertainty_battery(rng):
    logits = rng.normal(size=(50, 2)) * 3
    labels = rng.integers(0, 2, size=50)
    out = uncertainty_metrics(logits, labels)
    for key in ("accuracy", "ece", "aurc", "eaurc", "aupr",
                "fpr_at_95_tpr", "nll", "brier"):
        assert np.isfinite(out[key])


def test_foscttm_perfect_and_random(rng):
    x = rng.normal(size=(40, 6))
    assert foscttm(x, x) == 0.0
    y = rng.normal(size=(40, 6))
    assert 0.3 < foscttm(x, y) < 0.7  # random ~0.5


def test_diag_fraction_and_rel_mse():
    n = 10
    perfect = np.eye(n) / n
    uniform = np.ones((n, n)) / n**2
    assert diag_fraction(perfect) == 1.0
    assert abs(diag_fraction(uniform) - 1 / n) < 1e-12
    assert relative_mse(perfect) < 1e-12
    assert abs(relative_mse(uniform) - 1.0) < 1e-12


def test_results_roundtrip(tmp_path):
    """Writer output parses back through the aggregator regexes."""
    run_dir = tmp_path / "mdepth101_drop0.3_all_no_pretrain_pet_attn"
    run_dir.mkdir()
    writer = ResultsWriter(
        run_dir / "results.txt",
        "Multimodal MRI-PET with Optimal Transport - ADNI Dataset",
        {"Dataset": "/x", "Batch Size": 2},
        style="fusion",
    )
    metrics = {"precision": 0.9, "recall": 0.8, "f1": 0.85,
               "specificity": 0.8}
    writer.epoch_row(1, 0.5, 0.7, 0.45, 0.75, metrics)
    writer.summary(0.45, {"epoch": 1, "val_acc": 0.75, **metrics},
                   run_dir / "best.ckpt")

    row = parse_results_file(run_dir / "results.txt")
    assert row is not None
    assert row["best_val_loss"] == "0.4500"
    assert row["best_epoch"] == "1"
    assert row["val_acc"] == "0.7500"
    assert row["model_depth"] == "101"
    assert row["data_split"] == "all"
    assert row["dropout"] == "0.3"
    assert row["pretrained"] == "no_pretrain"
    assert row["attention_target"] == "pet"

    csv_path = tmp_path / "out.csv"
    write_results_csv(collect_best_results(tmp_path), csv_path)
    lines = csv_path.read_text().strip().split("\n")
    assert lines[0] == ",".join(CSV_COLUMNS)
    assert len(lines) == 2


def test_unimodal_results_style(tmp_path):
    run_dir = tmp_path / "mri_depth101_all"
    run_dir.mkdir()
    writer = ResultsWriter(run_dir / "results.txt", "t", {}, style="unimodal")
    m = {"precision": 1.0, "recall": 1.0, "f1": 1.0, "specificity": 1.0}
    writer.epoch_row(3, 0.1, 0.99, 0.2, 0.95, m)
    writer.summary(0.2, {"epoch": 3, "val_acc": 0.95, **m}, "p.ckpt")
    text = (run_dir / "results.txt").read_text()
    assert "Best Epoch: 3" in text
    row = parse_results_file(run_dir / "results.txt")
    assert row["modality"] == "mri"
    assert row["model_depth"] == "101"


def test_setup_field_fallbacks():
    mod, depth, split, extras = parse_setup_fields("depth152_balanced", "pet")
    assert (mod, depth, split) == ("pet", "152", "balanced")
    mod, depth, split, _ = parse_setup_fields("weird_name_depth50")
    assert depth == "50"


def test_plots_render(tmp_path, rng):
    from otfusion_tpu.utils.plotting import (
        save_confusion_matrix_png,
        save_tsne_png,
    )

    y_true = rng.integers(0, 2, size=30)
    y_pred = rng.integers(0, 2, size=30)
    cm_path = tmp_path / "cm.png"
    save_confusion_matrix_png(
        y_true, y_pred, {"AD_MRI_130_FIN": 0, "CN_MRI_229_FIN": 1}, cm_path
    )
    assert cm_path.stat().st_size > 1000

    tsne_path = tmp_path / "tsne.png"
    save_tsne_png(rng.normal(size=(30, 8)), y_true, tsne_path)
    assert tsne_path.stat().st_size > 1000


def test_checkpoint_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from otfusion_tpu.models import MultimodalOTFusion, ResNet3DClassifier
    from otfusion_tpu.train import create_train_state
    from otfusion_tpu.utils.checkpoint import (
        restore_backbone,
        restore_checkpoint,
        save_checkpoint,
    )

    vol = jnp.zeros((1, 8, 8, 8, 1))
    uni = ResNet3DClassifier(depth=10, num_classes=2)
    uni_state = create_train_state(uni, jax.random.key(0), (vol,), 1e-3)
    save_checkpoint(tmp_path / "uni", uni_state, {"epoch": 3})

    fusion = MultimodalOTFusion(num_classes=2, depth=10, variant="mmfusion")
    fstate = create_train_state(fusion, jax.random.key(1), (vol, vol), 1e-3,
                                t_feature=None)
    def flat(tree):
        return np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(tree)]
        )

    before = flat(fstate.params["mri_backbone"])
    fstate2 = restore_backbone(fstate, tmp_path / "uni", "mri_backbone")
    after = flat(fstate2.params["mri_backbone"])
    uni_flat = flat(uni_state.params["backbone"])
    assert not np.allclose(before, after)
    np.testing.assert_allclose(after, uni_flat)

    # full save/restore roundtrip
    save_checkpoint(tmp_path / "fus", fstate2, {"epoch": 1})
    fresh = create_train_state(fusion, jax.random.key(2), (vol, vol), 1e-3,
                               t_feature=None)
    restored = restore_checkpoint(tmp_path / "fus", fresh)
    np.testing.assert_allclose(
        flat(restored.params["mri_backbone"]), uni_flat
    )

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
