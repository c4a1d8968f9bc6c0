"""Lagged device->host metric fetches (round-3 perf work).

The epoch loops dispatch step i+1 before fetching step i's metrics
(train/loop.py:_run_train_epoch keeps a bounded deque of un-fetched
device metrics) so the per-step host round-trip — tens of ms through
this environment's TPU tunnel — overlaps device compute instead of
serialising into every step. The lag must be OBSERVATIONALLY INVISIBLE:
it changes when values are fetched, never what is computed, so every
metric must be bit-identical to the fetch-every-step path (lag 0).
"""

import json

import numpy as np
import pytest

from otfusion_tpu.data import make_synthetic_adni
from otfusion_tpu.data.datasets import (
    CLASS_NAMES_MRI_BINARY,
    CLASS_NAMES_PET_BINARY,
    MultimodalNiftiDataset,
)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("adni_lag")
    return make_synthetic_adni(root, n_per_class=5, shape=(10, 10, 10))


def _run(tree, out, lag, monkeypatch):
    from otfusion_tpu.train import loop as loop_mod

    monkeypatch.setattr(loop_mod, "_PIPELINE_LAG", lag)
    ds = MultimodalNiftiDataset(
        root_dir=str(tree),
        class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY,
    )
    n = len(ds.samples)
    val_idx = list(range(0, n, 4))
    train_idx = [i for i in range(n) if i not in val_idx]
    return loop_mod.run_fusion_training(
        samples=ds.samples,
        train_idx=train_idx,
        val_idx=val_idx,
        class_names=CLASS_NAMES_MRI_BINARY,
        variant="per_epoch_attn",  # exercises CouplingService's deque too
        model_depth=10,
        target_shape=(10, 10, 10),
        batch_size=3,  # partial final batch: drain path sees ragged n
        lr=1e-3,
        epochs=2,
        seed=11,
        save_path=str(out),
        max_jax_samples=4,
        gw_max_iterations=20,
        sinkhorn_max_iterations=40,
        progress=False,
    )


def test_epoch_metrics_invariant_to_pipeline_lag(tree, tmp_path,
                                                 monkeypatch):
    """lag=0 (fetch every step) and lag=3 (deeper than the default 2)
    must produce bit-identical histories: same seed -> same compiled
    programs -> same device values; the deque only reorders FETCHES,
    and the FIFO drain accumulates them in the original batch order."""
    r0 = _run(tree, tmp_path / "lag0", 0, monkeypatch)
    r3 = _run(tree, tmp_path / "lag3", 3, monkeypatch)
    h0, h3 = r0["history"], r3["history"]
    assert len(h0) == len(h3) == 2
    for e0, e3 in zip(h0, h3):
        assert e0.train_loss == e3.train_loss
        assert e0.train_acc == e3.train_acc
        assert e0.val_loss == e3.val_loss
        assert e0.val_acc == e3.val_acc


def test_gamma_cli_end_to_end(tmp_path):
    """cli/train_gamma.py main() end-to-end on a synthetic GAMMA cohort
    (the legacy trainer's lagged train loop + per-epoch eval coupling +
    fold ensemble were previously only covered piecewise)."""
    from otfusion_tpu.cli.train_gamma import main
    from otfusion_tpu.data.gamma import make_synthetic_gamma

    root = tmp_path / "gamma"
    mgamma, labels_csv = make_synthetic_gamma(
        root, n_cases=6, fundus_size=32, oct_shape=(16, 16, 16))
    out = tmp_path / "run"
    metrics = main([
        "--data-root", str(mgamma),
        "--label-file", str(labels_csv),
        "--folds", "2",
        "--max-folds", "1",
        "--epochs", "1",
        "--batch-size", "3",
        "--oct-shape", "16", "16", "16",
        "--fundus-size", "32",
        "--max-jax-samples", "4",
        "--device", "cpu",
        "--dtype", "float32",
        "--save-path", str(out),
    ])
    assert np.isfinite(metrics["accuracy"])
    with open(out / "ensemble_metrics.json") as f:
        saved = json.load(f)
    assert saved["n_members"] == 1
    assert (out / "fold0").exists()
