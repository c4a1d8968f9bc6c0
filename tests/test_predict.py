"""Standalone inference driver (cli/predict.py) + serving artifacts.

The trainers persist a serving manifest (model_config.json) and — for
the flagship — the final coupling (t_feature.npy); predict rebuilds the
exact model around the best checkpoint and its CSV predictions must
match a direct library-side eval of that checkpoint.
"""

import csv
import json

import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.data import make_synthetic_adni
from otfusion_tpu.data.datasets import (
    CLASS_NAMES_MRI_BINARY,
    CLASS_NAMES_PET_BINARY,
    MultimodalNiftiDataset,
    NiftiDataset,
)
from otfusion_tpu.train.loop import run_fusion_training, run_unimodal_training


def test_flagship_predict_matches_checkpoint_eval(tmp_path):
    from otfusion_tpu.cli.predict import main as predict_main

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=3,
                               shape=(8, 8, 8))
    ds = MultimodalNiftiDataset(
        root_dir=str(tree), class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY)
    n = len(ds.samples)
    val_idx = list(range(0, n, 3))
    train_idx = [i for i in range(n) if i not in val_idx]
    run_dir = tmp_path / "run"
    run_fusion_training(
        samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
        class_names=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY, variant="per_epoch_attn",
        model_depth=10, target_shape=(8, 8, 8), batch_size=4, lr=1e-3,
        epochs=1, seed=0, save_path=str(run_dir),
        max_jax_samples=4, gw_max_iterations=20,
        sinkhorn_max_iterations=50, progress=False,
    )
    # serving artifacts landed; BOTH modality tables persist (a name
    # heuristic cannot recover e.g. T1->T2 pairings)
    assert (run_dir / "model_config.json").exists()
    assert (run_dir / "t_feature.npy").exists()
    cfg = json.loads((run_dir / "model_config.json").read_text())
    assert cfg["kind"] == "fusion" and cfg["variant"] == "per_epoch_attn"
    assert cfg["class_names_b"] == {
        k: int(v) for k, v in CLASS_NAMES_PET_BINARY.items()}

    # --stem as-trained: the exact-match contract below compares against
    # a direct plain-stem eval (the default --stem auto serves through
    # the losslessly-rewritten s2d stem, tested separately).
    out = predict_main(["--run-dir", str(run_dir),
                        "--data-dir", str(tree), "--batch-size", "3",
                        "--stem", "as-trained"])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == n
    assert set(r["pred"] for r in rows) <= {"0", "1"}

    # CSV predictions == a direct eval of the restored checkpoint
    from otfusion_tpu.models import MultimodalOTFusion
    from otfusion_tpu.train.steps import make_fusion_eval_step
    from otfusion_tpu.train.train_state import create_train_state
    from otfusion_tpu.utils.checkpoint import restore_checkpoint

    tv = jnp.asarray(np.load(run_dir / "t_feature.npy"))
    # fresh trainings default to the s2d stem (round 4) — the direct
    # eval must build the recorded layout or restore shape-mismatches
    assert cfg.get("s2d_stem") is True
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn",
                               s2d_stem=bool(cfg["s2d_stem"]))
    from otfusion_tpu.data.loader import MultimodalLoader

    loader = MultimodalLoader(ds.samples, (8, 8, 8), 4, shuffle=False)
    mri0, pet0, _ = next(iter(loader))
    state = create_train_state(
        model, jax.random.key(0),
        (jnp.asarray(mri0[:1]), jnp.asarray(pet0[:1])), 1e-3,
        t_feature=tv)
    state = restore_checkpoint(run_dir / "best_model", state)
    eval_step = make_fusion_eval_step(model)
    direct = []
    for mri, pet, labels in loader:
        out_b = eval_step(state, jnp.asarray(mri), jnp.asarray(pet),
                          jnp.asarray(labels), tv)
        direct.extend(np.asarray(out_b["preds"]).tolist())
    assert [int(r["pred"]) for r in rows] == direct
    # probabilities are a softmax: rows sum to 1
    for r in rows:
        assert abs(float(r["prob_0"]) + float(r["prob_1"]) - 1.0) < 1e-4

    # Default --stem auto: the plain-stem checkpoint serves through the
    # space-to-depth layout — a lossless weight rewrite, so the softmax
    # probabilities match the as-trained serve to float tolerance.
    out_s2d = predict_main(["--run-dir", str(run_dir),
                            "--data-dir", str(tree), "--batch-size", "3",
                            "--output", str(run_dir / "s2d.csv")])
    rows_s2d = list(csv.DictReader(open(out_s2d)))
    p_plain = np.asarray([[float(r["prob_0"]), float(r["prob_1"])]
                          for r in rows])
    p_s2d = np.asarray([[float(r["prob_0"]), float(r["prob_1"])]
                        for r in rows_s2d])
    np.testing.assert_allclose(p_s2d, p_plain, atol=1e-4)

    # Legacy manifest (pre class_names_b): the MRI->PET name heuristic
    # still serves ADNI-style layouts whose derived folders exist.
    legacy = dict(cfg)
    legacy.pop("class_names_b")
    (run_dir / "model_config.json").write_text(json.dumps(legacy))
    out2 = predict_main(["--run-dir", str(run_dir),
                         "--data-dir", str(tree), "--batch-size", "3",
                         "--stem", "as-trained",
                         "--output", str(run_dir / "legacy.csv")])
    assert [int(r["pred"]) for r in csv.DictReader(open(out2))] == direct


def test_predict_refuses_to_guess_second_modality(tmp_path):
    """A legacy manifest whose derived PET folders don't exist must raise
    (silently pairing table_a with itself would predict on the wrong
    modality — the T1/T2 trap), and an empty dataset must be a clear
    error, not a bare StopIteration."""
    import pytest

    from otfusion_tpu.cli.predict import main as predict_main

    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "model_config.json").write_text(json.dumps({
        "kind": "fusion", "variant": "mmfusion", "model_depth": 10,
        "target_shape": [8, 8, 8], "num_classes": 2,
        "class_names": {"AD_T1_FIN": 0, "CN_T1_FIN": 1},
    }))
    data = tmp_path / "data"
    (data / "AD_T1_FIN").mkdir(parents=True)
    (data / "CN_T1_FIN").mkdir()
    with pytest.raises(FileNotFoundError, match="class_names_b"):
        predict_main(["--run-dir", str(run_dir), "--data-dir", str(data),
                      "--device", "cpu"])

    # with the table persisted, empty class folders -> the dataset's own
    # clear error (never a bare StopIteration from an empty loader)
    cfg = json.loads((run_dir / "model_config.json").read_text())
    cfg["class_names_b"] = {"AD_T2_FIN": 0, "CN_T2_FIN": 1}
    (run_dir / "model_config.json").write_text(json.dumps(cfg))
    (data / "AD_T2_FIN").mkdir()
    (data / "CN_T2_FIN").mkdir()
    with pytest.raises(RuntimeError, match="No paired samples"):
        predict_main(["--run-dir", str(run_dir), "--data-dir", str(data),
                      "--device", "cpu"])


def test_unimodal_predict(tmp_path):
    from otfusion_tpu.cli.predict import main as predict_main

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=3,
                               shape=(8, 8, 8))
    mri_root = tree
    ds = NiftiDataset(root_dir=str(mri_root),
                      class_names=CLASS_NAMES_MRI_BINARY)
    n = len(ds.samples)
    val_idx = list(range(0, n, 3))
    train_idx = [i for i in range(n) if i not in val_idx]
    run_dir = tmp_path / "run"
    run_unimodal_training(
        samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
        class_names=CLASS_NAMES_MRI_BINARY, model_depth=10,
        target_shape=(8, 8, 8), batch_size=4, lr=1e-3, epochs=1, seed=0,
        save_path=str(run_dir), progress=False,
    )
    cfg = json.loads((run_dir / "model_config.json").read_text())
    assert cfg["kind"] == "unimodal"
    out = predict_main(["--run-dir", str(run_dir),
                        "--data-dir", str(mri_root)])
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == n
    assert all(r["path"] for r in rows)
