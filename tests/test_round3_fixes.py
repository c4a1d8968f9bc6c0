"""Round-3 items: space-to-depth stem (VERDICT next-step 2), the
--raw-reference-plan CLI escape hatch (next-step 6), and the
multi-process mesh validation (ADVICE round-2 finding 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from otfusion_tpu.models import MultimodalOTFusion
from otfusion_tpu.models.resnet3d import (
    ResNet3DBackbone,
    feature_dim,
    s2d_stem_kernel,
    space_to_depth_hw,
)
from otfusion_tpu.train import create_train_state


@pytest.mark.parametrize("cin", [1, 2])
def test_s2d_stem_kernel_rewrite_exact(rng, cin):
    """The stride-(1,2,2) k=(3,7,7) stem conv and the s2d(2x2)+stride-1
    k=(3,4,4) conv over the rewritten kernel compute the SAME function
    (up to f32 accumulation order)."""
    x = rng.normal(size=(2, 6, 16, 16, cin)).astype(np.float32)
    w = rng.normal(size=(3, 7, 7, cin, 5)).astype(np.float32)
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y_plain = lax.conv_general_dilated(
        x, w, (1, 2, 2), [(1, 1), (3, 3), (3, 3)], dimension_numbers=dn)
    xs = np.asarray(space_to_depth_hw(x))
    w2 = s2d_stem_kernel(w)
    dn2 = lax.conv_dimension_numbers(
        xs.shape, w2.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y_s2d = lax.conv_general_dilated(
        xs, w2, (1, 1, 1), [(1, 1), (2, 1), (2, 1)], dimension_numbers=dn2)
    assert y_plain.shape == y_s2d.shape
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_s2d),
                               atol=1e-4)


def test_s2d_backbone_matches_plain_backbone(rng):
    """Full-backbone logit equivalence: transplant a plain-stem
    backbone's params (stem kernel rewritten) into the s2d variant and
    compare pooled features on a fixed input."""
    x = jnp.asarray(rng.normal(size=(2, 6, 16, 16, 1)), jnp.float32)
    plain = ResNet3DBackbone(depth=10)
    s2d = ResNet3DBackbone(depth=10, s2d_stem=True)
    v_plain = plain.init(jax.random.key(0), x)
    v_s2d = jax.tree_util.tree_map(np.asarray, s2d.init(jax.random.key(0), x))
    # identical trees except the stem conv kernel shape
    v_s2d["params"] = jax.tree_util.tree_map(np.asarray, v_plain["params"])
    v_s2d["params"]["_ConvBN_0"]["Conv_0"]["kernel"] = s2d_stem_kernel(
        np.asarray(v_plain["params"]["_ConvBN_0"]["Conv_0"]["kernel"]))
    v_s2d["batch_stats"] = v_plain["batch_stats"]
    f_plain = plain.apply(v_plain, x, train=False)
    f_s2d = s2d.apply(v_s2d, x, train=False)
    np.testing.assert_allclose(np.asarray(f_plain), np.asarray(f_s2d),
                               rtol=1e-3, atol=1e-4)


def test_orbax_backbone_graft_rewrites_stem(tmp_path, rng):
    """The cohort-study pathway: pretrain with the plain stem, fuse with
    --s2d-stem — restore_backbone rewrites the checkpointed stem kernel
    losslessly instead of shape-crashing."""
    from otfusion_tpu.models.resnet3d import ResNet3DClassifier
    from otfusion_tpu.utils.checkpoint import (
        restore_backbone,
        save_checkpoint,
    )

    x = jnp.asarray(rng.normal(size=(1, 6, 16, 16, 1)), jnp.float32)
    uni = ResNet3DClassifier(depth=10, num_classes=2)
    uni_state = create_train_state(uni, jax.random.key(1), (x,), 1e-3)
    ckpt = tmp_path / "best_model"
    save_checkpoint(ckpt, uni_state, {"epoch": 1})

    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn", s2d_stem=True)
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    state = create_train_state(model, jax.random.key(0), (x, x), 1e-3,
                               t_feature=tv)
    state2 = restore_backbone(state, ckpt, "mri_backbone")
    got = np.asarray(
        state2.params["mri_backbone"]["_ConvBN_0"]["Conv_0"]["kernel"])
    want = s2d_stem_kernel(np.asarray(
        uni_state.params["backbone"]["_ConvBN_0"]["Conv_0"]["kernel"]))
    np.testing.assert_array_equal(got, want)
    # the graft must be usable: forward runs and is finite
    out = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        x, x, t_feature=tv, train=False)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_fusion_cli_flags_round_trip(tmp_path, monkeypatch):
    """--raw-reference-plan and --s2d-stem reach run_fusion_training
    (VERDICT round-2 missing #1: the documented escape hatch was
    Python-API-only)."""
    from otfusion_tpu.cli.train_ot_attn import main
    from otfusion_tpu.data import make_synthetic_adni
    from otfusion_tpu.train import loop as loop_mod

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=3,
                               shape=(8, 8, 8))
    captured = {}

    def fake_run(**kwargs):
        captured.update(kwargs)
        return {"best_val_loss": 0.0, "best_summary": None, "history": [],
                "model_dir": str(tmp_path / "m")}

    monkeypatch.setattr(loop_mod, "run_fusion_training", fake_run)
    main(["--data-dir", str(tree), "--save-path", str(tmp_path / "run"),
          "--epochs", "1", "--batch-size", "2", "--target-shape",
          "8", "8", "8", "--model-depth", "10", "--dtype", "float32",
          "--val-fraction", "0.34",
          "--raw-reference-plan", "--s2d-stem",
          "--feature-batch-size", "16", "--eval-batch-size", "12"])
    assert captured["raw_plan"] is True
    assert captured["s2d_stem"] is True
    assert captured["feature_batch_size"] == 16
    assert captured["eval_batch_size"] == 12


def test_coupling_invariant_to_feature_batch_size(rng):
    """The per-epoch coupling's feature-extraction pass is forward-only
    and per-sample independent, so batching it differently (the
    --feature-batch-size throughput lever) must not change the coupling:
    same feature rows in the same dataset order -> same groups -> same
    plan."""
    from otfusion_tpu.train.coupling import CouplingService
    from otfusion_tpu.train.steps import make_feature_extract_step

    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    d = feature_dim(10)
    n = 10
    mri = rng.normal(size=(n, 8, 8, 8, 1)).astype(np.float32)
    pet = rng.normal(size=(n, 8, 8, 8, 1)).astype(np.float32)
    labels = np.asarray(rng.integers(0, 2, size=n), np.int32)
    tv0 = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), (mri[:2], pet[:2]), 1e-3, t_feature=tv0)

    def batches(bs):
        for i in range(0, n, bs):
            yield (jnp.asarray(mri[i:i + bs]), jnp.asarray(pet[i:i + bs]),
                   labels[i:i + bs])

    feat_step = make_feature_extract_step(model)
    tvs, feats = [], []
    for bs in (2, 8):
        svc = CouplingService(feat_step, n_labels=2,
                              max_samples_per_label=4,
                              gw_max_iterations=20,
                              sinkhorn_max_iterations=50)
        tvs.append(np.asarray(svc.compute(state, batches(bs))))
        feats.append(np.concatenate(
            [np.asarray(feat_step(state, m, p)[0])
             for m, p, _ in batches(bs)]))
    # per-sample eval-mode features are batch-size independent...
    np.testing.assert_allclose(feats[0], feats[1], rtol=1e-4, atol=1e-5)
    # ...and so is the solved plan (loose bound: the GW early exit can
    # amplify last-ulp conv differences across XLA batch fusions)
    np.testing.assert_allclose(tvs[0], tvs[1], rtol=1e-2, atol=1e-8)


def test_resolve_mesh_validates_process_group(monkeypatch):
    """Multi-process groups must span every device (ADVICE finding 3):
    the default --num-devices implies 'auto', and an explicit partial
    mesh raises instead of silently training divergent models."""
    from otfusion_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    m = mesh_mod.resolve_mesh(None)  # trainer/CLI default -> auto
    assert m is not None and m.devices.size == jax.device_count()
    m = mesh_mod.resolve_mesh("auto")
    assert m is not None and m.devices.size == jax.device_count()
    with pytest.raises(ValueError, match="cover all"):
        mesh_mod.resolve_mesh(4)
    # ...and an EXPLICIT 1 raises too instead of being silently widened
    # to the whole group (the CLI default is the None sentinel, so a
    # user-typed --num-devices 1 is always explicit)
    with pytest.raises(ValueError, match="cover all"):
        mesh_mod.resolve_mesh(1)
    # TP composes with multi-host (round 3): a 2-D mesh spanning the
    # whole group, model axis on consecutive (intra-process) devices.
    m = mesh_mod.resolve_mesh("auto", tp_size=2)
    assert m is not None and m.devices.size == jax.device_count()
    assert m.shape["model"] == 2


def test_aggregator_xlsx_twin(tmp_path):
    """The aggregator writes an XLSX twin next to the CSV (reference
    aggregate_pretraining_best_results.py:164-179); validated by reading
    it back with pandas (which uses a real OOXML parser)."""
    from otfusion_tpu.cli.aggregate_results import main as agg_main

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
    xlsx = tmp_path / "best.xlsx"
    assert xlsx.exists()
    try:
        import pandas as pd

        df = pd.read_excel(xlsx)
    except ImportError:
        import zipfile

        with zipfile.ZipFile(xlsx) as z:
            sheet = z.read("xl/worksheets/sheet1.xml").decode()
        assert "0.9167" in sheet and "with_pretrain" in sheet
        return
    assert list(df.columns)[0] == "setup"
    assert float(df.loc[0, "val_acc"]) == 0.9167
    assert int(df.loc[0, "best_epoch"]) == 35
    assert "with_pretrain" in str(df.loc[0, "setup"])


def test_xlsx_nan_inf_coerce_to_empty_cells(tmp_path):
    """'nan'/'inf' strings parse via float() but have no XLSX number-cell
    representation (and int(nan) raises): errors='coerce' parity demands
    an empty cell, not a crash."""
    from otfusion_tpu.utils.reporting import CSV_COLUMNS, write_results_xlsx

    row = {c: "x" for c in CSV_COLUMNS}
    row.update(val_acc="nan", best_val_loss="inf", best_epoch="35",
               f1_score="-inf")
    out = tmp_path / "t.xlsx"
    write_results_xlsx([row], out)
    import zipfile

    with zipfile.ZipFile(out) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "35" in sheet and "nan" not in sheet and "inf" not in sheet


def test_flagship_trainer_s2d_stem_end_to_end(tmp_path):
    """Regression: the coupling service's feature-extract step must build
    s2d-stem backbones when the model does (caught by the verify drive:
    ScopeParamShapeError in make_feature_extract_step)."""
    from otfusion_tpu.data import make_synthetic_adni
    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
    )
    from otfusion_tpu.train.loop import run_fusion_training

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=3,
                               shape=(8, 8, 8))
    ds = MultimodalNiftiDataset(
        root_dir=str(tree), class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY)
    n = len(ds.samples)
    val_idx = list(range(0, n, 3))
    train_idx = [i for i in range(n) if i not in val_idx]
    result = run_fusion_training(
        samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
        class_names=CLASS_NAMES_MRI_BINARY, variant="per_epoch_attn",
        model_depth=10, target_shape=(8, 8, 8), batch_size=4, lr=1e-3,
        epochs=1, seed=0, save_path=str(tmp_path / "run"),
        max_jax_samples=4, gw_max_iterations=20,
        sinkhorn_max_iterations=50, progress=False, s2d_stem=True,
    )
    assert np.isfinite(result["best_val_loss"])


def test_s2d_rejects_odd_hw():
    """Odd H/W under --s2d-stem is a clear ValueError naming the flag,
    not a raw reshape crash deep inside model.init."""
    with pytest.raises(ValueError, match="even H and W"):
        space_to_depth_hw(jnp.zeros((1, 8, 7, 8, 1)))


def test_rewrite_last_jsonl(tmp_path):
    """Epoch rows are appended right after eval (durable against a crash
    in the checkpoint/coupling phases) then atomically completed."""
    import json

    from otfusion_tpu.train.loop import _append_jsonl, _rewrite_last_jsonl

    p = str(tmp_path / "metrics.jsonl")
    off1 = _append_jsonl(p, {"epoch": 1, "phase_seconds": {"train": 1.0}})
    off2 = _append_jsonl(p, {"epoch": 2, "phase_seconds": {"train": 1.0}})
    assert off1 == 0 and off2 > 0
    # The completed record may be SHORTER or LONGER than the provisional
    # row — seek+truncate must handle both without corrupting the tail.
    _rewrite_last_jsonl(
        p, {"epoch": 2,
            "phase_seconds": {"train": 1.0, "checkpoint": 0.5}}, off2)
    rows = [json.loads(l) for l in open(p)]
    assert [r["epoch"] for r in rows] == [1, 2]
    assert rows[0]["phase_seconds"] == {"train": 1.0}
    assert rows[1]["phase_seconds"] == {"train": 1.0, "checkpoint": 0.5}
    _rewrite_last_jsonl(p, {"epoch": 2}, off2)
    rows = [json.loads(l) for l in open(p)]
    assert rows == [{"epoch": 1, "phase_seconds": {"train": 1.0}},
                    {"epoch": 2}]


def test_resolve_eval_batch_policy():
    """--eval-batch-size: default 4x the train batch (forward-only eval
    has no stored backward activations), explicit values pass through,
    nonsense raises."""
    from otfusion_tpu.train.loop import _resolve_eval_batch

    assert _resolve_eval_batch(None, 8) == 32
    assert _resolve_eval_batch(12, 8) == 12
    with pytest.raises(ValueError):
        _resolve_eval_batch(0, 8)


def test_eval_metrics_invariant_to_eval_batch_size(rng):
    """Eval accumulates sample-weighted loss over running BN stats, so
    the epoch metrics must be IDENTICAL (up to fp reduction order) no
    matter how the val set is batched — the invariance that makes the
    4x --eval-batch-size default exact rather than approximate."""
    from otfusion_tpu.models.resnet3d import ResNet3DClassifier
    from otfusion_tpu.train.loop import _run_eval_epoch
    from otfusion_tpu.train.steps import make_unimodal_eval_step

    model = ResNet3DClassifier(depth=10, num_classes=2)
    n = 7  # deliberately not a multiple of either batch size
    vols = rng.normal(size=(n, 8, 8, 8, 1)).astype(np.float32)
    labels = np.asarray(rng.integers(0, 2, size=n), np.int32)
    state = create_train_state(model, jax.random.key(0), (vols[:2],), 1e-3)
    eval_step = make_unimodal_eval_step(model)

    def run(bs):
        batches = [(jnp.asarray(vols[i:i + bs]),
                    jnp.asarray(labels[i:i + bs]))
                   for i in range(0, n, bs)]
        return _run_eval_epoch(eval_step, state, batches, ())

    loss2, acc2, preds2, targets2, _ = run(2)
    loss5, acc5, preds5, targets5, _ = run(5)
    assert preds2 == preds5 and targets2 == targets5
    assert acc2 == acc5
    np.testing.assert_allclose(loss2, loss5, rtol=1e-5)
