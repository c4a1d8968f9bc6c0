"""Round-4 fixes: the auto eval/feature voxel-budget cap actually wired
(ADVICE r3 #1-3) and the s2d stem as the default for fresh trainings
(VERDICT r3 weak #1)."""

import json

import numpy as np
import pytest

from otfusion_tpu.train.loop import _resolve_eval_batch, _resolve_stem


def test_resolve_eval_batch_voxel_cap():
    """The _AUTO_FWD_VOXEL_BUDGET cap: at the flagship shape the auto 4x
    batch is capped to 16 @128^3 (B=32 forward was NOT compilable in this
    environment); explicit values are never capped; the auto pick never
    drops below the train batch itself."""
    shape = (128, 128, 128)
    # 4 * 8 = 32 would exceed the 16 * 128^3 budget -> capped to 16
    assert _resolve_eval_batch(None, 8, shape) == 16
    # small volumes: the 4x default survives untouched
    assert _resolve_eval_batch(None, 8, (64, 64, 64)) == 32
    # explicit values pass through uncapped
    assert _resolve_eval_batch(32, 8, shape) == 32
    # never auto-pick below the train batch (it provably fits fwd+bwd)
    assert _resolve_eval_batch(None, 32, shape) == 32
    # flag name surfaces in the validation error
    with pytest.raises(ValueError, match="--feature-batch-size"):
        _resolve_eval_batch(0, 8, shape, flag="--feature-batch-size")


def test_fusion_loop_caps_auto_batches(tmp_path, monkeypatch):
    """The fusion trainer passes target_shape into BOTH auto-batch
    resolutions (eval + feature pass) — the dead-code wiring ADVICE r3 #1
    flagged. Captured via the loader batch sizes on a tiny run whose
    budget we shrink so the cap bites at test shapes."""
    from otfusion_tpu.data import make_synthetic_adni
    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
    )
    from otfusion_tpu.train import loop as loop_mod

    # budget = 2 batches x 8^3 voxels -> auto eval/feature batches cap at 2
    monkeypatch.setattr(loop_mod, "_AUTO_FWD_VOXEL_BUDGET", 2 * 8**3)
    seen = {}
    orig = loop_mod.MultimodalLoader

    class SpyLoader(orig):
        def __init__(self, samples, shape, batch_size, **kw):
            seen.setdefault("batches", []).append(batch_size)
            super().__init__(samples, shape, batch_size, **kw)

    monkeypatch.setattr(loop_mod, "MultimodalLoader", SpyLoader)

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=3,
                               shape=(8, 8, 8))
    ds = MultimodalNiftiDataset(
        root_dir=str(tree), class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY)
    n = len(ds.samples)
    val_idx = list(range(0, n, 3))
    train_idx = [i for i in range(n) if i not in val_idx]
    loop_mod.run_fusion_training(
        samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
        class_names=CLASS_NAMES_MRI_BINARY, variant="per_epoch_attn",
        model_depth=10, target_shape=(8, 8, 8), batch_size=2, lr=1e-3,
        epochs=1, seed=0, save_path=str(tmp_path / "run"),
        max_jax_samples=4, gw_max_iterations=10,
        sinkhorn_max_iterations=20, progress=False,
    )
    # train loader keeps the train batch; feature + eval loaders both
    # resolve to the capped 2 (not the uncapped 4x = 8)
    assert seen["batches"] == [2, 2, 2]


def test_fold_bn_logit_equality(rng):
    """BN folding at load is EXACT in eval mode: the folded biased-conv
    model reproduces the BN model's logits on non-trivial running stats
    (VERDICT r3 weak #5)."""
    import jax
    import jax.numpy as jnp

    from otfusion_tpu.models.resnet3d import ResNet3DClassifier
    from otfusion_tpu.train import create_train_state, make_unimodal_train_step
    from otfusion_tpu.utils.checkpoint import fold_conv_bn_params

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray([0, 1])
    model = ResNet3DClassifier(depth=10, num_classes=2)
    state = create_train_state(model, jax.random.key(0), (x,), 1e-3)
    # one train step makes the running stats non-trivial
    train = make_unimodal_train_step(model, donate=False)
    state, _ = train(state, x, labels, jax.random.key(1))

    want, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)

    folded = ResNet3DClassifier(depth=10, num_classes=2, fold_bn=True)
    params = dict(state.params)
    params["backbone"] = fold_conv_bn_params(
        params["backbone"], state.batch_stats["backbone"])
    got, _ = folded.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # the folded tree has no BN params left
    assert "BatchNorm_0" not in params["backbone"]["_ConvBN_0"]
    assert "bias" in params["backbone"]["_ConvBN_0"]["Conv_0"]
    # fold_bn models refuse to train
    with pytest.raises(ValueError, match="inference-only"):
        folded.apply({"params": params}, x, train=True)


def test_fold_bn_fusion_equality(rng):
    """Same exactness through the flagship fusion forward (both ResNet3D
    backbones folded, trunk untouched)."""
    import jax
    import jax.numpy as jnp

    from otfusion_tpu.models import MultimodalOTFusion
    from otfusion_tpu.models.resnet3d import feature_dim
    from otfusion_tpu.train import create_train_state
    from otfusion_tpu.utils.checkpoint import fold_conv_bn_params

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    state = create_train_state(model, jax.random.key(0), (x, x), 1e-3,
                               t_feature=tv)
    want = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, x, t_feature=tv, train=False)["logits"]

    folded = MultimodalOTFusion(num_classes=2, depth=10,
                                variant="per_epoch_attn", fold_bn=True)
    params = dict(state.params)
    for mod in ("mri_backbone", "pet_backbone"):
        params[mod] = fold_conv_bn_params(params[mod],
                                          state.batch_stats[mod])
    got = folded.apply({"params": params}, x, x, t_feature=tv,
                       train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fold_state_for_serving_device_resident(rng):
    """fold_state_for_serving returns jax.Array leaves (round-5 fix):
    the folders compute on host numpy, and numpy leaves in a jit
    argument are re-uploaded on EVERY call — measured 126 ms -> 15.7 s
    per serving batch through the TPU tunnel. The shared helper must
    device_put the folded state once, and stay exact."""
    import jax
    import jax.numpy as jnp

    from otfusion_tpu.models import MultimodalOTFusion
    from otfusion_tpu.models.resnet3d import feature_dim
    from otfusion_tpu.train import create_train_state
    from otfusion_tpu.utils.checkpoint import fold_state_for_serving

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    state = create_train_state(model, jax.random.key(0), (x, x), 1e-3,
                               t_feature=tv)
    want = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, x, t_feature=tv, train=False)["logits"]

    folded_state = fold_state_for_serving(
        state, {"mri_backbone": "", "pet_backbone": ""})
    for leaf in jax.tree_util.tree_leaves(
            (folded_state.params, folded_state.batch_stats)):
        assert isinstance(leaf, jax.Array), type(leaf)
    # folded backbones dropped from batch_stats, trunk stats kept
    assert "mri_backbone" not in folded_state.batch_stats

    folded = MultimodalOTFusion(num_classes=2, depth=10,
                                variant="per_epoch_attn", fold_bn=True)
    got = folded.apply(
        {"params": folded_state.params,
         "batch_stats": folded_state.batch_stats},
        x, x, t_feature=tv, train=False)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_resolve_stem_policy(tmp_path):
    """Tri-state stem resolution: fresh runs default to s2d; --resume
    keeps the recorded stem; an explicit flag contradicting the recorded
    stem raises (Adam moments aren't rewritable between layouts)."""
    run = tmp_path / "run"
    run.mkdir()
    # fresh run, no flag -> s2d
    assert _resolve_stem(None, False, str(run)) is True
    # explicit flags always win on fresh runs
    assert _resolve_stem(False, False, str(run)) is False
    assert _resolve_stem(True, False, str(run)) is True
    # resume with a recorded plain stem keeps plain
    with open(run / "model_config.json", "w") as f:
        json.dump({"s2d_stem": False}, f)
    assert _resolve_stem(None, True, str(run)) is False
    assert _resolve_stem(False, True, str(run)) is False
    with pytest.raises(ValueError, match="s2d_stem=False"):
        _resolve_stem(True, True, str(run))
    # resume with a recorded s2d stem keeps s2d
    with open(run / "model_config.json", "w") as f:
        json.dump({"s2d_stem": True}, f)
    assert _resolve_stem(None, True, str(run)) is True
    with pytest.raises(ValueError, match="s2d_stem=True"):
        _resolve_stem(False, True, str(run))
    # pre-manifest run (latest/ exists, no model_config.json): plain
    run2 = tmp_path / "old_run"
    (run2 / "latest").mkdir(parents=True)
    assert _resolve_stem(None, True, str(run2)) is False
    # resume of a run that never started = fresh
    assert _resolve_stem(None, True, str(tmp_path / "nowhere")) is True


def test_fresh_run_defaults_s2d_and_resume_keeps_plain(tmp_path):
    """End-to-end: a fresh unimodal run trains the s2d stem by default
    (the benched-best config is now the shipped default); resuming a run
    recorded as plain-stem keeps the plain stem so the optimiser state
    restores exactly."""
    from otfusion_tpu.data import make_synthetic_adni
    from otfusion_tpu.data.datasets import NiftiDataset
    from otfusion_tpu.train.loop import run_unimodal_training

    tree = make_synthetic_adni(tmp_path / "adni", n_per_class=3,
                               shape=(8, 8, 8))
    ds = NiftiDataset(str(tree))
    n = len(ds.samples)
    val_idx = list(range(0, n, 3))
    train_idx = [i for i in range(n) if i not in val_idx]
    common = dict(
        samples=ds.samples, train_idx=train_idx, val_idx=val_idx,
        class_names=ds.class_names, model_depth=10,
        target_shape=(8, 8, 8), batch_size=2, lr=1e-3, epochs=1, seed=0,
        progress=False,
    )
    # fresh run, stem unspecified -> manifest records s2d
    fresh = tmp_path / "fresh"
    run_unimodal_training(save_path=str(fresh), **common)
    cfg = json.load(open(fresh / "model_config.json"))
    assert cfg["s2d_stem"] is True

    # a plain-stem run resumed without the flag stays plain (the resume
    # would otherwise crash restoring the optimiser into s2d shapes)
    plain = tmp_path / "plain"
    run_unimodal_training(save_path=str(plain), s2d_stem=False, **common)
    assert json.load(open(plain / "model_config.json"))["s2d_stem"] is False
    res = run_unimodal_training(save_path=str(plain), resume=True,
                                **{**common, "epochs": 2})
    assert np.isfinite(res["best_val_loss"])
    assert json.load(open(plain / "model_config.json"))["s2d_stem"] is False


def test_legacy_remat_checkpoint_restores():
    """Checkpoints written by pre-round-4 ``remat=True`` runs carry
    flax's lifted block names (``CheckpointBasicBlock3D_N``); since the
    blocks are now explicitly named (models/resnet3d.py) the restore
    path migrates those keys back (`utils/checkpoint.py:
    _migrate_legacy_remat_names`) instead of failing the tree match."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax
    from flax.training import train_state as ts

    from otfusion_tpu.models.resnet3d import ResNet3DClassifier
    from otfusion_tpu.utils.checkpoint import (
        _migrate_legacy_remat_names,
        restore_checkpoint,
        save_checkpoint,
    )

    class _TS(ts.TrainState):
        batch_stats: dict = None

    model = ResNet3DClassifier(num_classes=2, depth=10)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    state = _TS.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.sgd(1e-3), batch_stats=variables["batch_stats"])

    def legacyize(tree):
        if not isinstance(tree, dict):
            return tree
        return {("Checkpoint" + k if k.startswith(("BasicBlock3D_",
                                                    "Bottleneck3D_"))
                 else k): legacyize(v) for k, v in tree.items()}

    legacy_params = legacyize(jax.device_get(state.params))
    assert any(k.startswith("CheckpointBasicBlock3D_")
               for k in legacy_params["backbone"])
    # round-trips back to the modern layout
    migrated = _migrate_legacy_remat_names(legacy_params)
    assert (jax.tree_util.tree_structure(migrated)
            == jax.tree_util.tree_structure(jax.device_get(state.params)))

    legacy_state = state.replace(
        params=legacy_params,
        batch_stats=legacyize(jax.device_get(state.batch_stats)))
    with tempfile.TemporaryDirectory() as tmp:
        d = f"{tmp}/best_model"
        save_checkpoint(d, legacy_state, block=True)
        restored = restore_checkpoint(d, state)
    chex = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, jax.device_get(state.params))
    del chex
    assert any(k.startswith("BasicBlock3D_")
               for k in restored.params["backbone"])
