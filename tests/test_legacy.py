"""Legacy RIMA/GAMMA path tests (tiny shapes)."""

import jax
from pathlib import Path
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.data.gamma import (
    GammaDataset,
    GammaLoader,
    make_synthetic_gamma,
    read_gamma_labels,
)
from otfusion_tpu.models.legacy_fusion import LegacyMultiModalFusion
from otfusion_tpu.train import create_train_state
from otfusion_tpu.train.ensemble import evaluate_ensemble
from otfusion_tpu.train.legacy_steps import (
    make_legacy_eval_step,
    make_legacy_train_step,
)


@pytest.fixture(scope="module")
def gamma_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("gamma")
    return make_synthetic_gamma(root, n_cases=6, fundus_size=32,
                                oct_shape=(16, 16, 16))


def test_gamma_dataset_and_loader(gamma_tree):
    mgamma, labels_csv = gamma_tree
    labels = read_gamma_labels(labels_csv)
    assert len(labels) == 6
    ds = GammaDataset(mgamma, labels_csv, oct_shape=(16, 16, 16),
                      fundus_size=32)
    assert len(ds) == 6
    loader = GammaLoader(ds, range(6), batch_size=4, augment=True, seed=1)
    fundus, oct_vol, y = next(iter(loader))
    assert fundus.shape == (4, 32, 32, 3)
    assert oct_vol.shape == (4, 16, 16, 16, 1)
    assert fundus.max() <= 1.0 and fundus.min() >= 0.0
    assert np.isfinite(oct_vol).all()


def _tiny_legacy():
    # oct 16^3 -> D' = 2 -> oct dim 1024
    return LegacyMultiModalFusion(num_classes=2, oct_feature_dim=1024)


def test_legacy_forward_shapes(rng):
    model = _tiny_legacy()
    fundus = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    oct_vol = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
    tv = jnp.full((1024, 2048), 1.0 / (1024 * 2048))
    vars_ = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        fundus, oct_vol, tv, train=False,
    )
    out = model.apply(vars_, fundus, oct_vol, tv, train=False)
    assert out["logits"].shape == (2, 2)
    assert out["fundus_feat"].shape == (2, 2048)
    assert out["oct_feat"].shape == (2, 1024)
    assert out["pred_oct"].shape == (2, 1024)
    assert out["pred_fundus"].shape == (2, 2048)


def test_legacy_feature_dim_mismatch_raises(rng):
    model = LegacyMultiModalFusion(num_classes=2, oct_feature_dim=9999)
    fundus = jnp.zeros((1, 32, 32, 3))
    oct_vol = jnp.zeros((1, 16, 16, 16, 1))
    with pytest.raises(ValueError, match="OCT encoder produced"):
        model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            fundus, oct_vol, None, train=False,
        )


def test_legacy_train_step_learns(rng):
    model = _tiny_legacy()
    fundus = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    oct_vol = jnp.asarray(
        rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1])
    tv = jnp.full((1024, 2048), 1.0 / (1024 * 2048))
    state = create_train_state(model, jax.random.key(0),
                               (fundus, oct_vol, tv), 1e-4)
    train = make_legacy_train_step(model, gw_max_iterations=30)
    evals = make_legacy_eval_step(model)
    losses = []
    for i in range(8):
        state, met = train(state, fundus, oct_vol, labels,
                           jax.random.key(i))
        losses.append(float(met["loss"]))
        assert np.isfinite(losses[-1])
        assert float(met["ot_loss"]) >= 0.0
    # deep net + BN on random data is noisy early; require overall descent
    assert min(losses[-3:]) < losses[0]
    out = evals(state, fundus, oct_vol, labels, tv)
    assert out["preds"].shape == (4,)


def test_evaluate_ensemble(rng):
    labels = rng.integers(0, 2, size=30)
    # member 1 is good, member 2 is noise
    good = np.eye(2)[labels] * 4 + rng.normal(size=(30, 2)) * 0.1
    noise = rng.normal(size=(30, 2))
    m = evaluate_ensemble([good, noise], labels)
    assert m["n_members"] == 2
    assert m["accuracy"] > 0.8
    for key in ("f1", "kappa", "auc", "ens_ece", "ens_nll", "ens_brier"):
        assert np.isfinite(m[key])


class _Args:
    pass


def test_multimodal_filelist_dataset(tmp_path):
    """Reference Multi_modal_data (data_gamma.py:72-192) parity: file-list
    driven .npy loads, /255 scaling, transformer resizes, the noise
    conditions including the upstream Gaussian-zeroing bug, and the
    per-item deterministic RNG quirk."""
    from otfusion_tpu.data.gamma import MultiModalFileListDataset

    rng = np.random.default_rng(0)
    folder = tmp_path / "folder0"
    folder.mkdir()
    n = 3
    fun_paths, oct_paths, labels = [], [], []
    for i in range(n):
        fun = (rng.uniform(0, 255, size=(3, 20, 24))).astype(np.float32)
        octv = (rng.uniform(0, 255, size=(10, 12, 14))).astype(np.float32)
        fp, op = tmp_path / f"fun{i}.npy", tmp_path / f"oct{i}.npy"
        np.save(fp, fun)
        np.save(op, octv)
        fun_paths.append(str(fp))
        oct_paths.append(str(op))
        labels.append(i % 2)
    (folder / "train_FUN.txt").write_text("\n".join(fun_paths) + "\n")
    (folder / "train_OCT.txt").write_text("\n".join(oct_paths) + "\n")
    (folder / "train_GT.txt").write_text(
        "\n".join(str(v) for v in labels) + "\n")

    ds = MultiModalFileListDataset(str(tmp_path) + "/", 2, ["FUN", "OCT"],
                                   "train")
    assert len(ds) == n
    data, y = ds[1]
    assert y == labels[1]
    # cnn base: raw shapes survive, both modalities /255-scaled
    assert data[0].shape == (3, 20, 24)
    assert data[1].shape == (1, 10, 12, 14)
    assert 0.0 <= data[0].max() <= 1.0 and 0.0 <= data[1].max() <= 1.0
    np.testing.assert_allclose(
        data[0], np.load(fun_paths[1]).astype(np.float32) / 255.0)

    # transformer base: fundus 384x384 bicubic, OCT order-0 zoom to 96^3
    ds_t = MultiModalFileListDataset(str(tmp_path) + "/", 2,
                                     ["FUN", "OCT"], "train",
                                     model_base="transformer")
    data_t, _ = ds_t[0]
    assert data_t[0].shape == (3, 384, 384)
    assert data_t[1].shape == (1, 96, 96, 96)

    # SaltPepper condition: deterministic per item (global-seed quirk
    # reproduced without touching the global RNG) and actually scatters
    ds_sp = MultiModalFileListDataset(
        str(tmp_path) + "/", 2, ["FUN", "OCT"], "train",
        condition="noise", condition_name="SaltPepper", seed_idx=7,
        sp_variance=0.1)
    a0, _ = ds_sp[0]
    a1, _ = ds_sp[0]
    np.testing.assert_array_equal(a0[0], a1[0])
    clean = np.load(fun_paths[0]).astype(np.float32) / 255.0
    assert ((a0[0] == 1.0) | (a0[0] == 0.0)).any()
    assert not np.allclose(a0[0], clean)

    # Gaussian condition: the upstream zeroing bug is reproduced verbatim
    ds_g = MultiModalFileListDataset(
        str(tmp_path) + "/", 2, ["FUN", "OCT"], "train",
        condition="noise", condition_name="Gaussian")
    g0, _ = ds_g[0]
    np.testing.assert_array_equal(g0[0], np.zeros_like(g0[0]))

    # default noise arm: additive gaussian + CHW salt-pepper, clipped
    ds_n = MultiModalFileListDataset(
        str(tmp_path) + "/", 2, ["FUN", "OCT"], "train",
        condition="noise", g_variance=0.05, sp_variance=0.05)
    n0, _ = ds_n[0]
    assert n0[0].min() >= 0.0 and n0[0].max() <= 1.0
    assert not np.allclose(n0[0], clean)

    # path_map generalises the reference's hardcoded prefix rewrite
    moved = tmp_path / "moved"
    moved.mkdir()
    for p in fun_paths + oct_paths:
        (moved / Path(p).name).write_bytes(Path(p).read_bytes())
    (folder / "train_FUN.txt").write_text(
        "\n".join("E:/old/" + Path(p).name for p in fun_paths) + "\n")
    ds_m = MultiModalFileListDataset(
        str(tmp_path) + "/", 1, ["FUN"], "train",
        path_map=("E:/old/", str(moved) + "/"))
    m0, _ = ds_m[2]
    np.testing.assert_allclose(
        m0[0], np.load(fun_paths[2]).astype(np.float32) / 255.0)
