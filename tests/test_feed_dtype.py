"""bf16 volume feeding (round-3 perf work).

In bf16 compute mode the loaders ship volumes as bfloat16
(`data/loader.py:feed_dtype_for`): the backbone stem conv casts its
input to the layer dtype anyway, so a host-side round-to-nearest-even
cast is BIT-IDENTICAL to feeding f32 — while halving host->device
transfer bytes and the batch HBM footprint (2 x B x side^3 x 4 bytes is
the largest per-step transfer at the fusion production shape). These
tests pin the exactness claim: if a model ever grows an op that
consumes the raw volume in f32 BEFORE the first cast, the bitwise
assertions here break loudly.
"""

import ml_dtypes
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from otfusion_tpu.data.loader import Loader, MultimodalLoader, feed_dtype_for


def test_feed_dtype_for_mapping():
    assert feed_dtype_for(jnp.bfloat16) == np.dtype(ml_dtypes.bfloat16)
    assert feed_dtype_for("bfloat16") == np.dtype(ml_dtypes.bfloat16)
    assert feed_dtype_for(jnp.float32) == np.dtype(np.float32)
    assert feed_dtype_for(np.float32) == np.dtype(np.float32)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from otfusion_tpu.data import make_synthetic_adni

    root = tmp_path_factory.mktemp("adni_feed")
    return make_synthetic_adni(root, n_per_class=3, shape=(12, 12, 12))


def test_loaders_yield_feed_dtype(tree):
    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
    )

    ds = MultimodalNiftiDataset(
        root_dir=str(tree),
        class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY,
    )
    bf16 = np.dtype(ml_dtypes.bfloat16)
    lo = MultimodalLoader(ds.samples, (12, 12, 12), 4, feed_dtype=bf16)
    mri, pet, lbl = next(iter(lo))
    assert mri.dtype == bf16 and pet.dtype == bf16
    assert lbl.dtype == np.int32
    # default stays f32
    lo32 = MultimodalLoader(ds.samples, (12, 12, 12), 4)
    mri32, _, _ = next(iter(lo32))
    assert mri32.dtype == np.float32
    # the bf16 feed is the rounded f32 feed, not a different volume
    np.testing.assert_array_equal(mri, mri32.astype(bf16))

    uni = Loader([(s[0], s[2]) for s in ds.samples], (12, 12, 12), 4,
                 feed_dtype=bf16)
    vol, _ = next(iter(uni))
    assert vol.dtype == bf16


def _bitwise(a, b):
    a = np.asarray(a)
    np.testing.assert_array_equal(a, np.asarray(b))
    assert np.isfinite(a.astype(np.float32)).all()


def test_fusion_step_bitwise_invariant_to_bf16_feed():
    """bf16-mode train step: feeding host-cast bf16 volumes must produce
    bit-identical metrics and parameters vs feeding the f32 originals
    (the stem conv's promote_dtype performs the same RN-even cast)."""
    from otfusion_tpu.models.fusion import MultimodalOTFusion
    from otfusion_tpu.train.steps import make_fusion_train_step
    from otfusion_tpu.train.train_state import create_train_state

    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn",
                               dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    mri = rng.normal(size=(4, 12, 12, 12, 1)).astype(np.float32)
    pet = rng.normal(size=(4, 12, 12, 12, 1)).astype(np.float32)
    lbl = np.array([0, 1, 0, 1], np.int32)
    d = 512
    tv = jnp.full((d, d), 1.0 / (d * d), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0),
        (jnp.asarray(mri[:1]), jnp.asarray(pet[:1])), 1e-3, t_feature=tv)
    step = make_fusion_train_step(model, donate=False)
    key = jax.random.key(5)

    s32, m32 = step(state, mri, pet, lbl, tv, key)
    s16, m16 = step(state, mri.astype(ml_dtypes.bfloat16),
                    pet.astype(ml_dtypes.bfloat16), lbl, tv, key)
    _bitwise(m32["loss"], m16["loss"])
    _bitwise(m32["correct"], m16["correct"])
    leaves32 = jax.tree_util.tree_leaves(s32.params)
    leaves16 = jax.tree_util.tree_leaves(s16.params)
    for a, b in zip(leaves32, leaves16):
        _bitwise(a, b)


def test_bf16_trainer_with_dp_mesh(tree, tmp_path):
    """End-to-end: bf16 compute + bf16 feed + DP mesh. Exercises the
    bf16 numpy batches through _dp_wrap's global-array assembly and the
    flagship coupling feature pass (no prior test ran a trainer in bf16
    mode at all)."""
    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI_BINARY,
        CLASS_NAMES_PET_BINARY,
        MultimodalNiftiDataset,
    )
    from otfusion_tpu.train.loop import run_fusion_training

    ds = MultimodalNiftiDataset(
        root_dir=str(tree),
        class_names_a=CLASS_NAMES_MRI_BINARY,
        class_names_b=CLASS_NAMES_PET_BINARY,
    )
    n = len(ds.samples)
    val_idx = list(range(0, n, 3))
    train_idx = [i for i in range(n) if i not in val_idx]
    result = run_fusion_training(
        samples=ds.samples,
        train_idx=train_idx,
        val_idx=val_idx,
        class_names=CLASS_NAMES_MRI_BINARY,
        variant="per_epoch_attn",
        model_depth=10,
        target_shape=(12, 12, 12),
        batch_size=2,
        lr=1e-3,
        epochs=1,
        seed=3,
        save_path=str(tmp_path / "bf16run"),
        max_jax_samples=4,
        gw_max_iterations=10,
        sinkhorn_max_iterations=20,
        num_devices=2,
        dtype=jnp.bfloat16,
        progress=False,
    )
    h = result["history"]
    assert len(h) == 1 and np.isfinite(h[0].train_loss)


def test_legacy_eval_step_bitwise_invariant_to_bf16_feed():
    """GAMMA path: fundus(2D) + OCT(3D) through LegacyMultiModalFusion
    in bf16 mode must also be feed-dtype invariant (cli/train_gamma.py
    wires feed_dtype into GammaLoader)."""
    from otfusion_tpu.models.legacy_fusion import LegacyMultiModalFusion
    from otfusion_tpu.train.legacy_steps import make_legacy_eval_step
    from otfusion_tpu.train.train_state import create_train_state

    oct_dim = 512  # 512 * D' with D'=1 for 8^3 inputs (pool="hw")
    model = LegacyMultiModalFusion(num_classes=2, oct_feature_dim=oct_dim,
                                   dtype=jnp.bfloat16)
    rng = np.random.default_rng(6)
    fundus = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    oct_vol = rng.uniform(0, 1, size=(2, 8, 8, 8, 1)).astype(np.float32)
    lbl = np.array([0, 1], np.int32)
    tv = jnp.zeros((oct_dim, 2048), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0),
        (jnp.asarray(fundus), jnp.asarray(oct_vol), tv), 1e-3)
    step = make_legacy_eval_step(model)
    o32 = step(state, fundus, oct_vol, lbl, tv)
    o16 = step(state, fundus.astype(ml_dtypes.bfloat16),
               oct_vol.astype(ml_dtypes.bfloat16), lbl, tv)
    _bitwise(o32["logits"], o16["logits"])
    _bitwise(o32["fundus_feat"], o16["fundus_feat"])
    _bitwise(o32["oct_feat"], o16["oct_feat"])


def test_unimodal_eval_step_bitwise_invariant_to_bf16_feed():
    from otfusion_tpu.models import ResNet3DClassifier
    from otfusion_tpu.train.steps import make_unimodal_eval_step
    from otfusion_tpu.train.train_state import create_train_state

    model = ResNet3DClassifier(depth=10, num_classes=2,
                               dtype=jnp.bfloat16)
    rng = np.random.default_rng(4)
    vol = rng.normal(size=(4, 12, 12, 12, 1)).astype(np.float32)
    lbl = np.array([0, 1, 1, 0], np.int32)
    state = create_train_state(model, jax.random.key(0),
                               (jnp.asarray(vol[:1]),), 1e-3)
    step = make_unimodal_eval_step(model)
    o32 = step(state, vol, lbl)
    o16 = step(state, vol.astype(ml_dtypes.bfloat16), lbl)
    _bitwise(o32["logits"], o16["logits"])
    _bitwise(o32["preds"], o16["preds"])
