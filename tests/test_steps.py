"""Train/eval step tests: losses decrease, metrics sane, coupling service
matches the dict-based reference pipeline."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.models import MultimodalOTFusion, ResNet3DClassifier
from otfusion_tpu.models.resnet3d import feature_dim
from otfusion_tpu.ops import egw_per_label, entropic_gw, get_coupling_fot
from otfusion_tpu.train import (
    CouplingService,
    ReduceLROnPlateau,
    cosine_alignment_loss,
    create_train_state,
    make_feature_extract_step,
    make_fusion_eval_step,
    make_fusion_train_step,
    make_unimodal_eval_step,
    make_unimodal_train_step,
)
from otfusion_tpu.train.coupling import coupling_pipeline, group_and_pad
from otfusion_tpu.train.train_state import set_learning_rate


def _data(rng, b=4, s=8):
    mri = jnp.asarray(rng.normal(size=(b, s, s, s, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(b, s, s, s, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=b))
    return mri, pet, labels


def test_unimodal_step_learns(rng):
    model = ResNet3DClassifier(depth=10, num_classes=2)
    vol = jnp.asarray(rng.normal(size=(4, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray([0, 1, 0, 1])
    state = create_train_state(model, jax.random.key(0), (vol,), 1e-3,
                               optimizer="adam")
    train = make_unimodal_train_step(model, donate=False)
    evals = make_unimodal_eval_step(model)
    first = None
    for i in range(8):
        state, m = train(state, vol, labels, jax.random.key(i))
        if first is None:
            first = float(m["loss"])
    out = evals(state, vol, labels)
    assert float(out["loss"]) < first
    assert out["features"].shape == (4, 512)


def test_fusion_step_per_epoch_attn(rng):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    mri, pet, labels = _data(rng)
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / (d * d))
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=tv)
    train = make_fusion_train_step(model, donate=False)
    evals = make_fusion_eval_step(model)
    losses = []
    for i in range(6):
        state, m = train(state, mri, pet, labels, tv, jax.random.key(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert 0.0 <= float(m["ot_loss"]) <= 2.0
    assert losses[-1] < losses[0]
    out = evals(state, mri, pet, labels, tv)
    assert out["preds"].shape == (4,)


def test_fusion_step_base_in_batch_fot(rng):
    """The base variant solves FOT *inside* the jitted step."""
    model = MultimodalOTFusion(num_classes=2, depth=10, variant="base")
    mri, pet, labels = _data(rng)
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=None)
    train = make_fusion_train_step(model, in_batch_fot=True,
                                   fot_epsilon=1e-3, donate=False)
    state, m = train(state, mri, pet, labels, None, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert float(m["ot_loss"]) > 0.0  # cosine distance of random feats


def test_mmfusion_has_no_ot_loss(rng):
    model = MultimodalOTFusion(num_classes=2, depth=10, variant="mmfusion")
    mri, pet, labels = _data(rng)
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=None)
    train = make_fusion_train_step(model, donate=False)
    state, m = train(state, mri, pet, labels, None, jax.random.key(0))
    assert float(m["ot_loss"]) == 0.0


def test_reduce_lr_on_plateau_parity():
    sched = ReduceLROnPlateau(initial_lr=1.0, factor=0.5, patience=2)
    # improving -> no change
    assert sched.step(1.0) == 1.0
    assert sched.step(0.9) == 1.0
    # stall: patience 2 means the 3rd bad epoch triggers
    assert sched.step(0.95) == 1.0
    assert sched.step(0.95) == 1.0
    assert sched.step(0.95) == 0.5
    # counter resets after reduction
    assert sched.step(0.95) == 0.5


def test_set_learning_rate(rng):
    model = ResNet3DClassifier(depth=10, num_classes=2)
    vol = jnp.zeros((1, 8, 8, 8, 1))
    state = create_train_state(model, jax.random.key(0), (vol,), 1e-3)
    state = set_learning_rate(state, 5e-4)
    assert np.isclose(
        float(state.opt_state.hyperparams["learning_rate"]), 5e-4
    )


def test_group_and_pad(rng):
    feats = rng.normal(size=(10, 4)).astype(np.float32)
    labels = np.array([0, 1, 0, 1, 1, 0, 1, 1, 0, 1])
    g, m = group_and_pad(feats, labels, n_labels=2, cap=5)
    assert g.shape == (2, 5, 4)
    np.testing.assert_array_equal(m[0], [True] * 4 + [False])
    np.testing.assert_array_equal(m[1], [True] * 5)
    np.testing.assert_allclose(g[0, :4], feats[labels == 0])
    np.testing.assert_allclose(g[1], feats[labels == 1][:5])


def test_coupling_pipeline_matches_dict_reference_path(rng):
    """Fused block-diagonal pipeline == per-label dicts through the parity
    wrappers (egw per label -> mdict block assembly -> FOT)."""
    d = 6
    sizes = [5, 7]
    cap = 8
    pet_g = np.zeros((2, cap, d), np.float32)
    mri_g = np.zeros((2, cap, d), np.float32)
    pet_m = np.zeros((2, cap), bool)
    mri_m = np.zeros((2, cap), bool)
    pet_dict, mri_dict = {}, {}
    for l, n in enumerate(sizes):
        pet_dict[l] = rng.normal(size=(n, d)).astype(np.float32)
        mri_dict[l] = rng.normal(size=(n, d)).astype(np.float32)
        pet_g[l, :n] = pet_dict[l]
        mri_g[l, :n] = mri_dict[l]
        pet_m[l, :n] = mri_m[l, :n] = True

    tv, gw, fot_res = coupling_pipeline(
        jnp.asarray(pet_g), jnp.asarray(mri_g),
        jnp.asarray(pet_m), jnp.asarray(mri_m),
        epsilon=0.01, gw_max_iterations=300,
        fot_epsilon=0.01,
    )

    ts_dict = {
        l: np.asarray(
            entropic_gw(pet_dict[l], mri_dict[l], epsilon=0.01,
                        max_iterations=300).coupling)
        for l in (0, 1)
    }
    tv_ref, _ = get_coupling_fot((pet_dict, mri_dict), ts_dict, eps=0.01)
    np.testing.assert_allclose(np.asarray(tv), tv_ref, atol=2e-4)


def test_coupling_service_end_to_end(rng):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    mri, pet, labels = _data(rng, b=6)
    labels = jnp.asarray([0, 1, 0, 1, 1, 0])
    d = feature_dim(10)
    tv0 = jnp.full((d, d), 1.0 / (d * d))
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=tv0)
    svc = CouplingService(
        make_feature_extract_step(model), n_labels=2,
        max_samples_per_label=4, gw_max_iterations=50,
    )
    tv = svc.compute(state, [(mri, pet, labels)])
    assert tv.shape == (d, d)
    assert np.isfinite(np.asarray(tv)).all()
    assert svc.last_log["fot_iters"] >= 1


def test_cosine_loss_bounds(rng):
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    assert float(cosine_alignment_loss(x, x)) < 1e-5
    assert float(cosine_alignment_loss(x, -x)) > 1.99
    zeros = jnp.zeros((5, 8))
    assert np.isfinite(float(cosine_alignment_loss(x, zeros)))

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
