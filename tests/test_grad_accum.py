"""Gradient accumulation (``grad_accum=N`` on the step factories).

Contract (see make_fusion_train_step's docstring): N sequential
microbatches inside one jitted step — microbatch i takes the strided
rows ``i::N`` (so each microbatch stays evenly spread over a DP-sharded
batch axis), gradients averaged into a single optimiser update,
BatchNorm statistics updated sequentially, one dropout fold per
microbatch, partial batches falling back to the plain path. The
equivalence oracle below replays exactly that recipe by hand with the
public model/loss pieces (a TPU-native capability; the reference
trainers have no accumulation path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.models import MultimodalOTFusion, ResNet3DClassifier
from otfusion_tpu.train import (
    create_train_state,
    make_fusion_train_step,
    make_unimodal_train_step,
)
from otfusion_tpu.train.losses import cross_entropy
from otfusion_tpu.train.steps import _apply


def _unimodal_fixture(rng, b=4, s=8):
    model = ResNet3DClassifier(depth=10, num_classes=2)
    vol = jnp.asarray(rng.normal(size=(b, s, s, s, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=b))
    state = create_train_state(model, jax.random.key(0), (vol,), 1e-3,
                               optimizer="adam")
    return model, state, vol, labels


def _manual_accum(model, state, vol, labels, rng_key, k):
    """The documented recipe, replayed by hand."""
    def grad_fn(params, stats, v, l, key):
        def loss(p):
            (logits, _), new_stats = _apply(
                model, p, stats, v, train=True, rng=key)
            return cross_entropy(logits, l), new_stats

        return jax.grad(loss, has_aux=True)(params)

    stats = state.batch_stats
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    for i in range(k):
        g, stats = grad_fn(
            state.params, stats, vol[i::k], labels[i::k],
            jax.random.fold_in(rng_key, i))
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
    grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
    return state.apply_gradients(grads=grads).replace(batch_stats=stats)


def _tree_allclose(a, b, atol, rtol=0.0, leaf_scaled=False):
    """``leaf_scaled`` additionally scales atol by each leaf's magnitude:
    gradient leaves here span |g| ~ 1e-3..1e2, so a fixed elementwise
    atol is the wrong norm for near-zero elements of large-scale
    leaves."""
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(1.0, float(np.max(np.abs(y)))) if leaf_scaled else 1.0
        np.testing.assert_allclose(x, y, atol=atol * scale, rtol=rtol)


def test_unimodal_grad_accum_matches_manual_recipe(rng):
    model, state, vol, labels = _unimodal_fixture(rng)
    key = jax.random.key(7)
    step = make_unimodal_train_step(model, donate=False, grad_accum=2)
    new_state, metrics = step(state, vol, labels, key)
    expected = _manual_accum(model, state, vol, labels, key, k=2)
    # Adam's first/second moments after one step are linear/quadratic
    # images of the averaged gradient — a gradient-equivalence check.
    # rtol 0.1: at random init the small-batch BN forward yields |g|~1e2
    # and the scan body compiles to different conv algorithms than the
    # unrolled oracle, so f32 noise amplified through 1/sigma was
    # MEASURED up to ~4e-2 relative on this ill-conditioned fixture;
    # every semantic bug this test exists for (missing /k, wrong
    # microbatch slicing, wrong BN threading, wrong rng fold) is O(1)
    # relative. Params themselves can differ by ~2*lr on coordinates
    # whose gradient is ~0 (the noise flips the sign of
    # g/(sqrt(v)+eps)), so they only get a loose absolute bound.
    _tree_allclose(new_state.opt_state, expected.opt_state,
                   atol=5e-3, rtol=0.1, leaf_scaled=True)
    _tree_allclose(new_state.params, expected.params, atol=3e-3)
    _tree_allclose(new_state.batch_stats, expected.batch_stats, atol=1e-5)
    assert np.isfinite(float(metrics["loss"]))
    assert 0 <= int(metrics["correct"]) <= vol.shape[0]


def test_partial_batch_falls_back_to_plain_path(rng):
    model, state, vol, labels = _unimodal_fixture(rng, b=3)
    key = jax.random.key(7)
    accum = make_unimodal_train_step(model, donate=False, grad_accum=2)
    plain = make_unimodal_train_step(model, donate=False)
    s_a, m_a = accum(state, vol, labels, key)
    s_p, m_p = plain(state, vol, labels, key)
    # 3 % 2 != 0 -> identical trace, bitwise-equal results
    _tree_allclose(s_a.params, s_p.params, atol=0)
    assert float(m_a["loss"]) == float(m_p["loss"])


@pytest.mark.parametrize("variant", ["per_epoch_attn", "base", "mmfusion"])
def test_fusion_grad_accum_runs_all_variants(rng, variant):
    model = MultimodalOTFusion(num_classes=2, depth=10, variant=variant)
    mri = jnp.asarray(rng.normal(size=(4, 8, 8, 8, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(4, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=4))
    from otfusion_tpu.models.resnet3d import feature_dim

    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / (d * d), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0), (mri, pet), 1e-3, optimizer="adamw",
        t_feature=tv if variant == "per_epoch_attn" else None,
    )
    step = make_fusion_train_step(
        model, donate=False, grad_accum=2,
        in_batch_fot=(variant == "base"),
        # keep the in-batch FOT cheap for the test
        fot_max_iterations=50, fot_threshold=1e-2,
    )
    new_state, metrics = step(state, mri, pet, labels, tv,
                              jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["ot_loss"]))
    assert 0 <= int(metrics["correct"]) <= 4
    # BN stats moved (sequential microbatch updates happened)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_dp_fusion_grad_accum_over_mesh(rng):
    """grad_accum composes with the DP mesh wrapping (8 virtual devices):
    same manual-recipe semantics, batch sharded over the data axis."""
    from otfusion_tpu.parallel import (
        make_dp_fusion_steps,
        make_mesh,
        place_state,
    )

    mesh = make_mesh()
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="mmfusion")
    mri = jnp.asarray(rng.normal(size=(8, 8, 8, 8, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(8, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=8))
    state = create_train_state(model, jax.random.key(0), (mri, pet),
                               1e-3, optimizer="adamw")
    single = make_fusion_train_step(model, donate=False, grad_accum=2)
    s_single, m_single = single(state, mri, pet, labels, None,
                                jax.random.key(1))

    dp_train, _, _ = make_dp_fusion_steps(model, mesh, grad_accum=2)
    state_dp = place_state(state, mesh)
    s_dp, m_dp = dp_train(state_dp, np.asarray(mri), np.asarray(pet),
                          np.asarray(labels), None, jax.random.key(1))
    np.testing.assert_allclose(float(m_dp["loss"]),
                               float(m_single["loss"]), rtol=1e-5)
    assert int(m_dp["correct"]) == int(m_single["correct"])
    # tight on the gradient image (Adam moments), loose on params
    # (see test_unimodal_grad_accum_matches_manual_recipe)
    _tree_allclose(s_dp.opt_state, s_single.opt_state,
                   atol=5e-3, rtol=0.1, leaf_scaled=True)
    _tree_allclose(s_dp.params, s_single.params, atol=3e-3)


def test_grad_accum_composes_with_remat(rng):
    """The effective-B16 production config is ``--grad-accum 2 --remat``
    (docs/perf_notes.md lever 3: remat shrinks the live microbatch
    activations enough that the accumulation scan's gradient-sized
    accumulator fits where the non-remat structure OOMs server-side).
    Rematerialisation recomputes the same values, so the accum step must
    produce the same training math with remat on.

    Two RNG-stream caveats shape the test: flax's lifted ``nn.remat``
    transform changes the init AND dropout key derivations inside the
    wrapped blocks (same param tree structure, different draws), so the
    state is created ONCE from the plain model and shared (the trainers'
    ``--resume`` does exactly this when toggling ``--remat``), and
    projection dropout is off so the comparison is value-equivalence,
    not dropout-mask equivalence."""
    model_kwargs = dict(num_classes=2, depth=10, variant="per_epoch_attn",
                        projection_dropout=0.0)
    mri = jnp.asarray(rng.normal(size=(4, 8, 8, 8, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(4, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=4))
    from otfusion_tpu.models.resnet3d import feature_dim

    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / (d * d), jnp.float32)
    state0 = create_train_state(
        MultimodalOTFusion(remat=False, **model_kwargs),
        jax.random.key(0), (mri, pet), 1e-3, optimizer="adamw",
        t_feature=tv)
    results = {}
    for remat in (False, True):
        model = MultimodalOTFusion(remat=remat, **model_kwargs)
        step = make_fusion_train_step(model, donate=False, grad_accum=2)
        new_state, metrics = step(state0, mri, pet, labels, tv,
                                  jax.random.key(1))
        results[remat] = (new_state, metrics)
    s_plain, m_plain = results[False]
    s_remat, m_remat = results[True]
    assert np.isfinite(float(m_remat["loss"]))
    # identical params + identical forward math -> loss matches to fp
    # noise; params after one update match loosely (remat reassociates
    # the backward reductions)
    np.testing.assert_allclose(float(m_remat["loss"]),
                               float(m_plain["loss"]), rtol=1e-5)
    _tree_allclose(s_remat.params, s_plain.params, atol=3e-3)
