"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.models import MultimodalOTFusion
from otfusion_tpu.models.resnet3d import feature_dim
from otfusion_tpu.parallel import (
    make_mesh,
    make_sharded_fusion_train_step,
    replicated,
    shard_batch,
)
from otfusion_tpu.train import create_train_state, make_fusion_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


def _problem(rng, b):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    d = feature_dim(10)
    mri = jnp.asarray(rng.normal(size=(b, 8, 8, 8, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(b, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, size=b))
    tv = jnp.full((d, d), 1.0 / (d * d), jnp.float32)
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=tv)
    return model, state, mri, pet, labels, tv


def test_sharded_step_runs_and_is_distributed(mesh, rng):
    model, state, mri, pet, labels, tv = _problem(rng, b=8)
    step, place = make_sharded_fusion_train_step(model, mesh)
    state_r = jax.device_put(state, replicated(mesh))
    mri_s, pet_s, lab_s = place(mri, pet, labels)
    assert len(mri_s.sharding.device_set) == 8
    new_state, metrics = step(
        state_r, mri_s, pet_s, lab_s,
        jax.device_put(tv, replicated(mesh)),
        jax.device_put(jax.random.key(1), replicated(mesh)),
    )
    assert np.isfinite(float(metrics["loss"]))
    # updated params stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_matches_single_device(mesh, rng):
    """DP across 8 devices == single-device step on the same batch."""
    model, state, mri, pet, labels, tv = _problem(rng, b=8)

    single = make_fusion_train_step(model, donate=False)
    s1, m1 = single(state, mri, pet, labels, tv, jax.random.key(1))

    step, place = make_sharded_fusion_train_step(model, mesh)
    state_r = jax.device_put(state, replicated(mesh))
    mri_s, pet_s, lab_s = place(mri, pet, labels)
    s8, m8 = step(state_r, mri_s, pet_s, lab_s,
                  jax.device_put(tv, replicated(mesh)),
                  jax.device_put(jax.random.key(1), replicated(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    l1 = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(s1.params)])
    l8 = np.concatenate([np.ravel(np.asarray(x)) for x in
                         jax.tree_util.tree_leaves(s8.params)])
    # Cross-device reduction order perturbs near-zero gradients, and
    # Adam's first step rescales any nonzero gradient to ~lr — so a tiny
    # fraction of entries may differ by up to ~lr. Bound both.
    diff = np.abs(l1 - l8)
    assert diff.max() <= 2.5e-3  # ~2.5x lr
    assert (diff > 1e-5).mean() < 1e-4


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    logits = jax.jit(fn)(*args)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()
