"""2-D (data x model) mesh: DP+TP fusion train step on the virtual CPU
mesh, numerics vs single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.models import MultimodalOTFusion
from otfusion_tpu.models.resnet3d import feature_dim
from otfusion_tpu.parallel import (
    fusion_param_sharding,
    make_2d_mesh,
    make_dp_tp_fusion_train_step,
)
from otfusion_tpu.parallel.mesh import MODEL_AXIS
from otfusion_tpu.train import create_train_state, make_fusion_train_step


def test_param_sharding_rules(rng):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    mri = jnp.zeros((2, 8, 8, 8, 1))
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2)
    state = create_train_state(model, jax.random.key(0), (mri, mri), 1e-3,
                               t_feature=tv)
    mesh = make_2d_mesh(2, 4)
    shardings = fusion_param_sharding(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    model_sharded = [
        "/".join(str(getattr(p, "key", "")) for p in path)
        for path, s in flat if MODEL_AXIS in str(s.spec)
    ]
    # the fusion-trunk Dense kernels are model-sharded...
    assert any("mri2pet" in p for p in model_sharded)
    assert any("attention_mri" in p for p in model_sharded)
    # ...while conv kernels are not
    assert not any("Conv" in p for p in model_sharded)


def test_dp_tp_matches_single_device(rng):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    b = 2
    mri = jnp.asarray(rng.normal(size=(b, 8, 8, 8, 1)), jnp.float32)
    pet = jnp.asarray(rng.normal(size=(b, 8, 8, 8, 1)), jnp.float32)
    labels = jnp.asarray([0, 1])
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    state = create_train_state(model, jax.random.key(0), (mri, pet), 1e-3,
                               t_feature=tv)

    single = make_fusion_train_step(model, donate=False)
    s1, m1 = single(state, mri, pet, labels, tv, jax.random.key(1))

    mesh = make_2d_mesh(2, 4)
    step, place_state, place_batch = make_dp_tp_fusion_train_step(model,
                                                                  mesh)
    state_p = place_state(state)
    mri_s, pet_s, lab_s = place_batch(mri, pet, labels)
    s2, m2 = step(state_p, mri_s, pet_s, lab_s, tv, jax.random.key(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4)
    # a model-sharded kernel stays sharded after the update
    k = s2.params["mri2pet"]["Dense_0"]["kernel"]
    assert MODEL_AXIS in str(k.sharding.spec)
    flat1 = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(s1.params)])
    flat2 = np.concatenate([np.ravel(np.asarray(x)) for x in
                            jax.tree_util.tree_leaves(s2.params)])
    diff = np.abs(flat1 - flat2)
    assert diff.max() <= 2.5e-3
    # DP + TP both reorder reductions; Adam step-1 rescales any perturbed
    # near-zero gradient to ~lr, so a slightly larger fraction moves than
    # in the DP-only test.
    assert (diff > 1e-5).mean() < 5e-3
