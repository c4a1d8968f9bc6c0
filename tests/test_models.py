"""Model zoo shape/behaviour tests (tiny volumes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.models import (
    MultimodalOTFusion,
    ResNet3DBackbone,
    ResNet3DClassifier,
    SelfAttentionBlock,
)
from otfusion_tpu.models.resnet3d import DEPTH_CONFIGS, feature_dim


@pytest.mark.parametrize("depth", [10, 18, 50])
def test_backbone_feature_dim(depth):
    model = ResNet3DBackbone(depth=depth)
    x = jnp.zeros((2, 8, 16, 16, 1))
    vars_ = model.init(jax.random.key(0), x, train=False)
    feats = model.apply(vars_, x, train=False)
    assert feats.shape == (2, feature_dim(depth))


def test_classifier_logits():
    model = ResNet3DClassifier(depth=10, num_classes=2)
    x = jnp.ones((3, 8, 16, 16, 1))
    vars_ = model.init(jax.random.key(0), x, train=False)
    logits, feats = model.apply(vars_, x, train=False)
    assert logits.shape == (3, 2)
    assert feats.shape == (3, 512)


def test_batchnorm_stats_update():
    model = ResNet3DBackbone(depth=10)
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8, 1))
    vars_ = model.init(jax.random.key(0), x, train=False)
    _, mutated = model.apply(
        vars_, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_attention_block_shape_and_dropout_determinism():
    block = SelfAttentionBlock(embed_dim=32, num_heads=4, ff_dim=32)
    tokens = jax.random.normal(jax.random.key(0), (2, 3, 32))
    vars_ = block.init(jax.random.key(1), tokens, train=False)
    out1 = block.apply(vars_, tokens, train=False)
    out2 = block.apply(vars_, tokens, train=False)
    assert out1.shape == (2, 3, 32)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    # train mode with dropout rng differs from eval
    out3 = block.apply(vars_, tokens, train=True,
                       rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def _tiny_fusion(variant):
    model = MultimodalOTFusion(num_classes=2, depth=10, variant=variant)
    mri = jnp.ones((2, 8, 8, 8, 1))
    pet = jnp.ones((2, 8, 8, 8, 1))
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / (d * d))
    t = tv if variant == "per_epoch_attn" else None
    vars_ = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        mri, pet, t_feature=t, train=False,
    )
    return model, vars_, mri, pet, tv


@pytest.mark.parametrize("variant", ["per_epoch_attn", "base", "mmfusion"])
def test_fusion_forward(variant):
    model, vars_, mri, pet, tv = _tiny_fusion(variant)
    t = tv if variant != "mmfusion" else None
    out = model.apply(vars_, mri, pet, t_feature=t, train=False)
    assert out["logits"].shape == (2, 2)
    assert out["mri_fused"].shape == (2, 512)
    if variant == "per_epoch_attn":
        assert out["ot_mri_from_pet"].shape == (2, 512)
    if variant == "mmfusion":
        assert out["ot_mri_from_pet"] is None


def test_per_epoch_attn_requires_coupling():
    model, vars_, mri, pet, _ = _tiny_fusion("per_epoch_attn")
    with pytest.raises(ValueError, match="t_feature"):
        model.apply(vars_, mri, pet, t_feature=None, train=False)


def test_depth_configs_cover_reference_table():
    # 3D_resnet.py:413-437 depth table parity
    assert set(DEPTH_CONFIGS) == {10, 18, 34, 50, 101, 152, 200}
    assert DEPTH_CONFIGS[101][0] == (3, 4, 23, 3)
    assert DEPTH_CONFIGS[152][0] == (3, 8, 36, 3)
    assert DEPTH_CONFIGS[200][0] == (3, 24, 36, 3)
    assert feature_dim(101) == 2048

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
