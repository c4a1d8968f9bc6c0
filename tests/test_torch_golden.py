"""Golden forward-equivalence of the zoo ``.pth`` import against the
reference's OWN torch modules (VERDICT r4 next-step 2).

`tests/test_torch_import_zoo.py` verifies the converters against
synthetic state dicts and NumPy re-derivations written by the same
author; these tests close the self-verification loop by instantiating
the reference's actual torch model classes (importable from
/root/reference/Models with the CPU torch in this image), running their
eval-mode forward, converting their ``state_dict()`` with
``backbone_tree_from_torch``-family converters, and asserting the flax
forward matches numerically. A wrong-but-shape-compatible convention
(relative-position index, shift-mask geometry, Res2Net split order,
MedicalNet dilation/shortcut) fails these, not just the layout asserts.

Per family:
  * Swin (Models/swin_transformer.py:64-165): full model at a reduced
    dim but SHIFT-EXERCISING geometry (stage-0 resolution > window), and
    one run at the fundus 384/window-12 geometry. The module needs
    ``timm.models.layers`` (absent from this image) only for DropPath /
    to_2tuple / trunc_normal_ — none of which are converted weights —
    so a 3-symbol stub is injected (DropPath is never instantiated at
    drop_path_rate=0; trunc_normal_ only randomises the init we convert).
  * MedicalNet (Models/resnet.py:26-37,139-143): resnet10 shortcut 'A'
    (zero-pad, needs a behaviour-preserving ``.cuda()``->self patch on
    CPU: resnet.py:35 calls it unconditionally) and resnet50 shortcut
    'B', compared at the hw-pool trunk feature.
  * Res2Net (Models/res2net.py:16-93,155-223): v1b deep stem +
    Bottle2neck stages incl. stype='stage' pooled branch AND a
    stype='normal' second block, compared at the pre-fc pooled feature.
  * UNETR: the reference class wraps ``monai.networks.nets.ViT`` and
    monai is NOT in this image, so no golden oracle exists here; the
    fused-qkv conversion keeps its NumPy-semantics test in
    test_torch_import_zoo.py (documented scope limit).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from otfusion_tpu.utils.torch_import import (  # noqa: E402
    _graft,
    medicalnet_tree_from_torch,
    res2net_tree_from_torch,
    swin_tree_from_torch,
)

REF_MODELS = "/root/reference/Models"


def _load_ref(name):
    """Import a reference torch module by filename (no package needed)."""
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"{REF_MODELS}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _stub_timm():
    """Minimal timm.models.layers for swin_transformer.py's import line.

    Only three symbols are touched: DropPath (never instantiated — the
    tests build with drop_path_rate=0, so the reference picks
    nn.Identity), to_2tuple, and trunc_normal_ (init-time randomiser;
    the resulting values are what we convert, so any filler works)."""
    if "timm.models.layers" in sys.modules:
        return
    import torch.nn as nn

    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Identity):
        def __init__(self, drop_prob=0.0):
            super().__init__()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0.0, std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _sd_numpy(model):
    return {k: v.detach().numpy().copy()
            for k, v in model.state_dict().items()}


def _graft_all(variables, converted_params, converted_stats=None):
    """Graft converted trees into initialised flax variables; assert
    every torch-side tensor lands (nothing silently skipped)."""
    dst_p = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    loaded, skipped = [], []
    _graft(dst_p, converted_params, (), loaded, skipped)
    out = {"params": dst_p}
    if "batch_stats" in variables:
        dst_s = jax.tree_util.tree_map(np.asarray,
                                       dict(variables["batch_stats"]))
        if converted_stats:
            _graft(dst_s, converted_stats, (), loaded, skipped)
        out["batch_stats"] = dst_s
    assert skipped == [], skipped
    assert loaded
    return out


# --- Swin --------------------------------------------------------------------


def _swin_golden(img, window, embed=8, depths=(2, 2), heads=(2, 4),
                 rtol=2e-4, atol=2e-4):
    from otfusion_tpu.models.swin import SwinTransformer2D

    _stub_timm()
    ref = _load_ref("swin_transformer")
    tm = ref.SwinTransformer(
        img_size=img, patch_size=4, in_chans=3, num_classes=3,
        embed_dim=embed, depths=list(depths), num_heads=list(heads),
        window_size=window, drop_path_rate=0.0, ape=False,
        patch_norm=True)
    tm.eval()

    g = torch.Generator().manual_seed(0)
    xt = torch.randn(2, 3, img, img, generator=g)
    with torch.no_grad():
        x_embed, pooled_t = tm.forward_features(xt)
        tokens_t = tm.norm(x_embed)

    params, stats = swin_tree_from_torch(_sd_numpy(tm))
    assert stats == {}

    fm = SwinTransformer2D(embed_dim=embed, depths=depths, heads=heads,
                           window=window, drop_path_rate=0.0, remat=False)
    xj = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))
    v = fm.init({"params": jax.random.key(0),
                 "dropout": jax.random.key(1)}, xj)
    v = _graft_all(v, params)
    tokens_j, pooled_j = fm.apply(v, xj)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t.numpy(),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(tokens_j), tokens_t.numpy(),
                               rtol=rtol, atol=atol)


@pytest.mark.fast
def test_swin_golden_shifted_windows():
    """32x32 input, window 4: stage-0 runs 8x8 feature maps — block 1
    applies the cyclic shift + additive mask; stage-1 (4x4) clamps the
    window and disables shift. A wrong relative_position_index or shift
    mask convention diverges here."""
    _swin_golden(img=32, window=4)


def test_swin_golden_fundus_384_window12_geometry():
    """The reference's fixed fundus geometry (384 input, patch 4, window
    12 — fundus_swin_network.py:13-77) at reduced width: stage-0 is
    96x96 / 64 windows of 144 tokens with shift 6, the exact (2*12-1)^2
    bias-table indexing the pretrained checkpoint uses."""
    _swin_golden(img=384, window=12)


# --- MedicalNet --------------------------------------------------------------


@pytest.fixture()
def _cpu_cuda_noop(monkeypatch):
    """resnet.py:35 calls .cuda() unconditionally inside the shortcut-A
    zero-pad; on CPU torch the call raises. Patching it to a no-op is
    behaviour-preserving (it is a device move only)."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)


def _medicalnet_trunk_torch(tm, xt):
    """Reference trunk forward (Models/resnet.py:205-214 through layer4)
    + the hw-pool quirk (AdaptiveAvgPool2d(1) on a 5-D tensor pools H/W
    and keeps depth), re-ordered to the flax (B, D', C) flatten."""
    with torch.no_grad():
        x = tm.relu(tm.bn1(tm.conv1(xt)))
        x = tm.maxpool(x)
        for layer in (tm.layer1, tm.layer2, tm.layer3, tm.layer4):
            x = layer(x)
        x = x.numpy()  # (B, C, D', H', W')
    x = x.transpose(0, 2, 3, 4, 1)  # -> (B, D', H', W', C)
    return x.mean(axis=(2, 3)).reshape(x.shape[0], -1)


@pytest.mark.fast
@pytest.mark.parametrize("depth,shortcut", [(10, "A"), (50, "B")])
def test_medicalnet_golden(depth, shortcut, _cpu_cuda_noop):
    """resnet10 shortcut 'A' (parameter-free zero-pad + stride avg-pool)
    and resnet50 shortcut 'B' (conv downsample), both with the dilated
    layer3/4 trunk (stride 1, dilation 2/4 — resnet.py:139-143)."""
    from otfusion_tpu.models.medicalnet import MedicalNetResNet

    ref = _load_ref("resnet")
    ctor = getattr(ref, f"resnet{depth}")
    tm = ctor(sample_input_D=8, sample_input_H=16, sample_input_W=16,
              num_seg_classes=2, shortcut_type=shortcut, no_cuda=True)
    tm.eval()

    g = torch.Generator().manual_seed(1)
    xt = torch.randn(2, 1, 16, 16, 16, generator=g)
    want = _medicalnet_trunk_torch(tm, xt)

    params, stats = medicalnet_tree_from_torch(_sd_numpy(tm), depth=depth)
    fm = MedicalNetResNet(depth=depth, shortcut_type=shortcut, pool="hw")
    xj = jnp.asarray(xt.numpy().transpose(0, 2, 3, 4, 1))
    v = fm.init(jax.random.key(0), xj)
    v = _graft_all(v, params, stats)
    got = np.asarray(fm.apply(v, xj, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# --- Res2Net -----------------------------------------------------------------


@pytest.mark.fast
def test_res2net_golden():
    """Reference Res2Net-v1b (deep stem, AvgPool downsample,
    Bottle2neck with stype='stage' pooled tail + a second 'normal' block
    whose scales accumulate hierarchically — res2net.py:59-92) vs the
    flax Res2Net at the pre-fc pooled feature."""
    from otfusion_tpu.models.res2net import Res2Net

    ref = _load_ref("res2net")
    layers = (2, 1, 1, 1)
    tm = ref.Res2Net(ref.Bottle2neck, list(layers), baseWidth=26,
                     scale=4, num_classes=5)
    tm.eval()

    g = torch.Generator().manual_seed(2)
    xt = torch.randn(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        x = tm.maxpool(tm.relu(tm.bn1(tm.conv1(xt))))
        for layer in (tm.layer1, tm.layer2, tm.layer3, tm.layer4):
            x = layer(x)
        want = tm.avgpool(x).flatten(1).numpy()

    params, stats = res2net_tree_from_torch(_sd_numpy(tm), layers=layers)
    fm = Res2Net(layers=layers)
    xj = jnp.asarray(xt.numpy().transpose(0, 2, 3, 1))
    v = fm.init(jax.random.key(0), xj)
    v = _graft_all(v, params, stats)
    got = np.asarray(fm.apply(v, xj, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
