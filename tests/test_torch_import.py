"""Reference .pth weight ingestion (VERDICT round-1 missing #1).

Builds a torch state dict with the reference backbone's exact naming
scheme (ResNet3D_Backbone, MRI_PET_OT_OT_per_epoch_attn.py:483-545),
saves it with torch.save, and grafts it into the Flax fusion state via
the --mri-pretrained path — verifying layout conversion, partial-load
semantics, and that the weights actually land."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from otfusion_tpu.models import MultimodalOTFusion  # noqa: E402
from otfusion_tpu.models.resnet3d import feature_dim  # noqa: E402
from otfusion_tpu.train import create_train_state  # noqa: E402
from otfusion_tpu.utils.checkpoint import restore_backbone  # noqa: E402
from otfusion_tpu.utils.torch_import import (  # noqa: E402
    load_torch_state_dict,
    resnet3d_tree_from_torch,
)


def _depth10_backbone_state_dict(rng, scheme="stem"):
    """Reference-named torch tensors for the depth-10 basic-block
    backbone: stem (or conv1/bn1), layer{1-4}.0.conv{1,2}/bn{1,2},
    downsamples on layers 2-4."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = torch.tensor(
            rng.normal(size=(o, i, *k)).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = torch.tensor(np.ones(c, np.float32))
        sd[name + ".bias"] = torch.tensor(np.zeros(c, np.float32))
        sd[name + ".running_mean"] = torch.tensor(
            rng.normal(size=c).astype(np.float32))
        sd[name + ".running_var"] = torch.tensor(
            np.abs(rng.normal(size=c)).astype(np.float32) + 0.5)

    if scheme == "stem":
        conv("stem.0", 64, 1, (3, 7, 7))
        bn("stem.1", 64)
    else:
        conv("conv1", 64, 1, (3, 7, 7))
        bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_w = 64
    for stage, w in enumerate(widths):
        t = f"layer{stage + 1}.0"
        conv(t + ".conv1", w, in_w, (3, 3, 3))
        bn(t + ".bn1", w)
        conv(t + ".conv2", w, w, (3, 3, 3))
        bn(t + ".bn2", w)
        if stage > 0:  # stride-2 stages carry a projection shortcut
            conv(t + ".downsample.0", w, in_w, (1, 1, 1))
            bn(t + ".downsample.1", w)
        in_w = w
    return sd


def _fusion_state(rng):
    model = MultimodalOTFusion(num_classes=2, depth=10,
                               variant="per_epoch_attn")
    mri = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 1)), jnp.float32)
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    state = create_train_state(model, jax.random.key(0), (mri, mri), 1e-3,
                               t_feature=tv)
    return model, state, mri, tv


def test_pth_graft_into_fusion_backbone(tmp_path, rng):
    sd = _depth10_backbone_state_dict(rng)
    pth = tmp_path / "mri_backbone.pth"
    # the reference saves best checkpoints as a dict wrapper
    # (MRI_PET_OT.py:1115-1129) with DataParallel's module. prefix
    torch.save({"epoch": 3, "model_state_dict": {
        "module." + k: v for k, v in sd.items()}}, pth)

    model, state, mri, tv = _fusion_state(rng)
    before = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        mri, mri, t_feature=tv, train=False)["logits"]

    state2 = restore_backbone(state, pth, "mri_backbone", depth=10)

    # conv layout: torch (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)
    got = np.asarray(
        state2.params["mri_backbone"]["_ConvBN_0"]["Conv_0"]["kernel"])
    want = np.transpose(sd["stem.0.weight"].numpy(), (2, 3, 4, 1, 0))
    np.testing.assert_array_equal(got, want)
    # BN running stats land in batch_stats
    got_mean = np.asarray(
        state2.batch_stats["mri_backbone"]["_ConvBN_0"]["BatchNorm_0"]
        ["mean"])
    np.testing.assert_array_equal(got_mean,
                                  sd["stem.1.running_mean"].numpy())
    # downsample maps to the trailing _ConvBN of the block
    got_ds = np.asarray(
        state2.params["mri_backbone"]["BasicBlock3D_1"]["_ConvBN_2"]
        ["Conv_0"]["kernel"])
    want_ds = np.transpose(sd["layer2.0.downsample.0.weight"].numpy(),
                           (2, 3, 4, 1, 0))
    np.testing.assert_array_equal(got_ds, want_ds)

    # the graft changes the forward; the PET backbone stays untouched
    after = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        mri, mri, t_feature=tv, train=False)["logits"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    np.testing.assert_array_equal(
        np.asarray(state.params["pet_backbone"]["_ConvBN_0"]["Conv_0"]
                   ["kernel"]),
        np.asarray(state2.params["pet_backbone"]["_ConvBN_0"]["Conv_0"]
                   ["kernel"]))


def test_pth_partial_load_skips_mismatches(tmp_path, rng):
    """Intersect-keys semantics (generate_model.py:112-125): unknown and
    shape-mismatched tensors are skipped, the rest load."""
    sd = _depth10_backbone_state_dict(rng, scheme="conv1")
    sd["fc.weight"] = torch.tensor(np.zeros((2, 512), np.float32))
    sd["fc.bias"] = torch.tensor(np.zeros(2, np.float32))
    sd["layer1.0.conv1.weight"] = torch.tensor(
        np.zeros((64, 3, 3, 3, 3), np.float32))  # wrong in-channels
    pth = tmp_path / "cls.pth"
    torch.save(sd, pth)

    model, state, mri, tv = _fusion_state(rng)
    state2 = restore_backbone(state, pth, "pet_backbone", depth=10)
    # stem loaded under the classifier naming scheme too
    got = np.asarray(
        state2.params["pet_backbone"]["_ConvBN_0"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        got, np.transpose(sd["conv1.weight"].numpy(), (2, 3, 4, 1, 0)))
    # the mismatched conv kept its original initialisation
    orig = np.asarray(
        state.params["pet_backbone"]["BasicBlock3D_0"]["_ConvBN_0"]
        ["Conv_0"]["kernel"])
    kept = np.asarray(
        state2.params["pet_backbone"]["BasicBlock3D_0"]["_ConvBN_0"]
        ["Conv_0"]["kernel"])
    np.testing.assert_array_equal(orig, kept)


def test_pth_requires_depth(tmp_path, rng):
    sd = _depth10_backbone_state_dict(rng)
    pth = tmp_path / "b.pth"
    torch.save(sd, pth)
    _, state, _, _ = _fusion_state(rng)
    with pytest.raises(ValueError, match="depth"):
        restore_backbone(state, pth, "mri_backbone")


def test_load_torch_state_dict_unwraps(tmp_path, rng):
    sd = {"stem.0.weight": torch.tensor(
        rng.normal(size=(64, 1, 3, 7, 7)).astype(np.float32))}
    pth = tmp_path / "w.pth"
    torch.save({"state_dict": sd}, pth)
    out = load_torch_state_dict(pth)
    assert list(out) == ["stem.0.weight"]
    assert out["stem.0.weight"].dtype == np.float32
    p, s = resnet3d_tree_from_torch(out, depth=10)
    assert "Conv_0" in p["_ConvBN_0"] and not s


def test_pth_graft_into_s2d_stem_backbone(tmp_path, rng):
    """.pth import parity survives the space-to-depth stem (VERDICT
    round-2 next-step 2): grafting the same torch weights into a plain
    and an s2d model yields the same logits."""
    from otfusion_tpu.models.resnet3d import s2d_stem_kernel

    sd = _depth10_backbone_state_dict(rng)
    pth = tmp_path / "mri_backbone.pth"
    torch.save(sd, pth)

    x = jnp.asarray(rng.normal(size=(2, 6, 16, 16, 1)), jnp.float32)
    d = feature_dim(10)
    tv = jnp.full((d, d), 1.0 / d**2, jnp.float32)
    logits = {}
    for s2d in (False, True):
        model = MultimodalOTFusion(num_classes=2, depth=10,
                                   variant="per_epoch_attn", s2d_stem=s2d)
        state = create_train_state(model, jax.random.key(0), (x, x), 1e-3,
                                   t_feature=tv)
        state = restore_backbone(state, pth, "mri_backbone", depth=10)
        state = restore_backbone(state, pth, "pet_backbone", depth=10)
        # stem kernel landed in the right layout
        got = np.asarray(
            state.params["mri_backbone"]["_ConvBN_0"]["Conv_0"]["kernel"])
        want = np.transpose(sd["stem.0.weight"].numpy(), (2, 3, 4, 1, 0))
        if s2d:
            want = s2d_stem_kernel(want)
        np.testing.assert_array_equal(got, want)
        logits[s2d] = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, x, t_feature=tv, train=False)["logits"])
    np.testing.assert_allclose(logits[False], logits[True], rtol=1e-3,
                               atol=1e-4)
