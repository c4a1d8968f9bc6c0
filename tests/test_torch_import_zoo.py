"""Zoo-wide torch ``.pth`` pretrained import (VERDICT r3 missing #1).

The reference loads pretrained weights for every zoo family (Swin-384:
fundus_swin_network.py:59-75, MedicalNet: generate_model.py:112-125,
Res2Net: res2net.py:233-234, UNETR ViT: unetr.py:52-70). Each test
builds a synthetic torch state dict with that family's exact official
naming scheme, converts it, and asserts (a) the tensors land in the
right Flax tree slots with the right transposes, and (b) for the two
genuinely subtle conversions — Swin's PatchMerging quadrant order and
MONAI's fused qkv — functional equivalence against a NumPy
implementation of the torch semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from otfusion_tpu.utils.torch_import import (  # noqa: E402
    backbone_tree_from_torch,
    medicalnet_tree_from_torch,
    res2net_tree_from_torch,
    swin_tree_from_torch,
    unetr_vit_tree_from_torch,
)


def _t(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def _bn_entries(sd, name, c, rng):
    sd[name + ".weight"] = _t(rng, c)
    sd[name + ".bias"] = _t(rng, c)
    sd[name + ".running_mean"] = _t(rng, c)
    sd[name + ".running_var"] = np.abs(_t(rng, c)) + 0.5


def _ln_entries(sd, name, c, rng):
    sd[name + ".weight"] = _t(rng, c)
    sd[name + ".bias"] = _t(rng, c)


# --- Swin --------------------------------------------------------------------


def _tiny_swin_sd(rng, embed=8, depths=(2, 2), heads=(2, 4), window=4):
    sd = {}
    sd["patch_embed.proj.weight"] = _t(rng, embed, 3, 4, 4)
    sd["patch_embed.proj.bias"] = _t(rng, embed)
    _ln_entries(sd, "patch_embed.norm", embed, rng)
    for s, depth in enumerate(depths):
        dim = embed * 2 ** s
        for b in range(depth):
            t = f"layers.{s}.blocks.{b}"
            _ln_entries(sd, t + ".norm1", dim, rng)
            sd[t + ".attn.qkv.weight"] = _t(rng, 3 * dim, dim)
            sd[t + ".attn.qkv.bias"] = _t(rng, 3 * dim)
            sd[t + ".attn.relative_position_bias_table"] = _t(
                rng, (2 * window - 1) ** 2, heads[s])
            sd[t + ".attn.relative_position_index"] = np.zeros(
                (window * window, window * window), np.int64)  # buffer
            sd[t + ".attn.proj.weight"] = _t(rng, dim, dim)
            sd[t + ".attn.proj.bias"] = _t(rng, dim)
            _ln_entries(sd, t + ".norm2", dim, rng)
            sd[t + ".mlp.fc1.weight"] = _t(rng, 4 * dim, dim)
            sd[t + ".mlp.fc1.bias"] = _t(rng, 4 * dim)
            sd[t + ".mlp.fc2.weight"] = _t(rng, dim, 4 * dim)
            sd[t + ".mlp.fc2.bias"] = _t(rng, dim)
        if s < len(depths) - 1:
            t = f"layers.{s}.downsample"
            _ln_entries(sd, t + ".norm", 4 * dim, rng)
            sd[t + ".reduction.weight"] = _t(rng, 2 * dim, 4 * dim)
    _ln_entries(sd, "norm", embed * 2 ** (len(depths) - 1), rng)
    sd["head.weight"] = _t(rng, 1000, embed * 2 ** (len(depths) - 1))
    sd["head.bias"] = _t(rng, 1000)
    return sd


def test_swin_layout_conversion(rng):
    sd = _tiny_swin_sd(rng)
    params, stats = swin_tree_from_torch(sd)
    assert stats == {}
    # depths inferred from the keys
    assert "stage1_block1" in params and "stage2_block0" not in params
    # conv embed transposed OIHW -> HWIO
    np.testing.assert_array_equal(
        params["patch_embed"]["kernel"],
        np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)))
    # qkv/proj Linear transposed
    blk = params["stage0_block1"]["WindowAttention_0"]
    np.testing.assert_array_equal(
        blk["qkv"]["kernel"],
        sd["layers.0.blocks.1.attn.qkv.weight"].T)
    np.testing.assert_array_equal(
        blk["qkv"]["bias"], sd["layers.0.blocks.1.attn.qkv.bias"])
    np.testing.assert_array_equal(
        blk["relative_position_bias_table"],
        sd["layers.0.blocks.1.attn.relative_position_bias_table"])
    # head + buffers dropped
    flat = jax.tree_util.tree_leaves(params)
    assert not any(a.shape == (1000,) for a in flat)
    # final norm + mlp land
    np.testing.assert_array_equal(params["norm"]["scale"],
                                  sd["norm.weight"])
    np.testing.assert_array_equal(
        params["stage1_block0"]["Dense_0"]["kernel"],
        sd["layers.1.blocks.0.mlp.fc1.weight"].T)


def test_swin_patch_merging_equivalence(rng):
    """The quadrant permutation: official PatchMerging concatenates
    [(0,0),(1,0),(0,1),(1,1)] while the flax reshape yields
    [(0,0),(0,1),(1,0),(1,1)] — the converted reduction kernel + norm
    must make the two forwards EQUAL, not just shape-compatible."""
    from otfusion_tpu.models.swin import PatchMerging

    c, h, w = 6, 4, 4
    x = _t(rng, 1, h, w, c)
    w_red = _t(rng, 2 * c, 4 * c)
    g = _t(rng, 4 * c)
    b = _t(rng, 4 * c)

    # torch semantics in numpy
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    cat = np.concatenate([x0, x1, x2, x3], axis=-1)
    mu = cat.mean(-1, keepdims=True)
    var = cat.var(-1, keepdims=True)
    ln = (cat - mu) / np.sqrt(var + 1e-5) * g + b  # torch LN eps
    want = ln @ w_red.T

    sd = {"layers.0.downsample.reduction.weight": w_red,
          "layers.0.downsample.norm.weight": g,
          "layers.0.downsample.norm.bias": b}
    params, _ = swin_tree_from_torch(sd)
    got = PatchMerging(dim=c).apply({"params": params["merge0"]},
                                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_swin_graft_end_to_end(rng):
    """Full convert + graft into an initialised tiny SwinTransformer2D:
    every converted tensor matches a slot (nothing silently skipped) and
    the forward changes."""
    from otfusion_tpu.models.swin import SwinTransformer2D

    model = SwinTransformer2D(embed_dim=8, depths=(2, 2), heads=(2, 4),
                              window=4, drop_path_rate=0.0, remat=False)
    # 32x32 keeps the window un-clamped in BOTH stages (8x8 then 4x4
    # feature maps), so every bias table matches — like the reference's
    # fixed 384/4/12 geometry.
    x = jnp.asarray(_t(rng, 1, 32, 32, 3))
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x)
    sd = _tiny_swin_sd(rng)
    params, _ = swin_tree_from_torch(sd)

    from otfusion_tpu.utils.torch_import import _graft

    dst = jax.tree_util.tree_map(np.asarray, dict(v["params"]))
    loaded, skipped = [], []
    _graft(dst, params, (), loaded, skipped)
    assert skipped == [], skipped
    before = model.apply(v, x)[1]
    after = model.apply({"params": dst}, x)[1]
    assert not np.allclose(np.asarray(before), np.asarray(after))


# --- MedicalNet --------------------------------------------------------------


def _medicalnet10_sd(rng):
    sd = {}
    sd["conv1.weight"] = _t(rng, 64, 1, 7, 7, 7)
    _bn_entries(sd, "bn1", 64, rng)
    widths = [64, 128, 256, 512]
    in_w = 64
    for stage, w in enumerate(widths):
        t = f"layer{stage + 1}.0"
        sd[t + ".conv1.weight"] = _t(rng, w, in_w, 3, 3, 3)
        _bn_entries(sd, t + ".bn1", w, rng)
        sd[t + ".conv2.weight"] = _t(rng, w, w, 3, 3, 3)
        _bn_entries(sd, t + ".bn2", w, rng)
        if stage == 1:  # only layer2 strides in the MedicalNet trunk
            sd[t + ".downsample.0.weight"] = _t(rng, w, in_w, 1, 1, 1)
            _bn_entries(sd, t + ".downsample.1", w, rng)
        in_w = w
    # segmentation head must be skipped
    sd["conv_seg.2.weight"] = _t(rng, 2, 512)
    return sd


def test_medicalnet_layout_and_graft(rng):
    sd = _medicalnet10_sd(rng)
    params, stats = medicalnet_tree_from_torch(sd, depth=10)
    np.testing.assert_array_equal(
        params["Conv_0"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 4, 1, 0)))
    np.testing.assert_array_equal(
        params["MedicalBasicBlock_0"]["_Conv3_0"]["Conv_0"]["kernel"],
        np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 4, 1, 0)))
    # downsample -> the block-level shortcut Conv_0 / BatchNorm_2
    np.testing.assert_array_equal(
        params["MedicalBasicBlock_1"]["Conv_0"]["kernel"],
        np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 4, 1, 0)))
    np.testing.assert_array_equal(
        stats["MedicalBasicBlock_1"]["BatchNorm_2"]["mean"],
        sd["layer2.0.downsample.1.running_mean"])
    assert "conv_seg" not in str(params)

    # graft into an initialised model: every converted tensor must land
    from otfusion_tpu.models.medicalnet import MedicalNetResNet
    from otfusion_tpu.utils.torch_import import _graft

    model = MedicalNetResNet(depth=10, shortcut_type="B")
    x = jnp.asarray(_t(rng, 1, 16, 16, 16, 1))
    v = model.init(jax.random.key(0), x)
    dst_p = jax.tree_util.tree_map(np.asarray, dict(v["params"]))
    dst_s = jax.tree_util.tree_map(np.asarray, dict(v["batch_stats"]))
    loaded, skipped = [], []
    _graft(dst_p, params, (), loaded, skipped)
    _graft(dst_s, stats, (), loaded, skipped)
    # layers 3/4 keep stride 1 in the dilated trunk, so their first
    # blocks carry 'B' shortcut convs the torch dict (stride-only
    # downsamples) doesn't have — those flax slots keep their init;
    # nothing from the TORCH side may be skipped.
    assert skipped == [], skipped
    before = model.apply(v, x, train=False)
    after = model.apply({"params": dst_p, "batch_stats": dst_s}, x,
                        train=False)
    assert not np.allclose(np.asarray(before), np.asarray(after))


# --- Res2Net -----------------------------------------------------------------


def _res2net_sd(rng, layers=(1, 1, 1, 1), scale=4, base_width=26):
    sd = {}
    sd["conv1.0.weight"] = _t(rng, 32, 3, 3, 3)
    _bn_entries(sd, "conv1.1", 32, rng)
    sd["conv1.3.weight"] = _t(rng, 32, 32, 3, 3)
    _bn_entries(sd, "conv1.4", 32, rng)
    sd["conv1.6.weight"] = _t(rng, 64, 32, 3, 3)
    _bn_entries(sd, "bn1", 64, rng)
    in_w = 64
    for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), layers)):
        width = int(planes * base_width / 64.0)
        out_ch = planes * 4
        for i in range(n_blocks):
            t = f"layer{stage + 1}.{i}"
            sd[t + ".conv1.weight"] = _t(rng, width * scale, in_w, 1, 1)
            _bn_entries(sd, t + ".bn1", width * scale, rng)
            for j in range(scale - 1):
                sd[t + f".convs.{j}.weight"] = _t(rng, width, width, 3, 3)
                _bn_entries(sd, t + f".bns.{j}", width, rng)
            sd[t + ".conv3.weight"] = _t(rng, out_ch, width * scale, 1, 1)
            _bn_entries(sd, t + ".bn3", out_ch, rng)
            if i == 0:
                sd[t + ".downsample.1.weight"] = _t(rng, out_ch, in_w, 1, 1)
                _bn_entries(sd, t + ".downsample.2", out_ch, rng)
            in_w = out_ch
    sd["fc.weight"] = _t(rng, 1000, 2048)
    sd["fc.bias"] = _t(rng, 1000)
    return sd


def test_res2net_layout_and_graft(rng):
    from otfusion_tpu.models.res2net import Res2Net
    from otfusion_tpu.utils.torch_import import _graft

    layers = (1, 1, 1, 1)
    sd = _res2net_sd(rng, layers)
    params, stats = res2net_tree_from_torch(sd, layers=layers)
    # deep stem: three convs, bn1 is the THIRD BatchNorm
    np.testing.assert_array_equal(
        params["Conv_2"]["kernel"],
        np.transpose(sd["conv1.6.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(params["BatchNorm_2"]["scale"],
                                  sd["bn1.weight"])
    # ModuleList convs.{j} -> Conv_{j+1}; conv3 -> Conv_4 (scale 4)
    np.testing.assert_array_equal(
        params["Bottle2neck_0"]["Conv_2"]["kernel"],
        np.transpose(sd["layer1.0.convs.1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        params["Bottle2neck_1"]["Conv_4"]["kernel"],
        np.transpose(sd["layer2.0.conv3.weight"], (2, 3, 1, 0)))
    # v1b downsample indices 1 (conv) / 2 (bn) -> Conv_5 / BatchNorm_5
    np.testing.assert_array_equal(
        params["Bottle2neck_1"]["Conv_5"]["kernel"],
        np.transpose(sd["layer2.0.downsample.1.weight"], (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        stats["Bottle2neck_1"]["BatchNorm_5"]["var"],
        sd["layer2.0.downsample.2.running_var"])
    # classifier head skipped
    assert not any(np.shape(a) == (2048, 1000)
                   for a in jax.tree_util.tree_leaves(params))

    model = Res2Net(layers=layers)
    x = jnp.asarray(_t(rng, 1, 32, 32, 3))
    v = model.init(jax.random.key(0), x)
    dst_p = jax.tree_util.tree_map(np.asarray, dict(v["params"]))
    dst_s = jax.tree_util.tree_map(np.asarray, dict(v["batch_stats"]))
    loaded, skipped = [], []
    _graft(dst_p, params, (), loaded, skipped)
    _graft(dst_s, stats, (), loaded, skipped)
    assert skipped == [], skipped
    before = model.apply(v, x, train=False)
    after = model.apply({"params": dst_p, "batch_stats": dst_s}, x,
                        train=False)
    assert not np.allclose(np.asarray(before), np.asarray(after))


# --- UNETR ViT ---------------------------------------------------------------


def _unetr_sd(rng, hidden=16, heads=2, blocks=1, patch=4, n_tokens=8,
              prefix="vit."):
    sd = {}
    sd[prefix + "patch_embedding.patch_embeddings.1.weight"] = _t(
        rng, hidden, patch ** 3)
    sd[prefix + "patch_embedding.patch_embeddings.1.bias"] = _t(rng, hidden)
    sd[prefix + "patch_embedding.position_embeddings"] = _t(
        rng, 1, n_tokens, hidden)
    for i in range(blocks):
        t = f"{prefix}blocks.{i}"
        _ln_entries(sd, t + ".norm1", hidden, rng)
        sd[t + ".attn.qkv.weight"] = _t(rng, 3 * hidden, hidden)
        sd[t + ".attn.out_proj.weight"] = _t(rng, hidden, hidden)
        sd[t + ".attn.out_proj.bias"] = _t(rng, hidden)
        _ln_entries(sd, t + ".norm2", hidden, rng)
        sd[t + ".mlp.linear1.weight"] = _t(rng, 4 * hidden, hidden)
        sd[t + ".mlp.linear1.bias"] = _t(rng, 4 * hidden)
        sd[t + ".mlp.linear2.weight"] = _t(rng, hidden, 4 * hidden)
        sd[t + ".mlp.linear2.bias"] = _t(rng, hidden)
    _ln_entries(sd, prefix + "norm", hidden, rng)
    # decoder keys of the full-UNETR checkpoint must be ignored
    sd["decoder2.blocks.0.conv1.conv.weight"] = _t(rng, 8, 8, 3, 3)
    sd["out.conv.conv.weight"] = _t(rng, 14, 16, 1, 1)
    return sd


def test_unetr_qkv_attention_equivalence(rng):
    """The fused-qkv -> flax MHDPA conversion against a NumPy
    implementation of the MONAI SABlock semantics (qkv Linear ordered
    [qkv][heads][head_dim], per-head softmax(q k^T / sqrt(d)) v,
    heads-major concat, out_proj)."""
    hidden, heads, n = 16, 2, 6
    hd = hidden // heads
    x = _t(rng, 1, n, hidden)
    wqkv = _t(rng, 3 * hidden, hidden)
    wout = _t(rng, hidden, hidden)
    bout = _t(rng, hidden)

    # torch semantics in numpy
    qkv = x @ wqkv.T  # (1, n, 3*hidden)
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads_split(a):  # (1, n, hidden) -> (1, heads, n, hd)
        return a.reshape(1, n, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    att = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
    att = np.exp(att - att.max(-1, keepdims=True))
    att = att / att.sum(-1, keepdims=True)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(1, n, hidden)
    want = out @ wout.T + bout

    sd = {"blocks.0.attn.qkv.weight": wqkv,
          "blocks.0.attn.out_proj.weight": wout,
          "blocks.0.attn.out_proj.bias": bout}
    params, _ = unetr_vit_tree_from_torch(sd, heads=heads)
    attn_params = params["block_0"]["MultiHeadDotProductAttention_0"]

    import flax.linen as nn

    mha = nn.MultiHeadDotProductAttention(num_heads=heads,
                                          deterministic=True,
                                          use_bias=False)
    # out bias: flax 'out' DenseGeneral carries it even with use_bias
    # False elsewhere — apply manually for a clean comparison
    out_bias = attn_params["out"].pop("bias")
    got = mha.apply({"params": attn_params}, jnp.asarray(x),
                    jnp.asarray(x))
    got = np.asarray(got) + out_bias
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_unetr_layout_and_graft(rng):
    from otfusion_tpu.models.unetr import UNETRViTEncoder
    from otfusion_tpu.utils.torch_import import _graft

    sd = _unetr_sd(rng)
    params, stats = unetr_vit_tree_from_torch(sd, heads=2)
    assert stats == {}
    np.testing.assert_array_equal(
        params["patch_embed"]["kernel"],
        sd["vit.patch_embedding.patch_embeddings.1.weight"].T)
    np.testing.assert_array_equal(
        params["pos_embed"],
        sd["vit.patch_embedding.position_embeddings"])
    # qkv thirds -> query/key/value DenseGeneral (in, heads, hd)
    wq = sd["vit.blocks.0.attn.qkv.weight"][:16]
    np.testing.assert_array_equal(
        params["block_0"]["MultiHeadDotProductAttention_0"]["query"]
        ["kernel"], wq.T.reshape(16, 2, 8))
    # decoder/out keys ignored
    assert all(k in ("patch_embed", "pos_embed", "block_0", "LayerNorm_0")
               for k in params)

    model = UNETRViTEncoder(hidden=16, layers=1, heads=2, patch_size=4)
    x = jnp.asarray(_t(rng, 1, 8, 8, 8, 1))
    v = model.init(jax.random.key(0), x)
    dst_p = jax.tree_util.tree_map(np.asarray, dict(v["params"]))
    loaded, skipped = [], []
    _graft(dst_p, params, (), loaded, skipped)
    # flax MHDPA query/key/value carry biases the bias-free MONAI qkv
    # doesn't ship — only those flax-side extras stay at init; every
    # TORCH tensor must land.
    assert skipped == [], skipped
    before = model.apply(v, x)
    after = model.apply({"params": dst_p}, x)
    assert not np.allclose(np.asarray(before), np.asarray(after))


# --- dispatcher + trainer wiring ---------------------------------------------


def test_backbone_dispatcher(rng):
    sd = _medicalnet10_sd(rng)
    p, s = backbone_tree_from_torch(sd, "medicalnet-10")
    assert "MedicalBasicBlock_0" in p
    with pytest.raises(ValueError, match="importer"):
        backbone_tree_from_torch(sd, "nonsense-backbone")
    with pytest.raises(ValueError, match="depth"):
        backbone_tree_from_torch(sd, "")


def test_hetero_fusion_pretrained_graft(tmp_path, rng):
    """restore_backbone routes a .pth through the family converter named
    by the registry backbone spec — the reference's always-pretrained
    heterogeneous config (BASELINE config 5) now has a weight path."""
    from otfusion_tpu.models import MultimodalOTFusion
    from otfusion_tpu.train import create_train_state
    from otfusion_tpu.utils.checkpoint import restore_backbone

    sd = _medicalnet10_sd(rng)
    pth = tmp_path / "medicalnet10.pth"
    torch.save({"state_dict": {"module." + k: torch.tensor(v)
                               for k, v in sd.items()}}, pth)

    model = MultimodalOTFusion(
        num_classes=2, variant="per_epoch_attn",
        mri_backbone="medicalnet-10", pet_backbone="resnet3d-10",
    )
    mri = jnp.asarray(_t(rng, 2, 16, 16, 16, 1))
    d_mri, d_pet = 1024, 512  # hw-pool at 16^3 keeps D'=2
    tv = jnp.full((d_pet, d_mri), 1.0 / (d_pet * d_mri), jnp.float32)
    state = create_train_state(model, jax.random.key(0), (mri, mri), 1e-4,
                               t_feature=tv)
    before = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        mri, mri, t_feature=tv, train=False)["logits"]

    state2 = restore_backbone(state, pth, "mri_backbone",
                              backbone="medicalnet-10")
    got = np.asarray(
        state2.params["mri_backbone"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        got, np.transpose(sd["conv1.weight"], (2, 3, 4, 1, 0)))
    after = model.apply(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        mri, mri, t_feature=tv, train=False)["logits"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
