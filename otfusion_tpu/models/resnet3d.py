"""3D ResNet family in Flax (channels-last, TPU-native).

Reimplements (by spec, not translation) the inline 3D ResNet used by every
AD entry point in the reference:
  * classifier: 3D_resnet.py:341-440 (``ResNet3D`` + ``build_model``)
  * headless backbone: MRI_PET_OT_OT_per_epoch_attn.py:480-545
    (``ResNet3D_Backbone``)

Topology parity:
  stem   Conv3d(in->64, k=(3,7,7), s=(1,2,2), p=(1,3,3), no bias) + BN + ReLU
  pool   MaxPool3d(k=(1,3,3), s=(1,2,2), p=(0,1,1))
  stages 64/128/256/512 with strides 1,2,2,2
  head   global average pool (+ Dense for the classifier)

Depth table (3D_resnet.py:413-437): 10/18/34 use basic blocks, 50/101/152/
200 use bottlenecks (expansion 4). Reference quirk normalised: the
reference imports ``BasicBlock`` from torchvision's *video* resnet and
calls it with the wrong signature (conv_builder slot receives the stride —
3D_resnet.py:51,417-423), so its basic-block depths crash at construction;
all published results use bottleneck depths. Here depths 10-34 are proper
two-conv 3x3x3 residual blocks.

TPU-first choices: NDHWC layout (channels-last is XLA's native conv
layout), configurable compute dtype (bf16 for MXU throughput, fp32
params/batch-stats), He fan-out init matching the reference's Kaiming init
(3D_resnet.py:368-373).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# depth -> (stage block counts, block kind)
DEPTH_CONFIGS: dict[int, tuple[tuple[int, int, int, int], str]] = {
    10: ((1, 1, 1, 1), "basic"),
    18: ((2, 2, 2, 2), "basic"),
    34: ((3, 4, 6, 3), "basic"),
    50: ((3, 4, 6, 3), "bottleneck"),
    101: ((3, 4, 23, 3), "bottleneck"),
    152: ((3, 8, 36, 3), "bottleneck"),
    200: ((3, 24, 36, 3), "bottleneck"),
}

EXPANSION = {"basic": 1, "bottleneck": 4}

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def space_to_depth_hw(x):
    """(B, D, H, W, C) -> (B, D, H/2, W/2, 4C): 2x2 H/W blocks move to
    channels, channel index = (dh*2 + dw)*C + c."""
    b, d, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(
            f"--s2d-stem requires even H and W (got H={h}, W={w}): the "
            "2x2 space-to-depth rearrangement has no remainder rows. "
            "Use an even --target-shape or the plain stem.")
    x = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, d, h // 2, w // 2, 4 * c)


def s2d_stem_kernel(w_old):
    """Losslessly rewrite a stride-(1,2,2) k=(3,7,7) stem-conv kernel
    into the stride-1 k=(3,4,4) kernel over space-to-depth(2x2) inputs.

    Derivation: output position i reads input rows h = 2i + kh - 3; in
    s2d coordinates h = 2u + dh, so taps split by row parity:
    dh=1 rows come from kh in {0,2,4,6} at u-offsets {-2,-1,0,1}
    (new index qh with kh = 2*qh) and dh=0 rows from kh in {1,3,5} at
    offsets {-1,0,1} (kh = 2*qh - 1; qh = 0 has no source and stays 0).
    Same split on W. The new conv uses padding (2, 1) on H and W — the
    exact image of the original padding 3 under s2d. Verified to
    reproduce the plain stem's outputs bit-for-bit-close in
    tests/test_models.py (test_s2d_stem_* family).

    The kernel layout is Flax (kD, kH, kW, C_in, C_out); works for any
    C_in (channels map to blocks of the 4*C_in s2d channel axis).
    """
    import numpy as np

    kd, kh, kw, cin, cout = w_old.shape
    if (kh, kw) != (7, 7):
        raise ValueError(f"s2d stem rewrite expects k=(*,7,7), got "
                         f"{(kd, kh, kw)}")
    w_new = np.zeros((kd, 4, 4, 4 * cin, cout), w_old.dtype)
    for qh in range(4):
        for dh in range(2):
            src_h = 2 * qh if dh == 1 else 2 * qh - 1
            if not 0 <= src_h < kh:
                continue
            for qw in range(4):
                for dw in range(2):
                    src_w = 2 * qw if dw == 1 else 2 * qw - 1
                    if not 0 <= src_w < kw:
                        continue
                    c = (dh * 2 + dw) * cin
                    w_new[:, qh, qw, c : c + cin] = w_old[:, src_h, src_w]
    return w_new


def feature_dim(depth: int) -> int:
    """Pooled feature width for a given depth (512 * expansion)."""
    return 512 * EXPANSION[DEPTH_CONFIGS[depth][1]]


class _ConvBN(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Any = "SAME"
    # Inference-only: the BN affine+stats are folded into the conv
    # kernel/bias at checkpoint load (utils/checkpoint.py:
    # fold_conv_bn_params — exact in eval mode), so the module is a
    # single biased conv. Serving surface (cli/predict.py --fold-bn).
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.fold_bn and train:
            raise ValueError(
                "fold_bn is inference-only: training needs live BN "
                "batch statistics")
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.strides),
            padding=self.padding,
            use_bias=self.fold_bn,
            kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)
        if self.fold_bn:
            return x
        # BN output follows the compute dtype: statistics/params are f32
        # regardless (flax upcasts internally), but emitting the result
        # in bf16 keeps the relu/residual/remat activations half-width —
        # a pure HBM-bandwidth saving on the 128^3 early stages.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return x


class BasicBlock3D(nn.Module):
    """Two 3x3x3 convs with a residual connection."""

    planes: int
    stride: int = 1
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        s = (self.stride,) * 3
        identity = x
        out = _ConvBN(self.planes, (3, 3, 3), s, fold_bn=self.fold_bn,
                      dtype=self.dtype)(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes, (3, 3, 3), fold_bn=self.fold_bn,
                      dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = _ConvBN(self.planes, (1, 1, 1), s,
                               fold_bn=self.fold_bn, dtype=self.dtype)(
                x, train
            )
        return nn.relu(out + identity)


class Bottleneck3D(nn.Module):
    """1x1x1 -> 3x3x3(stride) -> 1x1x1 bottleneck, expansion 4
    (reference MRI_PET_OT.py:380-414)."""

    planes: int
    stride: int = 1
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        s = (self.stride,) * 3
        out_ch = self.planes * 4
        identity = x
        out = _ConvBN(self.planes, (1, 1, 1), fold_bn=self.fold_bn,
                      dtype=self.dtype)(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes, (3, 3, 3), s, fold_bn=self.fold_bn,
                      dtype=self.dtype)(out, train)
        out = nn.relu(out)
        out = _ConvBN(out_ch, (1, 1, 1), fold_bn=self.fold_bn,
                      dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = _ConvBN(out_ch, (1, 1, 1), s, fold_bn=self.fold_bn,
                               dtype=self.dtype)(
                x, train
            )
        return nn.relu(out + identity)


class ResNet3DBackbone(nn.Module):
    """Headless 3D ResNet returning pooled (B, 512*expansion) features.

    Input is NDHWC: (B, D, H, W, C). ``depth`` picks the stage layout from
    DEPTH_CONFIGS; ``dtype`` is the compute dtype (params stay fp32).
    """

    depth: int = 50
    # Gradient checkpointing per residual block: recompute activations in
    # the backward pass. Trades ~1/3 more FLOPs for the activation memory
    # that otherwise prevents large batches at 128^3 (HBM compile OOM).
    remat: bool = False
    # Space-to-depth stem: rearrange 2x2 H/W blocks into channels and run
    # the stem as a stride-1 k=(3,4,4) conv over 4 input channels — the
    # standard TPU fix for the 1-channel stem's MXU underfill (the
    # implicit GEMM's contraction dim grows 147 -> 192 and the
    # high-resolution stride-2 conv disappears). Mathematically a
    # superset of the plain stem: ``s2d_stem_kernel`` maps any plain
    # stem kernel onto it EXACTLY (torch .pth import applies the map, so
    # pretrained-weight parity survives); trained from scratch the extra
    # taps are free parameters. Opt-in (docs/perf_notes.md lever #1).
    s2d_stem: bool = False
    # Inference-only: serve with BN folded into the conv kernels (see
    # _ConvBN.fold_bn; params must come from fold_conv_bn_params).
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers, kind = DEPTH_CONFIGS[self.depth]
        block = BasicBlock3D if kind == "basic" else Bottleneck3D
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))

        x = x.astype(self.dtype)
        # Stem: anisotropic conv + maxpool preserving depth resolution.
        if self.s2d_stem:
            x = space_to_depth_hw(x)
            x = _ConvBN(
                64,
                (3, 4, 4),
                (1, 1, 1),
                padding=((1, 1), (2, 1), (2, 1)),
                fold_bn=self.fold_bn,
                dtype=self.dtype,
            )(x, train)
        else:
            x = _ConvBN(
                64,
                (3, 7, 7),
                (1, 2, 2),
                padding=((1, 1), (3, 3), (3, 3)),
                fold_bn=self.fold_bn,
                dtype=self.dtype,
            )(x, train)
        x = nn.relu(x)
        x = nn.max_pool(
            x,
            window_shape=(1, 3, 3),
            strides=(1, 2, 2),
            padding=((0, 0), (1, 1), (1, 1)),
        )

        # Blocks carry EXPLICIT names matching the plain path's historic
        # auto-names: flax's lifted nn.remat renames auto-named children
        # (BasicBlock3D_0 -> CheckpointBasicBlock3D_0), which would fork
        # the param tree on the remat flag and silently break --resume /
        # pretrained grafts / predict-time restores across a remat
        # toggle (tests/test_grad_accum.py::
        # test_grad_accum_composes_with_remat covers the equivalence).
        base_name = BasicBlock3D.__name__ if kind == "basic" \
            else Bottleneck3D.__name__
        idx = 0
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), layers)
        ):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(planes, stride, fold_bn=self.fold_bn,
                          dtype=self.dtype,
                          name=f"{base_name}_{idx}")(x, train)
                idx += 1

        # Global average pool over (D, H, W).
        x = jnp.mean(x, axis=(1, 2, 3))
        return x.astype(jnp.float32)


class ResNet3DClassifier(nn.Module):
    """Backbone + linear head — parity with the unimodal trainer's model
    (3D_resnet.py:341-365)."""

    depth: int = 50
    num_classes: int = 2
    s2d_stem: bool = False
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResNet3DBackbone(self.depth, s2d_stem=self.s2d_stem,
                                 fold_bn=self.fold_bn,
                                 dtype=self.dtype, name="backbone")(
            x, train
        )
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return logits, feats
