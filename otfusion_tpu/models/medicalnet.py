"""MedicalNet-style dilated 3D ResNet (reference Models/resnet.py).

Differences from the inline 3D ResNet (resnet3d.py):
  * isotropic 7^3 stride-2 stem + 3^3 stride-2 maxpool (Models/resnet.py:126-138);
  * layer3 keeps stride 1 with dilation 2, layer4 stride 1 dilation 4
    (:139-143) — the segmentation-style high-resolution trunk;
  * shortcut type 'A': parameter-free downsample = stride-slice +
    zero-padded channels (downsample_basic_block, :26-37) vs 'B' (1x1
    conv + BN);
  * the classifier head pools only (H, W) — the reference's
    ``AdaptiveAvgPool2d(1)`` applied to a 5D tensor (:144) leaves the
    depth axis intact, so the flattened feature is 512*expansion*D'
    (8192 for ResNet-10 on the legacy OCT shapes,
    baseline_models_fusion.py:88). ``pool="hw"`` reproduces that;
    ``pool="full"`` gives the conventional global pool.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from otfusion_tpu.models.resnet3d import DEPTH_CONFIGS, EXPANSION, _conv_init


class _Conv3(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False  # True only under fold_bn (folded BN shift)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(3, 3, 3),
            strides=(self.stride,) * 3,
            kernel_dilation=(self.dilation,) * 3,
            padding=[(self.dilation,) * 2] * 3,
            use_bias=self.use_bias,
            kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)


def _bn(train, dtype=jnp.float32):
    # Output in the compute dtype; flax keeps stats/params f32 internally.
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


def _shortcut_a(x, out_ch: int, stride: int):
    """Parameter-free type-'A' downsample: stride-slice (avg_pool k=1
    s=stride == subsampling) + zero-pad channels."""
    if stride != 1:
        x = x[:, ::stride, ::stride, ::stride, :]
    pad = out_ch - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * 4 + [(0, pad)])
    return x


class MedicalBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    shortcut_type: str = "B"
    # inference-only serving variant: BNs folded into biased convs
    # (utils/checkpoint.py:fold_zoo_conv_bn builds the matching params)
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes
        bn = (lambda y: y) if self.fold_bn else \
            (lambda y: _bn(train, self.dtype)(y))
        residual = x
        out = _Conv3(self.planes, self.stride, self.dilation,
                     use_bias=self.fold_bn, dtype=self.dtype)(x)
        out = bn(out)
        out = nn.relu(out)
        out = _Conv3(self.planes, 1, self.dilation,
                     use_bias=self.fold_bn, dtype=self.dtype)(out)
        out = bn(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            if self.shortcut_type == "A":
                residual = _shortcut_a(x, out_ch, self.stride)
            else:
                residual = nn.Conv(out_ch, (1, 1, 1),
                                   strides=(self.stride,) * 3,
                                   use_bias=self.fold_bn,
                                   kernel_init=_conv_init,
                                   dtype=self.dtype)(x)
                residual = bn(residual)
        return nn.relu(out + residual)


class MedicalBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    shortcut_type: str = "B"
    fold_bn: bool = False  # see MedicalBasicBlock
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.planes * 4
        bn = (lambda y: y) if self.fold_bn else \
            (lambda y: _bn(train, self.dtype)(y))
        residual = x
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=self.fold_bn,
                      kernel_init=_conv_init, dtype=self.dtype)(x)
        out = bn(out)
        out = nn.relu(out)
        out = _Conv3(self.planes, self.stride, self.dilation,
                     use_bias=self.fold_bn, dtype=self.dtype)(out)
        out = bn(out)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1, 1), use_bias=self.fold_bn,
                      kernel_init=_conv_init, dtype=self.dtype)(out)
        out = bn(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            if self.shortcut_type == "A":
                residual = _shortcut_a(x, out_ch, self.stride)
            else:
                residual = nn.Conv(out_ch, (1, 1, 1),
                                   strides=(self.stride,) * 3,
                                   use_bias=self.fold_bn,
                                   kernel_init=_conv_init,
                                   dtype=self.dtype)(x)
                residual = bn(residual)
        return nn.relu(out + residual)


class MedicalNetResNet(nn.Module):
    """Dilated 3D ResNet backbone; returns flattened features.

    ``pool``: "hw" (reference quirk — pool H, W only, keep depth) or
    "full" (global average pool)."""

    depth: int = 10
    shortcut_type: str = "B"
    pool: str = "hw"
    # Serve with BN folded into biased convs (exact in eval mode;
    # params from utils/checkpoint.py:fold_zoo_conv_bn). Training needs
    # live batch statistics, so fold_bn models refuse train=True.
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and train:
            raise ValueError("fold_bn is inference-only: training needs "
                             "live BN statistics")
        layers, kind = DEPTH_CONFIGS[self.depth]
        block = MedicalBasicBlock if kind == "basic" else MedicalBottleneck

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7, 7), strides=(2, 2, 2),
                    padding=[(3, 3)] * 3, use_bias=self.fold_bn,
                    kernel_init=_conv_init, dtype=self.dtype)(x)
        if not self.fold_bn:
            x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=[(1, 1)] * 3)

        stage_cfg = [  # (planes, stride, dilation) per Models/resnet.py:138-143
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        for (planes, stride, dilation), n_blocks in zip(stage_cfg, layers):
            for i in range(n_blocks):
                x = block(
                    planes,
                    stride=stride if i == 0 else 1,
                    dilation=dilation,
                    shortcut_type=self.shortcut_type,
                    fold_bn=self.fold_bn,
                    dtype=self.dtype,
                )(x, train)

        if self.pool == "hw":
            x = jnp.mean(x, axis=(2, 3))       # (B, D', C)
            x = x.reshape(x.shape[0], -1)      # (B, D' * 512*expansion)
        else:
            x = jnp.mean(x, axis=(1, 2, 3))
        return x.astype(jnp.float32)
