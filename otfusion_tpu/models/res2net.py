"""Res2Net-v1b 2D backbone (reference Models/res2net.py).

Multi-scale ``Bottle2neck``: the 3x3 stage is split into ``scale`` groups
of ``width`` channels solved hierarchically — group i's conv consumes
group i's input plus group i-1's output (Models/res2net.py:16-93). The
v1b flavour uses a deep 3-conv stem and an avgpool+1x1 downsample path.
Factory parity: ``res2net50_v1b_26w_4s`` (base width 26, scale 4,
feature dim 2048) — the 2D fundus encoder of the legacy RIMA path
(Medical_base_2DNet, baseline_models_fusion.py:36-55).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from otfusion_tpu.models.resnet3d import _conv_init


def _bn(train, dtype=jnp.float32):
    # Output in the compute dtype; flax keeps stats/params f32 internally.
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    base_width: int = 26
    scale: int = 4
    stype: str = "normal"  # "stage" for the first block of a stage
    # inference-only serving variant: BNs folded into biased convs
    # (utils/checkpoint.py:fold_zoo_conv_bn — here Conv_i pairs with
    # BatchNorm_i by construction, every conv is followed by its BN)
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0))
        out_ch = self.planes * 4
        bn = (lambda y: y) if self.fold_bn else \
            (lambda y: _bn(train, self.dtype)(y))
        residual = x

        out = nn.Conv(width * self.scale, (1, 1), use_bias=self.fold_bn,
                      kernel_init=_conv_init, dtype=self.dtype)(x)
        out = bn(out)
        out = nn.relu(out)

        splits = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        n_convs = self.scale - 1 if self.scale > 1 else 1
        for i in range(n_convs):
            if i == 0 or self.stype == "stage":
                sp = splits[i]
            else:
                sp = sp + splits[i]
            sp = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                         padding=[(1, 1)] * 2, use_bias=self.fold_bn,
                         kernel_init=_conv_init, dtype=self.dtype)(sp)
            sp = nn.relu(bn(sp))
            outs.append(sp)
        if self.scale > 1:
            last = splits[-1]
            if self.stype == "stage":
                # stage blocks pool the untouched group to the new stride
                last = nn.avg_pool(last, (3, 3), strides=(self.stride,) * 2,
                                   padding=[(1, 1)] * 2)
            outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(out_ch, (1, 1), use_bias=self.fold_bn,
                      kernel_init=_conv_init, dtype=self.dtype)(out)
        out = bn(out)

        if self.stride != 1 or x.shape[-1] != out_ch:
            # v1b downsample: avgpool + 1x1 conv + BN
            residual = x
            if self.stride != 1:
                residual = nn.avg_pool(residual, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            residual = nn.Conv(out_ch, (1, 1), use_bias=self.fold_bn,
                               kernel_init=_conv_init,
                               dtype=self.dtype)(residual)
            residual = bn(residual)
        return nn.relu(out + residual)


class Res2Net(nn.Module):
    """Res2Net-v1b; returns the pooled 512*4-dim feature."""

    layers: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 26
    scale: int = 4
    # Serve with BN folded into biased convs (exact in eval mode;
    # params from utils/checkpoint.py:fold_zoo_conv_bn). Inference-only.
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold_bn and train:
            raise ValueError("fold_bn is inference-only: training needs "
                             "live BN statistics")
        x = x.astype(self.dtype)
        # v1b deep stem: 3x3(s2)-3x3-3x3 to 64 channels
        for features, stride in ((32, 2), (32, 1), (64, 1)):
            x = nn.Conv(features, (3, 3), strides=(stride,) * 2,
                        padding=[(1, 1)] * 2, use_bias=self.fold_bn,
                        kernel_init=_conv_init, dtype=self.dtype)(x)
            x = x if self.fold_bn else _bn(train, self.dtype)(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            for i in range(n_blocks):
                x = Bottle2neck(
                    planes,
                    stride=2 if (stage > 0 and i == 0) else 1,
                    base_width=self.base_width,
                    scale=self.scale,
                    stype="stage" if i == 0 else "normal",
                    fold_bn=self.fold_bn,
                    dtype=self.dtype,
                )(x, train)

        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


def res2net50_v1b_26w_4s(dtype=jnp.float32, **kwargs) -> Res2Net:
    """Factory parity with Models/res2net.py:249-262 (2048-dim feature)."""
    return Res2Net(layers=(3, 4, 6, 3), base_width=26, scale=4, dtype=dtype,
                   **kwargs)
