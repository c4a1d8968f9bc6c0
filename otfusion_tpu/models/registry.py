"""Backbone registry (reference Models/generate_model.py parity).

``build_backbone(name)`` maps the reference's model-builder surface onto
the Flax zoo:

  resnet3d-{10,18,34,50,101,152,200}   inline 3D ResNet backbone
  medicalnet-{10,...,200}              dilated MedicalNet trunk
  res2net50_v1b_26w_4s                 2D multi-scale encoder (2048-d)
  swin_base_384                        2D Swin (returns (tokens, pooled))
  unetr_vit                            3D ViT encoder (768-d)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from otfusion_tpu.models.medicalnet import MedicalNetResNet
from otfusion_tpu.models.res2net import res2net50_v1b_26w_4s
from otfusion_tpu.models.resnet3d import DEPTH_CONFIGS, ResNet3DBackbone
from otfusion_tpu.models.swin import swin_base_384
from otfusion_tpu.models.unetr import UNETRViTEncoder


def fold_bn_supported(backbone: str) -> bool:
    """Families with a ``fold_bn`` serving variant (BN folded into
    biased convs at load): the inline ResNet3D ('' / resnet3d-*,
    utils/checkpoint.py:fold_conv_bn_params) and the conv zoo families
    (medicalnet-*, res2net*, fold_zoo_conv_bn). Swin/UNETR are
    LayerNorm-based — nothing to fold."""
    spec = (backbone or "").lower()
    return (spec == "" or spec.startswith("resnet3d")
            or spec.startswith("medicalnet-") or spec.startswith("res2net"))


def build_backbone(backbone: str, dtype: Any = jnp.float32, **kwargs):
    spec = backbone.lower()
    if spec.startswith("resnet3d-"):
        depth = int(spec.split("-")[1])
        if depth not in DEPTH_CONFIGS:
            raise ValueError(f"unsupported depth {depth}")
        return ResNet3DBackbone(depth=depth, dtype=dtype, **kwargs)
    if spec.startswith("medicalnet-"):
        depth = int(spec.split("-")[1])
        if depth not in DEPTH_CONFIGS:
            raise ValueError(f"unsupported depth {depth}")
        return MedicalNetResNet(depth=depth, dtype=dtype, **kwargs)
    if spec == "res2net50_v1b_26w_4s":
        return res2net50_v1b_26w_4s(dtype=dtype, **kwargs)
    if spec == "swin_base_384":
        return swin_base_384(dtype=dtype, **kwargs)
    if spec == "unetr_vit":
        return UNETRViTEncoder(dtype=dtype, **kwargs)
    raise ValueError(f"unknown backbone: {backbone}")
