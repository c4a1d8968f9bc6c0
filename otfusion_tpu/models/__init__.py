"""Flax model zoo: 3D ResNet family, attention fusion, and hetero backbones."""

from otfusion_tpu.models.resnet3d import (
    ResNet3DBackbone,
    ResNet3DClassifier,
    DEPTH_CONFIGS,
)
from otfusion_tpu.models.attention import SelfAttentionBlock
from otfusion_tpu.models.fusion import MultimodalOTFusion
from otfusion_tpu.models.medicalnet import MedicalNetResNet
from otfusion_tpu.models.res2net import Res2Net, res2net50_v1b_26w_4s
from otfusion_tpu.models.swin import SwinTransformer2D, swin_base_384
from otfusion_tpu.models.unetr import UNETRViTEncoder
from otfusion_tpu.models.registry import build_backbone

__all__ = [
    "ResNet3DBackbone",
    "ResNet3DClassifier",
    "DEPTH_CONFIGS",
    "SelfAttentionBlock",
    "MultimodalOTFusion",
    "MedicalNetResNet",
    "Res2Net",
    "res2net50_v1b_26w_4s",
    "SwinTransformer2D",
    "swin_base_384",
    "UNETRViTEncoder",
    "build_backbone",
]
