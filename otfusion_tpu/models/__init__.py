"""Flax model zoo: 3D ResNet family, attention fusion, and hetero backbones."""

from otfusion_tpu.models.resnet3d import (
    ResNet3DBackbone,
    ResNet3DClassifier,
    DEPTH_CONFIGS,
)
from otfusion_tpu.models.attention import SelfAttentionBlock
from otfusion_tpu.models.fusion import MultimodalOTFusion

__all__ = [
    "ResNet3DBackbone",
    "ResNet3DClassifier",
    "DEPTH_CONFIGS",
    "SelfAttentionBlock",
    "MultimodalOTFusion",
]
