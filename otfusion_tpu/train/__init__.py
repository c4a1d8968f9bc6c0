"""Training: losses, state, jitted steps, per-epoch coupling service, loops."""

from otfusion_tpu.train.losses import cross_entropy, cosine_alignment_loss
from otfusion_tpu.train.train_state import (
    FusionTrainState,
    create_train_state,
    ReduceLROnPlateau,
)
from otfusion_tpu.train.steps import (
    make_fusion_train_step,
    make_fusion_eval_step,
    make_unimodal_train_step,
    make_unimodal_eval_step,
    make_feature_extract_step,
)
from otfusion_tpu.train.coupling import CouplingService

__all__ = [
    "cross_entropy",
    "cosine_alignment_loss",
    "FusionTrainState",
    "create_train_state",
    "ReduceLROnPlateau",
    "make_fusion_train_step",
    "make_fusion_eval_step",
    "make_unimodal_train_step",
    "make_unimodal_eval_step",
    "make_feature_extract_step",
    "CouplingService",
]
