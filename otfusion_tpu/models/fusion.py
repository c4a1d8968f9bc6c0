"""Multimodal OT fusion models.

One Flax module covers both reference fusion architectures:

  * ``variant="per_epoch_attn"`` — the flagship 3-token model
    (MRI_PET_OT_OT_per_epoch_attn.py:614-755): two ResNet3D backbones,
    cross-modal MLP projections, fusion MLPs, tokens
    [mri_feat, pet_feat @ Tv.T, pet_to_mri] through a self-attention block,
    token-mean, classifier on concat([attn_out, pet_fused]). The OT
    alignment loss is cosine(mri_fused, pet_feat @ Tv.T).

  * ``variant="base"`` — MRI_PET_OT.py:547-709: same trunk, single-token
    attention over mri_fused, classifier on concat([attn_out, pet_fused]),
    OT mapping applied to *pet_fused* (not pet_feat), with the coupling
    solved in-batch (identity sample plan) when none is supplied — in this
    rebuild that FOT solve runs on-device inside the jitted train step
    (otfusion_tpu.train.steps) instead of a per-batch host round-trip.

  * ``variant="mmfusion"`` — the no-OT baseline
    (comparative_results/best_mmfusion_results.csv; trainer script absent
    from the reference tree, recreated per SURVEY.md §7): identical trunk
    and attention, no OT branch and no OT loss.

The module is pure: it returns features and logits; losses live in
otfusion_tpu.train.losses so the train step composes them functionally.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from otfusion_tpu.models.attention import SelfAttentionBlock
from otfusion_tpu.models.resnet3d import ResNet3DBackbone, feature_dim
from otfusion_tpu.ops.fot import apply_feature_coupling


class _ProjectionMLP(nn.Module):
    """d -> 2d -> d with ReLU+dropout (reference attn:671-681)."""

    dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.dim * 2, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class _FusionMLP(nn.Module):
    """2d -> d -> d with ReLU+dropout (reference attn:684-693)."""

    dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


class MultimodalOTFusion(nn.Module):
    """Dual-backbone OT fusion classifier. See module docstring."""

    num_classes: int = 2
    depth: int = 50
    projection_dropout: float = 0.3
    variant: str = "per_epoch_attn"  # "per_epoch_attn" | "base" | "mmfusion"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mri, pet, t_feature=None, train: bool = False):
        """Args:
          mri, pet: (B, D, H, W, 1) volumes.
          t_feature: (d_pet, d_mri) feature coupling Tv (required for
            "per_epoch_attn", optional for "base", unused for "mmfusion").
        Returns a dict of logits and intermediate features.
        """
        d = feature_dim(self.depth)

        mri_feat = ResNet3DBackbone(self.depth, dtype=self.dtype,
                                    name="mri_backbone")(mri, train)
        pet_feat = ResNet3DBackbone(self.depth, dtype=self.dtype,
                                    name="pet_backbone")(pet, train)

        mri_to_pet = _ProjectionMLP(d, self.projection_dropout, self.dtype,
                                    name="mri2pet")(mri_feat, train)
        pet_to_mri = _ProjectionMLP(d, self.projection_dropout, self.dtype,
                                    name="pet2mri")(pet_feat, train)

        mri_fused = _FusionMLP(d, self.projection_dropout, self.dtype,
                               name="mri_fusion")(
            jnp.concatenate([mri_feat, mri_to_pet], axis=1), train)
        pet_fused = _FusionMLP(d, self.projection_dropout, self.dtype,
                               name="pet_fusion")(
            jnp.concatenate([pet_feat, pet_to_mri], axis=1), train)

        attention = SelfAttentionBlock(embed_dim=d, num_heads=8, ff_dim=d,
                                       dropout=0.1, dtype=self.dtype,
                                       name="attention_mri")

        ot_mri_from_pet = None
        if self.variant == "per_epoch_attn":
            if t_feature is None:
                raise ValueError(
                    "t_feature (Tv) is required for the per_epoch_attn "
                    "variant (reference attn:723-725)")
            # PET features mapped into MRI space by the feature plan
            # (barycentric projection; t_feature is (d_pet, d_mri)).
            ot_mri_from_pet = apply_feature_coupling(pet_feat, t_feature)
            tokens = jnp.stack([mri_feat, ot_mri_from_pet, pet_to_mri],
                               axis=1)  # (B, 3, d)
            attn_out = attention(tokens, train).mean(axis=1)
        elif self.variant == "base":
            if t_feature is not None:
                ot_mri_from_pet = apply_feature_coupling(pet_fused, t_feature)
            attn_out = attention(mri_fused[:, None, :], train)[:, 0, :]
        elif self.variant == "mmfusion":
            attn_out = attention(mri_fused[:, None, :], train)[:, 0, :]
        else:
            raise ValueError(f"unknown variant: {self.variant}")

        logits = nn.Dense(self.num_classes, name="fc")(
            jnp.concatenate([attn_out, pet_fused], axis=1))

        return {
            "logits": logits,
            "mri_feat": mri_feat,
            "pet_feat": pet_feat,
            "mri_fused": mri_fused,
            "pet_fused": pet_fused,
            "mri_to_pet": mri_to_pet,
            "pet_to_mri": pet_to_mri,
            "ot_mri_from_pet": ot_mri_from_pet,
        }
