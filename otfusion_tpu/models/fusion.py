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
from otfusion_tpu.models.resnet3d import ResNet3DBackbone
from otfusion_tpu.ops.fot import apply_feature_coupling


class _ProjectionMLP(nn.Module):
    """d_in -> 2*d_out -> d_out with ReLU+dropout (reference attn:671-681;
    the reference's equal-width case is hidden = 2*d = 2*d_out)."""

    out_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.out_dim * 2, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)


class _FusionMLP(nn.Module):
    """concat -> d -> d with ReLU+dropout (reference attn:684-693)."""

    dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


def build_fusion_backbone(spec: str, depth: int, dtype, name=None,
                          remat: bool = False, s2d_stem: bool = False,
                          fold_bn: bool = False):
    """Construct a fusion-side backbone from its registry spec (empty =
    the reference's ResNet3D at ``depth``). Free function so callers
    outside a module scope (feature extraction, shape probing) can build
    unparented instances. ``fold_bn`` serves conv backbones with BN
    folded into the conv kernels (inference-only): the inline ResNet3D
    plus the MedicalNet/Res2Net registry families; the LayerNorm-based
    families (swin/unetr) have nothing to fold and ignore it."""
    from otfusion_tpu.models.registry import build_backbone, fold_bn_supported

    if not spec:
        return ResNet3DBackbone(depth, remat=remat, s2d_stem=s2d_stem,
                                fold_bn=fold_bn, dtype=dtype, name=name)
    if fold_bn and fold_bn_supported(spec):
        return build_backbone(spec, dtype=dtype, name=name, fold_bn=True)
    return build_backbone(spec, dtype=dtype, name=name)


class MultimodalOTFusion(nn.Module):
    """Dual-backbone OT fusion classifier. See module docstring."""

    num_classes: int = 2
    depth: int = 50
    projection_dropout: float = 0.3
    variant: str = "per_epoch_attn"  # "per_epoch_attn" | "base" | "mmfusion"
    # Heterogeneous backbones (BASELINE.json config 5): any registry name
    # ("swin_base_384", "unetr_vit", "medicalnet-10", ...). Empty = the
    # reference's dual ResNet3D(depth). Feature dims may differ between
    # modalities — the OT feature plan Tv is (d_pet, d_mri) and every
    # attention token lives in MRI space, so nothing requires equal dims.
    mri_backbone: str = ""
    pet_backbone: str = ""
    # gradient checkpointing for the default ResNet3D backbones
    remat: bool = False
    # space-to-depth stem for the default ResNet3D backbones (exact
    # weight-space equivalent of the plain stem; see resnet3d.py)
    s2d_stem: bool = False
    # Strict reproduction of the reference flagship's plan application:
    # the raw, un-normalised ``pet_feat @ T.t()`` (attn:728) — an
    # axis-mixing matmul that only type-checks because d_pet == d_mri in
    # the reference. Default False uses the column-normalised barycentric
    # projection (the common intent of both reference variants; see
    # ops/fot.py:apply_feature_coupling and PARITY.md §"behavioural
    # deviations").
    raw_plan: bool = False
    # inference-only BN folding for the default ResNet3D backbones (see
    # resnet3d.py:_ConvBN.fold_bn)
    fold_bn: bool = False
    dtype: Any = jnp.float32

    def _make_backbone(self, name_attr: str, module_name: str):
        return build_fusion_backbone(
            getattr(self, name_attr), self.depth, self.dtype,
            name=module_name, remat=self.remat, s2d_stem=self.s2d_stem,
            fold_bn=self.fold_bn,
        )

    @nn.compact
    def __call__(self, mri, pet, t_feature=None, train: bool = False):
        """Args:
          mri, pet: (B, D, H, W, 1) volumes (or (B, H, W, C) images for 2D
            backbones such as Swin).
          t_feature: (d_pet, d_mri) feature coupling Tv (required for
            "per_epoch_attn", optional for "base", unused for "mmfusion").
        Returns a dict of logits and intermediate features.
        """
        mri_feat = self._make_backbone("mri_backbone", "mri_backbone")(
            mri, train)
        pet_feat = self._make_backbone("pet_backbone", "pet_backbone")(
            pet, train)
        if isinstance(mri_feat, tuple):  # Swin returns (tokens, pooled)
            mri_feat = mri_feat[1]
        if isinstance(pet_feat, tuple):
            pet_feat = pet_feat[1]
        d_mri = mri_feat.shape[-1]
        d_pet = pet_feat.shape[-1]

        mri_to_pet = _ProjectionMLP(d_pet, self.projection_dropout,
                                    self.dtype, name="mri2pet")(mri_feat,
                                                                train)
        pet_to_mri = _ProjectionMLP(d_mri, self.projection_dropout,
                                    self.dtype, name="pet2mri")(pet_feat,
                                                                train)

        mri_fused = _FusionMLP(d_mri, self.projection_dropout, self.dtype,
                               name="mri_fusion")(
            jnp.concatenate([mri_feat, mri_to_pet], axis=1), train)
        pet_fused = _FusionMLP(d_pet, self.projection_dropout, self.dtype,
                               name="pet_fusion")(
            jnp.concatenate([pet_feat, pet_to_mri], axis=1), train)

        attention = SelfAttentionBlock(embed_dim=d_mri, num_heads=8,
                                       ff_dim=d_mri,
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
            if self.raw_plan:
                ot_mri_from_pet = pet_feat @ jnp.asarray(
                    t_feature, pet_feat.dtype).T
            else:
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
