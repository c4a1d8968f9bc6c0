"""Legacy RIMA fusion model (reference Multi_ResNet,
baseline_models_fusion.py:95-264): Res2Net-50 2D fundus encoder (2048-d)
+ MedicalNet-10 3D OCT encoder (512*D'-d; 6144 at 96^3 inputs),
bidirectional OT alignment, 3-token fundus attention, concat classifier.

The per-batch OT machinery (bidirectional label-constrained EGW,
multinomial partner sampling, FOT feature plan) lives in
otfusion_tpu.train.legacy_steps — inside the jitted train step instead of
the reference's per-batch GPU->CPU->JAX round-trip
(baseline_models_fusion.py:139-196).

Normalised reference quirk: the reference applies its projection heads to
label-grouped (reordered) features during training while fusing them with
batch-ordered encoder outputs (:141-196 vs :218-224); here projections are
applied batch-ordered everywhere (identical distribution, consistent
pairing — and it is what the reference's own eval path does, :209-216).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from otfusion_tpu.models.attention import SelfAttentionBlock
from otfusion_tpu.models.medicalnet import MedicalNetResNet
from otfusion_tpu.models.res2net import res2net50_v1b_26w_4s
from otfusion_tpu.ops.fot import apply_feature_coupling


def probe_oct_dim(oct_shape) -> int:
    """Abstractly evaluate the OCT encoder's feature width (512 * D') for
    a given input shape — the single source of truth for the encoder
    config that LegacyMultiModalFusion.setup instantiates (the trunk's
    ceil-mode strides make closed-form floor division wrong off multiples
    of 8)."""
    import jax

    probe = MedicalNetResNet(depth=10, shortcut_type="B", pool="hw")
    return jax.eval_shape(
        lambda x: probe.init_with_output(jax.random.key(0), x,
                                         train=False)[0],
        jnp.zeros((1, *oct_shape, 1), jnp.float32),
    ).shape[-1]


class LegacyMultiModalFusion(nn.Module):
    """Fundus(2D) + OCT(3D) OT fusion classifier."""

    num_classes: int = 2
    oct_feature_dim: int = 6144   # 512 * D' (D'=12 for 96^3 inputs)
    fundus_feature_dim: int = 2048
    dtype: Any = jnp.float32

    def setup(self):
        self.fundus_encoder = res2net50_v1b_26w_4s(dtype=self.dtype)
        self.oct_encoder = MedicalNetResNet(
            depth=10, shortcut_type="B", pool="hw", dtype=self.dtype
        )
        d_f, d_o = self.fundus_feature_dim, self.oct_feature_dim
        self.fundus2oct = [
            nn.Dense(4096, dtype=self.dtype),
            nn.Dense(d_o, dtype=self.dtype),
        ]
        self.oct2fundus = [
            nn.Dense(4096, dtype=self.dtype),
            nn.Dense(d_f, dtype=self.dtype),
        ]
        self.oct_fusion = [
            nn.Dense(d_o, dtype=self.dtype),
            nn.Dense(d_o, dtype=self.dtype),
        ]
        self.attention_fundus = SelfAttentionBlock(
            embed_dim=d_f, num_heads=4, ff_dim=d_f, dropout=0.1,
            dtype=self.dtype,
        )
        self.fc = nn.Dense(self.num_classes)
        self.drop = nn.Dropout(0.3)

    def _mlp(self, layers, x, train):
        x = layers[0](x)
        x = nn.relu(x)
        x = self.drop(x, deterministic=not train)
        return layers[1](x)

    def encode(self, fundus, oct_vol, train: bool = False):
        """fundus (B, H, W, 3) -> (B, 2048); oct (B, D, H, W, 1) -> (B, d_o)."""
        f = self.fundus_encoder(fundus, train)
        o = self.oct_encoder(oct_vol, train)
        if o.shape[-1] != self.oct_feature_dim:
            raise ValueError(
                f"OCT encoder produced {o.shape[-1]}-d features; expected "
                f"{self.oct_feature_dim} (input depth must give "
                f"512*D' = oct_feature_dim)")
        return f, o

    def project_fundus2oct(self, fundus_feat, train: bool = False):
        return self._mlp(self.fundus2oct, fundus_feat, train)

    def project_oct2fundus(self, oct_feat, train: bool = False):
        return self._mlp(self.oct2fundus, oct_feat, train)

    def fuse(self, fundus_feat, oct_feat, t_feature, train: bool = False,
             pred_oct=None, pred_fundus=None):
        """Classifier head given encoder features + OCT->fundus feature
        plan ``t_feature`` (d_oct, d_fundus). Projections may be passed in
        precomputed (the train step computes them once for the OT losses)
        or are computed here. Returns (logits, aux)."""
        if pred_oct is None:
            pred_oct = self.project_fundus2oct(fundus_feat, train)
        if pred_fundus is None:
            pred_fundus = self.project_oct2fundus(oct_feat, train)
        ot_fundus_from_oct = apply_feature_coupling(oct_feat, t_feature)

        oct_feature = self._mlp(
            self.oct_fusion,
            jnp.concatenate([oct_feat, pred_oct], axis=1),
            train,
        )
        tokens = jnp.stack(
            [fundus_feat, ot_fundus_from_oct, pred_fundus], axis=1
        )
        att = self.attention_fundus(tokens, train).mean(axis=1)
        logits = self.fc(jnp.concatenate([att, oct_feature], axis=1))
        return logits, {
            "pred_oct": pred_oct,
            "pred_fundus": pred_fundus,
            "ot_fundus_from_oct": ot_fundus_from_oct,
        }

    def __call__(self, fundus, oct_vol, t_feature, train: bool = False):
        fundus_feat, oct_feat = self.encode(fundus, oct_vol, train)
        logits, aux = self.fuse(fundus_feat, oct_feat, t_feature, train)
        return {
            "logits": logits,
            "fundus_feat": fundus_feat,
            "oct_feat": oct_feat,
            **aux,
        }
