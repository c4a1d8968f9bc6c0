"""UNETR-style 3D ViT feature encoder (reference Models/unetr.py).

The reference wraps MONAI's UNETR ViT (in_channels 1, img 96^3, patch
16^3 -> 216 tokens, hidden 768, 12 layers, 12 heads, perceptron patch
embedding) and pools the final token sequence: LayerNorm -> transpose ->
AdaptiveAvgPool1d over the 216 tokens -> 768-dim feature
(UNETR_base_3DNet, Models/unetr.py:22-45). Rebuilt as a standard Flax
ViT: flattened-patch linear embedding ("perceptron"), learned positional
embeddings, pre-norm transformer blocks (remat-able for memory), mean
token pooling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # Pre-norms emit the compute dtype (stats/params stay f32 in
        # flax); only the final output LayerNorm below pins f32.
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout,
            deterministic=not train, dtype=self.dtype,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(int(self.hidden * self.mlp_ratio), dtype=self.dtype)(h)
        # exact (erf) GELU = MONAI MLPBlock's torch nn.GELU default (the
        # convention UNETR_model_best_acc.pth was trained under); flax's
        # tanh approximation drifts ~1e-3/block vs imported weights
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        return x + h


class UNETRViTEncoder(nn.Module):
    """3D patch ViT; returns the pooled 768-dim feature."""

    hidden: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    dropout: float = 0.0
    remat: bool = False
    # parity with UNETR_base_3DNet's (tokens, pooled) return
    # (Models/unetr.py:36-45)
    return_tokens: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, d, h, w, c = x.shape
        p = self.patch_size
        if d % p or h % p or w % p:
            raise ValueError(
                f"volume {(d, h, w)} not divisible by patch size {p}")
        x = x.astype(self.dtype)
        # Perceptron patch embedding: flatten each p^3 patch, one Dense.
        x = x.reshape(b, d // p, p, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, (d // p) * (h // p) * (w // p), p * p * p * c)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="patch_embed")(x)

        n_tokens = x.shape[1]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, n_tokens, self.hidden), jnp.float32,
        )
        x = x + pos.astype(self.dtype)

        block = ViTBlock
        if self.remat:
            block = nn.remat(ViTBlock, static_argnums=(2,))
        for i in range(self.layers):
            x = block(self.hidden, self.heads, dropout=self.dropout,
                      dtype=self.dtype, name=f"block_{i}")(x, train)

        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(x)
        pooled = jnp.mean(x, axis=1).astype(jnp.float32)
        if self.return_tokens:
            return x.astype(jnp.float32), pooled
        return pooled
