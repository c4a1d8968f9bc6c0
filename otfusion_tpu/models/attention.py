"""Transformer-encoder fusion block.

Parity target: the reference's ``SelfAttentionBlock``
(MRI_PET_OT_OT_per_epoch_attn.py:546-607 — defined twice there, identical;
the duplicate is a reference quirk we do not replicate). Post-norm
encoder: MHA + residual + LayerNorm, ReLU-MLP + residual + LayerNorm,
dropout 0.1 on attention weights and both residual branches.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SelfAttentionBlock(nn.Module):
    embed_dim: int = 2048
    num_heads: int = 8
    ff_dim: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, train: bool = False):
        """tokens: (batch, seq, embed) — note the reference uses
        (seq, batch, embed); we use batch-first, XLA's preferred layout."""
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
        )(tokens, tokens)
        x = tokens + nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(dtype=jnp.float32)(x)

        h = nn.Dense(self.ff_dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(dtype=jnp.float32)(x)
