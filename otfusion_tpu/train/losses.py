"""Loss functions (reference parity: CE + cosine OT alignment)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy with integer labels
    (reference nn.CrossEntropyLoss, MRI_PET_OT.py:628)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def cosine_alignment_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """``1 - mean(cos_sim(x_i, y_i))`` over rows, with the reference's
    NaN->0 guard (cosine_loss, MRI_PET_OT_OT_per_epoch_attn.py:576-585 and
    the NaN guard at :751-752)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-12)
    loss = 1.0 - jnp.mean(jnp.sum(xn * yn, axis=1))
    return jnp.nan_to_num(loss, nan=0.0)
