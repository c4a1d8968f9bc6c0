"""Cost-matrix construction for OT solvers.

Mirrors the semantics the reference relies on from OTT geometries:
  * squared-Euclidean point-cloud costs (OTT ``PointCloud`` default), used by
    the per-label entropic GW path (reference
    MRI_PET_OT_OT_per_epoch_attn.py:156-157);
  * ``scale_cost="max_cost"`` normalisation — the cost matrix is divided by
    its maximum so the entropic epsilon is *relative to the max cost*
    (reference fot.py:131, ott_egwl.py:77-79).

All functions are shape-static and jit/vmap-safe; padding is handled with
explicit boolean masks rather than dynamic shapes (TPU/XLA requirement).
"""

from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -1e30


def pairwise_sq_euclidean(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared Euclidean cost ``C[i, j] = ||x_i - y_j||^2``.

    Computed via the Gram-matrix expansion so the inner contraction runs on
    the MXU (one big matmul) instead of a broadcasted subtract that would
    materialise an (n, m, d) intermediate in HBM.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    x_sq = jnp.sum(x * x, axis=-1)
    y_sq = jnp.sum(y * y, axis=-1)
    cross = x @ y.T
    cost = x_sq[:, None] + y_sq[None, :] - 2.0 * cross
    # Gram expansion can go slightly negative from rounding; clamp like OTT.
    return jnp.maximum(cost, 0.0)


def masked_max(values: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Max over entries where ``mask`` is True (all entries if mask is None)."""
    if mask is None:
        return jnp.max(values)
    return jnp.max(jnp.where(mask, values, _NEG_INF))


def scale_by_max(
    cost: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    eps_floor: float = 1e-12,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Divide ``cost`` by its (masked) max — OTT's ``scale_cost="max_cost"``.

    Returns ``(scaled_cost, scale)`` where ``scale`` is the divisor used, so
    callers can report unscaled objective values. Degenerate all-zero costs
    divide by 1 instead of 0.
    """
    m = masked_max(cost, mask)
    scale = jnp.where(m > eps_floor, m, 1.0)
    return cost / scale, scale
