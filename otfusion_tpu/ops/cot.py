"""Labeled CO-Optimal Transport (COOT-L).

Rebuilds ``cotl_numpy`` (reference perturbot/match/cot_labels.py:14-227):
joint BCD over per-label *sample* couplings Ts^k and one shared *feature*
coupling Tv —

  repeat:  for each label k:  M_s^k = constC_s^k - 2 X_k Tv Y_k^T
                              Ts^k  = OT(M_s^k, w1_k, w2_k)
           M_v = sum_k (constC_v^k - 2 X_k^T Ts^k Y_k)
           Tv  = OT(M_v, v1, v2)
  until ||dTs|| + ||dTv|| < 1e-16 or |dcost| < 1e-7.

TPU-native shape: labels are padded to a static cap and the per-label
sample solves run as one vmapped Sinkhorn; the whole BCD is a
``lax.while_loop``. Reference quirks preserved: data-driven feature
marginals when features are non-negative (cot_labels.py:112-122), Tv
renormalised to mass 1 each iteration (:205-206). The reference's "emd"
mode is available host-side via ops.emd; on device the entropic
("sinkhorn") mode is the production path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from otfusion_tpu.ops.sinkhorn import sinkhorn


class COTLResult(NamedTuple):
    sample_couplings: jnp.ndarray  # (L, n_cap, m_cap)
    feature_coupling: jnp.ndarray  # (d, d')
    cost: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray


def cotl(
    x: jnp.ndarray,            # (L, n_cap, d) zero-padded
    y: jnp.ndarray,            # (L, m_cap, d')
    x_mask: jnp.ndarray,       # (L, n_cap)
    y_mask: jnp.ndarray,       # (L, m_cap)
    *,
    epsilon: float = 0.2,
    feature_epsilon: float | None = None,
    niter: int = 100,
    sinkhorn_max_iterations: int = 2000,
    sinkhorn_threshold: float = 1e-3,
    data_driven_feature_marginals: bool = True,
) -> COTLResult:
    x = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(x, jnp.float32)))
    y = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(y, jnp.float32)))
    x_mask = x_mask.astype(bool)
    y_mask = y_mask.astype(bool)
    x = jnp.where(x_mask[..., None], x, 0.0)
    y = jnp.where(y_mask[..., None], y, 0.0)
    n_labels, n_cap, d = x.shape
    m_cap, dp = y.shape[1], y.shape[2]
    feat_eps = epsilon if feature_epsilon is None else feature_epsilon

    # Per-label uniform sample weights over valid rows.
    w1 = x_mask / jnp.maximum(x_mask.sum(1, keepdims=True), 1)
    w2 = y_mask / jnp.maximum(y_mask.sum(1, keepdims=True), 1)

    # Feature marginals (cot_labels.py:112-122): normalised column sums
    # for non-negative data, else uniform.
    x_flat = x.reshape(-1, d)
    y_flat = y.reshape(-1, dp)
    if data_driven_feature_marginals:
        v1 = jnp.where(
            jnp.all(x_flat >= 0),
            x_flat.sum(0) / jnp.maximum(x_flat.sum(), 1e-30),
            jnp.full((d,), 1.0 / d),
        )
        v2 = jnp.where(
            jnp.all(y_flat >= 0),
            y_flat.sum(0) / jnp.maximum(y_flat.sum(), 1e-30),
            jnp.full((dp,), 1.0 / dp),
        )
    else:
        v1 = jnp.full((d,), 1.0 / d)
        v2 = jnp.full((dp,), 1.0 / dp)

    # Constant parts of the two cost families (init_matrix_np).
    const_s = (
        jnp.einsum("lnd,d->ln", x * x, v1)[:, :, None]
        + jnp.einsum("lme,e->lm", y * y, v2)[:, None, :]
    )  # (L, n, m)

    def const_v(ts):
        wx = jnp.sum(ts, axis=2)  # (L, n)
        wy = jnp.sum(ts, axis=1)  # (L, m)
        return (
            jnp.einsum("lnd,ln->d", x * x, wx)[:, None]
            + jnp.einsum("lme,lm->e", y * y, wy)[None, :]
        )

    def sample_solve(m_cost, w1k, w2k, xm, ym):
        return sinkhorn(
            m_cost, w1k, w2k,
            epsilon=epsilon, max_iterations=sinkhorn_max_iterations,
            threshold=sinkhorn_threshold, scale_cost=True,
            row_mask=xm, col_mask=ym,
        ).coupling

    vmapped_sample_solve = jax.vmap(sample_solve)

    ts0 = (w1[:, :, None] * w2[:, None, :])
    tv0 = jnp.full((d, dp), 1.0 / (d * dp))

    def body(carry):
        ts, tv, cost, _, it = carry
        # Sample stage: per-label linearised cost given Tv.
        m_s = const_s - 2.0 * jnp.einsum("lnd,de,lme->lnm", x, tv, y)
        ts_new = vmapped_sample_solve(m_s, w1, w2, x_mask, y_mask)
        # Feature stage: shared cost summed over labels.
        m_v = const_v(ts_new) - 2.0 * jnp.einsum(
            "lnd,lnm,lme->de", x, ts_new, y
        )
        tv_new = sinkhorn(
            m_v, v1, v2,
            epsilon=feat_eps, max_iterations=sinkhorn_max_iterations,
            threshold=sinkhorn_threshold, scale_cost=True,
        ).coupling
        tv_new = tv_new / jnp.maximum(jnp.sum(tv_new), 1e-30)
        new_cost = jnp.sum(m_v * tv_new)
        delta = jnp.linalg.norm(ts_new - ts) + jnp.linalg.norm(tv_new - tv)
        converged = jnp.logical_or(
            delta < 1e-16, jnp.abs(cost - new_cost) < 1e-7
        )
        return ts_new, tv_new, new_cost, converged, it + 1

    def cond(carry):
        _, _, _, converged, it = carry
        return jnp.logical_and(it < niter, jnp.logical_not(converged))

    ts, tv, cost, converged, n_iters = jax.lax.while_loop(
        cond, body,
        (ts0, tv0, jnp.float32(jnp.inf), jnp.asarray(False), jnp.int32(0)),
    )
    return COTLResult(ts, tv, cost, n_iters, converged)
