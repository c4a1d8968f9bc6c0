"""Entropic Gromov-Wasserstein on TPU.

Rebuilds the sample-coupling stage of the reference pipeline: per-label
entropic GW between MRI and PET feature clouds, previously solved by OTT on
CPU-pinned JAX (``get_coupling_egw_ott_fixed``,
MRI_PET_OT_OT_per_epoch_attn.py:129-187; per-label stock-OTT loop in
perturbot/match/ott_egwl.py:129-206).

Algorithm (Peyré/Cuturi/Solomon 2016 factorisation for the squared loss,
the same decomposition the reference's ``init_matrix_np`` encodes,
perturbot/match/utils.py:125-184):

  Cx = ||x_i - x_j||^2 / max     (OTT PointCloud + scale_cost="max_cost")
  Cy likewise
  constC = (Cx^2 p) 1^T + 1 (q^T Cy^2)
  T_0 = p q^T
  repeat:  M(T) = constC - 2 Cx T Cy^T        (linearised cost)
           T    = Sinkhorn(M, p, q, epsilon)
  until ||T - T_prev||_F < tol or max outer iterations.

The label constraint of the vendored-OTT fork (block-diagonal coupling,
ott_egwl.py:89-96 — the fork itself is absent from the reference tree) is
realised natively by solving the per-label problems *batched*: groups are
padded to a static cap and vmapped, so the whole per-label family is one
XLA computation on the MXU instead of a Python loop of CPU solves.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from otfusion_tpu.ops.costs import pairwise_sq_euclidean, scale_by_max
from otfusion_tpu.ops.sinkhorn import _masked_log_weights, sinkhorn


_STALL_PATIENCE = 25
_NEG_INF = -1e30


def _egw_warm_loop(
    linearized_cost,
    pair_mask,
    p_w,
    q_w,
    log_p,
    log_q,
    epsilon,
    max_iterations,
    threshold,
    inner_sweeps,
    t0,
):
    """Warm-started entropic-GW linearisation loop.

    Classical one-loop entropic GW: each outer iteration re-linearises the
    quadratic cost and runs a FIXED number of log-domain Sinkhorn sweeps
    from the previous iteration's dual potentials (warm start) instead of
    a cold full inner solve. Convergence is controlled at this level — the
    relative plan change with stall detection (the fp32 error floor
    otherwise burns the full 2000-iteration reference budget; observed on
    real cohorts: one label converges in ~60 iterations, the other
    plateaus and spins to the cap). The warm start removes the nested
    while_loop whose per-iteration machinery dominated the original
    formulation (measured 0.75 ms/outer-iteration vs 0.11 ms for the
    arithmetic itself on a 64x64 problem).
    """
    from otfusion_tpu.ops.sinkhorn import log_sinkhorn_sweeps

    eps = jnp.float32(epsilon)

    def masked(mat):
        return jnp.where(pair_mask, mat, -_NEG_INF) if pair_mask is not None else mat

    def plan(f, g, m_cost):
        t = jnp.exp((f[:, None] + g[None, :] - m_cost) / eps)
        if pair_mask is not None:
            t = jnp.where(pair_mask, t, 0.0)
        return t

    # Data-dependent while_loop iterations cost ~1 ms of unfused dispatch
    # each on the tunneled backend (fori_loop bodies fuse to ~20 us), so
    # each while iteration runs OUTER_UNROLL linearisations in a fori_loop
    # and checks convergence once.
    OUTER_UNROLL = 8

    def cond(carry):
        _, _, _, err, it, _, stall = carry
        return jnp.logical_and(
            jnp.logical_and(it < max_iterations, err > threshold),
            stall < _STALL_PATIENCE,
        )

    def micro(_, tfg):
        t, f, g = tfg
        m_cost = masked(linearized_cost(t))
        f, g = log_sinkhorn_sweeps(m_cost, log_p, log_q, eps, f, g,
                                   inner_sweeps)
        return plan(f, g, m_cost), f, g

    def body(carry):
        t, f, g, _, it, best_err, stall = carry
        t_new, f, g = jax.lax.fori_loop(0, OUTER_UNROLL, micro, (t, f, g))
        err = jnp.linalg.norm(t_new - t) / jnp.maximum(
            jnp.linalg.norm(t_new), 1e-30
        )
        improved = err < 0.999 * best_err
        best_err = jnp.minimum(best_err, err)
        stall = jnp.where(improved, 0, stall + 1)
        return t_new, f, g, err, it + OUTER_UNROLL, best_err, stall

    n, m = t0.shape
    f0 = jnp.zeros((n,), jnp.float32)
    g0 = jnp.zeros((m,), jnp.float32)
    t, f, g, err, n_iters, _, _ = jax.lax.while_loop(
        cond, body,
        (t0, f0, g0, jnp.float32(jnp.inf), jnp.int32(0),
         jnp.float32(jnp.inf), jnp.int32(0)),
    )
    # final-marginal check stands in for the inner-solver convergence flag
    row_err = jnp.sum(jnp.abs(jnp.sum(t, axis=1) - p_w))
    return t, err, n_iters, row_err


class GWResult(NamedTuple):
    """Solution of an entropic GW problem (or a vmapped batch of them)."""

    coupling: jnp.ndarray
    n_iters: jnp.ndarray          # outer (linearisation) iterations
    converged: jnp.ndarray        # outer loop converged
    linear_converged: jnp.ndarray  # last inner Sinkhorn converged
    cost: jnp.ndarray             # entropic-free GW objective <M(T), T>
    err: jnp.ndarray              # final ||T - T_prev||_F


def entropic_gw(
    x: jnp.ndarray,
    y: jnp.ndarray,
    *,
    epsilon: float = 5e-3,
    max_iterations: int = 2000,
    sinkhorn_max_iterations: int = 2000,
    threshold: float = 1e-3,
    sinkhorn_threshold: float = 1e-3,
    inner_sweeps: int = 10,
    x_mask: jnp.ndarray | None = None,
    y_mask: jnp.ndarray | None = None,
) -> GWResult:
    """Entropic GW between point clouds ``x`` (n, d) and ``y`` (m, d').

    Outer convergence is *relative*: ``||T - T_prev||_F / ||T||_F <
    threshold`` (OTT's GW threshold semantics; an absolute criterion
    below ~1e-5 sits under the fp32 floor and burns the full iteration
    budget without converging). Quantified against a float64
    reference-settings run on production-shaped 64x2048 clouds
    (docs/gw_early_exit.md, `scripts/quantify_gw_early_exit.py`):
    plan L1 distance <= 2.6e-3, |d diag-frac| <= 1.7e-4,
    |d FOSCTTM| <= 2.5e-4 — metrically indistinguishable.

    ``epsilon`` is relative to the max-scaled self-cost matrices, matching
    the reference's OTT setup (scale_cost="max_cost", eps default 5e-3,
    2000 outer / 2000 Sinkhorn iteration caps —
    MRI_PET_OT_OT_per_epoch_attn.py:168-177). In the warm-start
    formulation the inner solver runs ``inner_sweeps`` sweeps per
    linearisation; ``sinkhorn_max_iterations`` (kept for reference flag
    parity) caps that: effective sweeps = min(inner_sweeps,
    sinkhorn_max_iterations).

    Masks mark valid rows for padded fixed-shape batching; padded entries
    carry zero marginal mass and end with zero coupling mass.
    """
    x = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(x, jnp.float32)))
    y = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(y, jnp.float32)))
    n, m = x.shape[0], y.shape[0]
    xm = jnp.ones((n,), bool) if x_mask is None else x_mask.astype(bool)
    ym = jnp.ones((m,), bool) if y_mask is None else y_mask.astype(bool)

    # Self-cost matrices are translation invariant; centering the clouds
    # before the Gram expansion removes the catastrophic cancellation that
    # fp32 suffers for clouds far from the origin.
    x = x - jnp.sum(jnp.where(xm[:, None], x, 0.0), axis=0) / jnp.maximum(
        jnp.sum(xm), 1
    )
    y = y - jnp.sum(jnp.where(ym[:, None], y, 0.0), axis=0) / jnp.maximum(
        jnp.sum(ym), 1
    )

    cx, _ = scale_by_max(pairwise_sq_euclidean(x, x), xm[:, None] & xm[None, :])
    cy, _ = scale_by_max(pairwise_sq_euclidean(y, y), ym[:, None] & ym[None, :])
    cx = jnp.where(xm[:, None] & xm[None, :], cx, 0.0)
    cy = jnp.where(ym[:, None] & ym[None, :], cy, 0.0)

    p = jnp.where(xm, 1.0 / jnp.maximum(jnp.sum(xm), 1), 0.0)
    q = jnp.where(ym, 1.0 / jnp.maximum(jnp.sum(ym), 1), 0.0)

    const_c = ((cx * cx) @ p)[:, None] + ((cy * cy) @ q)[None, :]

    def linearized_cost(t):
        return const_c - 2.0 * cx @ (t @ cy.T)

    pair_mask = xm[:, None] & ym[None, :]
    _, log_p = _masked_log_weights(None, xm, n)
    _, log_q = _masked_log_weights(None, ym, m)

    t0 = p[:, None] * q[None, :]
    t, err, n_iters, row_err = _egw_warm_loop(
        linearized_cost, pair_mask, p, q, log_p, log_q,
        epsilon, max_iterations, threshold,
        min(inner_sweeps, sinkhorn_max_iterations), t0,
    )
    gw_cost = jnp.sum(linearized_cost(t) * t)
    return GWResult(
        coupling=t,
        n_iters=n_iters,
        converged=err <= threshold,
        linear_converged=row_err <= sinkhorn_threshold,
        cost=gw_cost,
        err=err,
    )


def entropic_gw_labels(
    x: jnp.ndarray,
    y: jnp.ndarray,
    labels_x: jnp.ndarray,
    labels_y: jnp.ndarray,
    *,
    epsilon: float = 5e-3,
    max_iterations: int = 2000,
    sinkhorn_max_iterations: int = 2000,
    threshold: float = 1e-3,
    sinkhorn_threshold: float = 1e-3,
    inner_sweeps: int = 10,
) -> GWResult:
    """Label-constrained global entropic GW (EGWL).

    One GW problem over the concatenated cohorts with the transport plan
    constrained to the block diagonal of matching labels — the native
    realisation of the missing vendored-OTT fork's ``labels_a`` /
    ``block_diag_mat`` kwargs (reference ott_egwl.py:25-126): the global
    self-cost geometries (max-scaled over ALL pairs) drive the
    linearisation, while off-block plan entries carry infinite cost.
    """
    x = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(x, jnp.float32)))
    y = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(y, jnp.float32)))
    n, m = x.shape[0], y.shape[0]
    plan_mask = labels_x[:, None] == labels_y[None, :]

    x = x - jnp.mean(x, axis=0)
    y = y - jnp.mean(y, axis=0)
    cx, _ = scale_by_max(pairwise_sq_euclidean(x, x))
    cy, _ = scale_by_max(pairwise_sq_euclidean(y, y))
    p = jnp.full((n,), 1.0 / n)
    q = jnp.full((m,), 1.0 / m)
    const_c = ((cx * cx) @ p)[:, None] + ((cy * cy) @ q)[None, :]

    _, log_p = _masked_log_weights(None, None, n)
    _, log_q = _masked_log_weights(None, None, m)

    t0 = jnp.where(plan_mask, p[:, None] * q[None, :], 0.0)
    t0 = t0 / jnp.maximum(jnp.sum(t0), 1e-30)
    t, err, n_iters, row_err = _egw_warm_loop(
        lambda tt: const_c - 2.0 * cx @ (tt @ cy.T),
        plan_mask, p, q, log_p, log_q,
        epsilon, max_iterations, threshold,
        min(inner_sweeps, sinkhorn_max_iterations), t0,
    )
    gw_cost = jnp.sum((const_c - 2.0 * cx @ (t @ cy.T)) * t)
    return GWResult(t, n_iters, err <= threshold,
                    row_err <= sinkhorn_threshold, gw_cost, err)


def egw_per_label(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: jnp.ndarray,
    y_mask: jnp.ndarray,
    *,
    epsilon: float = 5e-3,
    max_iterations: int = 2000,
    sinkhorn_max_iterations: int = 2000,
    threshold: float = 1e-3,
    sinkhorn_threshold: float = 1e-3,
) -> GWResult:
    """Batched per-label entropic GW (the live reference coupling path).

    Args:
      x: (L, n_cap, d) per-label source features, zero-padded to ``n_cap``.
      y: (L, m_cap, d') per-label target features.
      x_mask, y_mask: (L, n_cap) / (L, m_cap) validity masks.

    Equivalent to looping ``get_coupling_egw_ott_fixed`` over labels
    (reference MRI_PET_OT.py:68-122) but solved as ONE vmapped XLA program:
    all labels' GW linearisations and Sinkhorn sweeps run as batched
    matmuls on the MXU.
    """
    solver = jax.vmap(
        lambda xs, ys, xm, ym: entropic_gw(
            xs,
            ys,
            epsilon=epsilon,
            max_iterations=max_iterations,
            sinkhorn_max_iterations=sinkhorn_max_iterations,
            threshold=threshold,
            sinkhorn_threshold=sinkhorn_threshold,
            x_mask=xm,
            y_mask=ym,
        )
    )
    return solver(x, y, x_mask, y_mask)
