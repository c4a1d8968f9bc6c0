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
from otfusion_tpu.ops.sinkhorn import sinkhorn


_STALL_PATIENCE = 25


def _gw_outer_loop(solve_linear, t0, max_iterations, threshold):
    """Shared GW linearisation loop with convergence + stall detection.

    Stops when the relative plan change drops below ``threshold`` OR when
    it has not improved its best value for _STALL_PATIENCE consecutive
    iterations — the fp32 error floor otherwise burns the full 2000-
    iteration reference budget doing nothing (observed on real cohorts:
    one label converges in ~60 iterations, the other plateaus ~2e-3 and
    spins to the cap)."""
    import jax as _jax
    import jax.numpy as _jnp

    def cond(carry):
        _, err, it, _, _, stall = carry
        return _jnp.logical_and(
            _jnp.logical_and(it < max_iterations, err > threshold),
            stall < _STALL_PATIENCE,
        )

    def body(carry):
        t, _, it, _, best_err, stall = carry
        res = solve_linear(t)
        err = _jnp.linalg.norm(res.coupling - t) / _jnp.maximum(
            _jnp.linalg.norm(res.coupling), 1e-30
        )
        improved = err < 0.999 * best_err
        best_err = _jnp.minimum(best_err, err)
        stall = _jnp.where(improved, 0, stall + 1)
        return res.coupling, err, it + 1, res.converged, best_err, stall

    t, err, n_iters, lin_conv, _, _ = _jax.lax.while_loop(
        cond, body,
        (t0, _jnp.float32(_jnp.inf), _jnp.int32(0), _jnp.asarray(False),
         _jnp.float32(_jnp.inf), _jnp.int32(0)),
    )
    return t, err, n_iters, lin_conv


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
    x_mask: jnp.ndarray | None = None,
    y_mask: jnp.ndarray | None = None,
) -> GWResult:
    """Entropic GW between point clouds ``x`` (n, d) and ``y`` (m, d').

    Outer convergence is *relative*: ``||T - T_prev||_F / ||T||_F <
    threshold`` (OTT's GW threshold semantics; an absolute criterion
    below ~1e-5 sits under the fp32 floor and burns the full iteration
    budget without converging).

    ``epsilon`` is relative to the max-scaled self-cost matrices, matching
    the reference's OTT setup (scale_cost="max_cost", eps default 5e-3,
    2000 outer / 2000 Sinkhorn iteration caps —
    MRI_PET_OT_OT_per_epoch_attn.py:168-177).

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

    def solve_linear(t):
        return sinkhorn(
            linearized_cost(t),
            p,
            q,
            epsilon=epsilon,
            max_iterations=sinkhorn_max_iterations,
            threshold=sinkhorn_threshold,
            row_mask=xm,
            col_mask=ym,
        )

    t0 = p[:, None] * q[None, :]
    t, err, n_iters, lin_conv = _gw_outer_loop(
        solve_linear, t0, max_iterations, threshold
    )
    gw_cost = jnp.sum(linearized_cost(t) * t)
    return GWResult(
        coupling=t,
        n_iters=n_iters,
        converged=err <= threshold,
        linear_converged=lin_conv,
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

    def solve_linear(t):
        return sinkhorn(
            const_c - 2.0 * cx @ (t @ cy.T),
            p, q,
            epsilon=epsilon,
            max_iterations=sinkhorn_max_iterations,
            threshold=sinkhorn_threshold,
            plan_mask=plan_mask,
        )

    t0 = jnp.where(plan_mask, p[:, None] * q[None, :], 0.0)
    t0 = t0 / jnp.maximum(jnp.sum(t0), 1e-30)
    t, err, n_iters, lin_conv = _gw_outer_loop(
        solve_linear, t0, max_iterations, threshold
    )
    gw_cost = jnp.sum((const_c - 2.0 * cx @ (t @ cy.T)) * t)
    return GWResult(t, n_iters, err <= threshold, lin_conv, gw_cost, err)


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
