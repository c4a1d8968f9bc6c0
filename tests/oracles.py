"""Independent NumPy oracles for OT solver tests.

These re-derive the textbook algorithms (Cuturi 2013 Sinkhorn; Peyré,
Cuturi & Solomon 2016 entropic GW; Redko et al. CO-Optimal Transport) in
float64 NumPy, structured differently from both the reference code and the
JAX implementations, to serve as golden values. The reference itself ships
no tests (SURVEY.md §4) — this battery replaces POT/OTT golden checks since
neither package is available in this image.
"""

from __future__ import annotations

import numpy as np


def sq_dists(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    diff = x[:, None, :] - y[None, :, :]
    return np.sum(diff * diff, axis=-1)


def sinkhorn_log_np(
    cost: np.ndarray,
    p: np.ndarray | None = None,
    q: np.ndarray | None = None,
    epsilon: float = 1e-2,
    max_iterations: int = 10000,
    threshold: float = 1e-9,
    scale_cost: bool = False,
) -> np.ndarray:
    """Float64 log-domain Sinkhorn, iterated to tight tolerance."""
    cost = np.asarray(cost, np.float64)
    n, m = cost.shape
    if p is None:
        p = np.full(n, 1.0 / n)
    if q is None:
        q = np.full(m, 1.0 / m)
    if scale_cost:
        mx = cost.max()
        if mx > 0:
            cost = cost / mx
    log_p, log_q = np.log(p), np.log(q)
    f = np.zeros(n)
    g = np.zeros(m)

    def lse(a, axis):
        mx = a.max(axis=axis, keepdims=True)
        return np.squeeze(mx, axis) + np.log(
            np.sum(np.exp(a - mx), axis=axis)
        )

    for _ in range(max_iterations):
        f_new = epsilon * (log_p - lse((g[None, :] - cost) / epsilon, 1))
        g_new = epsilon * (log_q - lse((f_new[:, None] - cost) / epsilon, 0))
        if np.max(np.abs(f_new - f)) < threshold:
            f, g = f_new, g_new
            break
        f, g = f_new, g_new
    return np.exp((f[:, None] + g[None, :] - cost) / epsilon)


def entropic_gw_np(
    x: np.ndarray,
    y: np.ndarray,
    epsilon: float = 5e-3,
    outer_iterations: int = 500,
    tol: float = 1e-8,
) -> np.ndarray:
    """Float64 entropic GW with max-scaled squared-Euclidean self-costs."""
    cx = sq_dists(x, x)
    cy = sq_dists(y, y)
    cx /= max(cx.max(), 1e-12)
    cy /= max(cy.max(), 1e-12)
    n, m = cx.shape[0], cy.shape[0]
    p = np.full(n, 1.0 / n)
    q = np.full(m, 1.0 / m)
    const_c = ((cx**2) @ p)[:, None] + ((cy**2) @ q)[None, :]
    t = np.outer(p, q)
    for _ in range(outer_iterations):
        m_cost = const_c - 2.0 * cx @ t @ cy.T
        t_new = sinkhorn_log_np(m_cost, p, q, epsilon=epsilon)
        if np.linalg.norm(t_new - t) < tol:
            t = t_new
            break
        t = t_new
    return t


def fot_np(
    x: np.ndarray,
    y: np.ndarray,
    ts: np.ndarray,
    epsilon: float = 5e-3,
) -> np.ndarray:
    """Float64 FOT feature coupling (single linear solve; see ops/fot.py)."""
    ts = ts / ts.sum()
    w_x = ts.sum(axis=1)
    w_y = ts.sum(axis=0)
    const_c = ((x**2).T @ w_x)[:, None] + ((y**2).T @ w_y)[None, :]
    m = const_c - 2.0 * x.T @ ts @ y
    d, dp = x.shape[1], y.shape[1]
    v1 = np.full(d, 1.0 / d)
    v2 = np.full(dp, 1.0 / dp)
    return sinkhorn_log_np(m, v1, v2, epsilon=epsilon, scale_cost=True)
