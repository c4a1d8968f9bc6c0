"""Log-domain entropic OT (Sinkhorn) solver, TPU-native.

This is the workhorse the whole framework leans on. The reference solves
entropic OT three ways — OTT's ``linear.solve`` inside FOT (fot.py:129-134),
OTT's Sinkhorn inside the GW loop (MRI_PET_OT_OT_per_epoch_attn.py:174-177),
and a NumPy kernel-domain scaler (perturbot/match/utils.py:6-115) — all
pinned to CPU. Here there is exactly one solver:

  * log-domain (logsumexp) updates — unconditionally stable, no NaN/inf dual
    blow-up rollback needed (the reference's utils.py:55-79 guards are moot);
  * static shapes + ``lax.while_loop`` — jit-compiles once, runs on TPU;
  * explicit row/column masks so variable-size per-label problems are padded
    to a static cap and batched with ``vmap`` (class imbalance 130 vs 229 in
    the ADNI cohort; reference caps at ``--max-jax-samples`` 64/label);
  * fp32 accumulators regardless of input dtype.

Couplings are treated as constants w.r.t. autodiff (``stop_gradient``),
matching the reference's ``.detach()`` semantics (MRI_PET_OT.py:667-668):
the OT plan shapes the loss but gradients do not flow through the solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from otfusion_tpu.ops.costs import scale_by_max

_NEG_INF = -1e30


class SinkhornResult(NamedTuple):
    """Solution of an entropic OT problem.

    Attributes:
      coupling: (n, m) transport plan; rows/cols marked invalid by the masks
        carry (numerically) zero mass.
      f, g: dual potentials, shapes (n,) and (m,).
      n_iters: number of Sinkhorn iterations executed.
      converged: whether the marginal error dropped below the threshold.
      err: final L1 deviation of the row marginal from ``p``.
      cost: transport cost <coupling, cost_matrix> on the *input* (unscaled)
        cost matrix.
    """

    coupling: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    n_iters: jnp.ndarray
    converged: jnp.ndarray
    err: jnp.ndarray
    cost: jnp.ndarray


def _masked_log_weights(
    w: jnp.ndarray | None, mask: jnp.ndarray | None, n: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (weights, log_weights) for a marginal, handling masks.

    With no explicit weights, the marginal is uniform over valid entries
    (reference always uses uniform marginals: fot.py:104-110,
    ott_egwl.py uniform defaults).
    """
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    mask = mask.astype(bool)
    if w is None:
        count = jnp.maximum(jnp.sum(mask), 1)
        w = jnp.where(mask, 1.0 / count, 0.0)
    else:
        w = jnp.where(mask, w, 0.0)
        total = jnp.maximum(jnp.sum(w), 1e-30)
        w = w / total
    log_w = jnp.where(mask, jnp.log(jnp.maximum(w, 1e-38)), _NEG_INF)
    return w, log_w


def log_sinkhorn_sweeps(
    cost: jnp.ndarray,
    log_p: jnp.ndarray,
    log_q: jnp.ndarray,
    epsilon: float,
    f: jnp.ndarray,
    g: jnp.ndarray,
    sweeps: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``sweeps`` paired log-domain updates from warm-start duals, no
    convergence checks — the building block for solvers that manage
    convergence at an outer level (entropic GW's linearisation loop).
    ``cost`` must already carry any masking (+inf on disallowed entries)
    and scaling; ``log_p``/``log_q`` likewise (-inf on padded entries)."""
    eps = jnp.float32(epsilon)
    neg_c = -cost / eps

    def sweep(_, fg):
        f_cur, g_cur = fg
        f_new = eps * (log_p - logsumexp(neg_c + g_cur[None, :] / eps,
                                         axis=1))
        g_new = eps * (log_q - logsumexp(neg_c + f_new[:, None] / eps,
                                         axis=0))
        return f_new, g_new

    return jax.lax.fori_loop(0, sweeps, sweep, (f, g))


def sinkhorn(
    cost: jnp.ndarray,
    p: jnp.ndarray | None = None,
    q: jnp.ndarray | None = None,
    *,
    epsilon: float = 1e-2,
    max_iterations: int = 2000,
    threshold: float = 1e-3,
    scale_cost: bool = False,
    row_mask: jnp.ndarray | None = None,
    col_mask: jnp.ndarray | None = None,
    plan_mask: jnp.ndarray | None = None,
    check_every: int = 5,
) -> SinkhornResult:
    """Solve entropic OT ``min_T <C, T> - eps*H(T)`` s.t. marginals (p, q).

    Args:
      cost: (n, m) cost matrix.
      p, q: optional marginals; default uniform over valid entries.
      epsilon: entropic regulariser. When ``scale_cost`` is True this is
        *relative to the max cost*, matching OTT ``scale_cost="max_cost"``
        as used by the reference (fot.py:131, ott_egwl.py:77).
      max_iterations: iteration cap (reference uses 2000 everywhere:
        fot.py:133, ott_egwl.py:101-102).
      threshold: L1 marginal-error stopping criterion (OTT default 1e-3).
      scale_cost: divide the cost by its (masked) max before solving.
      row_mask, col_mask: boolean validity masks for padded problems.
      plan_mask: optional (n, m) mask of *allowed* plan entries — the
        native realisation of the vendored-OTT fork's block-diagonal
        label constraint (reference ott_egwl.py:89-96): disallowed
        entries carry infinite cost, i.e. exactly zero mass.
      check_every: iterations between convergence checks (OTT's
        ``inner_iterations`` is 10). The marginal-error logsumexp costs
        as much as an update sweep, so checking every iteration is ~1.5x
        the work; the solve may overshoot by up to ``check_every - 1``
        harmless extra iterations.

    Returns a SinkhornResult. Differentiation does not flow through the
    solve (see module docstring).
    """
    cost = jax.lax.stop_gradient(jnp.asarray(cost, jnp.float32))
    n, m = cost.shape
    if row_mask is not None:
        row_mask = row_mask.astype(bool)
    if col_mask is not None:
        col_mask = col_mask.astype(bool)

    pair_mask = None
    if row_mask is not None or col_mask is not None or plan_mask is not None:
        rm = row_mask if row_mask is not None else jnp.ones((n,), bool)
        cm = col_mask if col_mask is not None else jnp.ones((m,), bool)
        pair_mask = rm[:, None] & cm[None, :]
        if plan_mask is not None:
            pair_mask = pair_mask & plan_mask.astype(bool)

    if scale_cost:
        cost_scaled, _ = scale_by_max(cost, pair_mask)
    else:
        cost_scaled = cost

    # Padded entries get a huge cost so their kernel weight is exactly zero.
    if pair_mask is not None:
        cost_scaled = jnp.where(pair_mask, cost_scaled, -_NEG_INF)

    p_w, log_p = _masked_log_weights(p, row_mask, n)
    q_w, log_q = _masked_log_weights(q, col_mask, m)

    eps = jnp.float32(epsilon)
    neg_c = -cost_scaled / eps  # (n, m), reused every iteration

    def update_f(g):
        # f_i = eps * (log p_i - lse_j((g_j - C_ij)/eps))
        lse = logsumexp(neg_c + g[None, :] / eps, axis=1)
        return eps * (log_p - lse)

    def update_g(f):
        lse = logsumexp(neg_c + f[:, None] / eps, axis=0)
        return eps * (log_q - lse)

    def marginal_err(f, g):
        log_t = neg_c + f[:, None] / eps + g[None, :] / eps
        row_marg = jnp.exp(logsumexp(log_t, axis=1))
        return jnp.sum(jnp.abs(row_marg - p_w))

    def cond(carry):
        _, _, err, it = carry
        return jnp.logical_and(it < max_iterations, err > threshold)

    def body(carry):
        f, g, _, it = carry

        def sweep(_, fg):
            f_new = update_f(fg[1])
            return f_new, update_g(f_new)

        f, g = jax.lax.fori_loop(0, check_every, sweep, (f, g))
        err = marginal_err(f, g)
        return f, g, err, it + check_every

    g0 = jnp.zeros((m,), jnp.float32)
    f0 = update_f(g0)
    g0 = update_g(f0)
    err0 = marginal_err(f0, g0)
    f, g, err, n_iters = jax.lax.while_loop(cond, body, (f0, g0, err0, jnp.int32(1)))

    log_t = neg_c + f[:, None] / eps + g[None, :] / eps
    coupling = jnp.exp(log_t)
    if pair_mask is not None:
        coupling = jnp.where(pair_mask, coupling, 0.0)
    transport_cost = jnp.sum(coupling * jnp.where(
        pair_mask, cost, 0.0) if pair_mask is not None else coupling * cost)

    return SinkhornResult(
        coupling=coupling,
        f=f,
        g=g,
        n_iters=n_iters,
        converged=err <= threshold,
        err=err,
        cost=transport_cost,
    )
