"""Property + golden tests for the log-domain Sinkhorn solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.ops import sinkhorn
from tests.oracles import sinkhorn_log_np, sq_dists


def test_marginals_satisfied(rng):
    x = rng.normal(size=(17, 5))
    y = rng.normal(size=(23, 5))
    cost = sq_dists(x, y)
    res = sinkhorn(cost, epsilon=0.05, scale_cost=True, max_iterations=5000,
                   threshold=1e-4)  # fp32 L1-marginal floor is ~3e-5 here
    t = np.asarray(res.coupling)
    assert bool(res.converged)
    np.testing.assert_allclose(t.sum(1), np.full(17, 1 / 17), atol=1e-4)
    np.testing.assert_allclose(t.sum(0), np.full(23, 1 / 23), atol=1e-4)


def test_matches_numpy_oracle(rng):
    cost = rng.uniform(size=(12, 12))
    res = sinkhorn(cost, epsilon=0.1, max_iterations=10000, threshold=1e-7)
    t_oracle = sinkhorn_log_np(cost, epsilon=0.1)
    np.testing.assert_allclose(np.asarray(res.coupling), t_oracle, atol=1e-5)


def test_large_epsilon_gives_product_coupling(rng):
    cost = rng.uniform(size=(8, 8))
    res = sinkhorn(cost, epsilon=1e4, max_iterations=200, threshold=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.coupling), np.full((8, 8), 1 / 64), atol=1e-4
    )


def test_small_epsilon_approaches_assignment():
    # Cost strongly favours the identity matching.
    n = 6
    cost = 1.0 - np.eye(n)
    res = sinkhorn(cost, epsilon=0.01, max_iterations=5000, threshold=1e-8)
    t = np.asarray(res.coupling)
    assert np.all(np.argmax(t, axis=1) == np.arange(n))
    assert t.diagonal().sum() > 0.95 / n * n * 0.95


def test_symmetric_problem_gives_symmetric_plan(rng):
    x = rng.normal(size=(10, 4))
    cost = sq_dists(x, x)
    res = sinkhorn(cost, epsilon=0.05, scale_cost=True, max_iterations=5000,
                   threshold=1e-7)
    t = np.asarray(res.coupling)
    np.testing.assert_allclose(t, t.T, atol=1e-5)


def test_nonuniform_marginals(rng):
    cost = rng.uniform(size=(5, 7))
    p = rng.uniform(0.5, 1.5, size=5)
    p /= p.sum()
    q = rng.uniform(0.5, 1.5, size=7)
    q /= q.sum()
    res = sinkhorn(cost, p, q, epsilon=0.1, max_iterations=5000,
                   threshold=1e-5)
    t = np.asarray(res.coupling)
    np.testing.assert_allclose(t.sum(1), p, atol=1e-4)
    np.testing.assert_allclose(t.sum(0), q, atol=1e-4)


def test_padded_problem_matches_unpadded(rng):
    """Masked Sinkhorn on a zero-padded problem == solve of the valid block."""
    cost_small = rng.uniform(size=(6, 9))
    n_pad, m_pad = 16, 16
    cost_big = np.zeros((n_pad, m_pad))
    cost_big[:6, :9] = cost_small
    row_mask = np.arange(n_pad) < 6
    col_mask = np.arange(m_pad) < 9

    res_small = sinkhorn(cost_small, epsilon=0.05, max_iterations=5000,
                         threshold=1e-7)
    res_big = sinkhorn(
        cost_big,
        epsilon=0.05,
        max_iterations=5000,
        threshold=1e-7,
        row_mask=jnp.asarray(row_mask),
        col_mask=jnp.asarray(col_mask),
    )
    t_big = np.asarray(res_big.coupling)
    np.testing.assert_allclose(
        t_big[:6, :9], np.asarray(res_small.coupling), atol=1e-5
    )
    assert np.abs(t_big[6:, :]).max() < 1e-12
    assert np.abs(t_big[:, 9:]).max() < 1e-12


def test_scale_cost_epsilon_is_relative(rng):
    """Scaling the cost by a constant leaves the plan unchanged under
    scale_cost=True (epsilon relative to max cost, OTT parity)."""
    cost = rng.uniform(size=(10, 10))
    r1 = sinkhorn(cost, epsilon=0.05, scale_cost=True, max_iterations=5000,
                  threshold=1e-7)
    r2 = sinkhorn(cost * 37.0, epsilon=0.05, scale_cost=True,
                  max_iterations=5000, threshold=1e-7)
    np.testing.assert_allclose(
        np.asarray(r1.coupling), np.asarray(r2.coupling), atol=1e-6
    )


def test_jit_and_vmap(rng):
    costs = rng.uniform(size=(4, 8, 8))
    solve = jax.jit(jax.vmap(lambda c: sinkhorn(c, epsilon=0.1,
                                                max_iterations=2000,
                                                threshold=1e-6).coupling))
    out = np.asarray(solve(costs))
    for i in range(4):
        expected = sinkhorn_log_np(costs[i], epsilon=0.1)
        np.testing.assert_allclose(out[i], expected, atol=1e-4)


def test_no_gradient_through_solver(rng):
    """Couplings are detached (reference .detach() parity)."""
    cost = jnp.asarray(rng.uniform(size=(5, 5)), jnp.float32)

    def loss(c):
        return jnp.sum(sinkhorn(c, epsilon=0.1, max_iterations=100,
                                threshold=1e-5).coupling * c)

    grad = jax.grad(loss)(cost)
    # d(sum(T*C))/dC = T exactly, since T carries no gradient.
    t = sinkhorn(cost, epsilon=0.1, max_iterations=100,
                 threshold=1e-5).coupling
    np.testing.assert_allclose(np.asarray(grad), np.asarray(t), atol=1e-6)

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
