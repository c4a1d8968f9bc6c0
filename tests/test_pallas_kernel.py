"""Pallas Sinkhorn kernel: interpreter-mode correctness vs the pure-JAX
solver (compiled-mode parity is exercised on real TPU by bench/verify)."""

import jax.numpy as jnp
import numpy as np

from otfusion_tpu.ops import sinkhorn
from otfusion_tpu.ops.pallas import sinkhorn_pallas


def test_matches_reference_solver(rng):
    cost = jnp.asarray(rng.uniform(size=(128, 128)), jnp.float32)
    t_ref = np.asarray(
        sinkhorn(cost, epsilon=5e-3, scale_cost=True,
                 max_iterations=2000, threshold=1e-6).coupling
    )
    t_pal = np.asarray(
        sinkhorn_pallas(cost, epsilon=5e-3, n_iters=300, block_rows=64,
                        interpret=True)
    )
    assert np.abs(t_ref - t_pal).max() < 5e-5
    np.testing.assert_allclose(t_pal.sum(1), 1.0 / 128, atol=1e-5)
    np.testing.assert_allclose(t_pal.sum(0), 1.0 / 128, atol=1e-5)


def test_nonuniform_marginals(rng):
    cost = jnp.asarray(rng.uniform(size=(128, 128)), jnp.float32)
    p = rng.uniform(0.5, 1.5, 128)
    p /= p.sum()
    q = rng.uniform(0.5, 1.5, 128)
    q /= q.sum()
    t = np.asarray(
        sinkhorn_pallas(cost, jnp.asarray(p, jnp.float32),
                        jnp.asarray(q, jnp.float32),
                        epsilon=0.05, n_iters=200, block_rows=64,
                        interpret=True)
    )
    np.testing.assert_allclose(t.sum(1), p, atol=1e-4)
    np.testing.assert_allclose(t.sum(0), q, atol=1e-4)


def test_shape_validation(rng):
    import pytest

    cost = jnp.zeros((100, 128))
    with pytest.raises(ValueError, match="multiple of block_rows"):
        sinkhorn_pallas(cost, block_rows=64, interpret=True)
    cost = jnp.zeros((128, 100))
    with pytest.raises(ValueError, match="multiple of 128"):
        sinkhorn_pallas(cost, block_rows=64, interpret=True)
