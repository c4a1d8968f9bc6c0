"""Property + oracle tests for entropic Gromov-Wasserstein."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.ops import entropic_gw, egw_per_label
from tests.oracles import entropic_gw_np


def _diag_frac(t: np.ndarray) -> float:
    """Fraction of mass on the diagonal (OT-quality oracle re-derived from
    the reference's eval/match.py get_diag_fracs)."""
    return float(np.trace(t) / t.sum())


def test_marginals(rng):
    x = rng.normal(size=(14, 6))
    y = rng.normal(size=(10, 9))
    res = entropic_gw(x, y, epsilon=0.01, max_iterations=200,
                      sinkhorn_threshold=1e-6)
    t = np.asarray(res.coupling)
    np.testing.assert_allclose(t.sum(1), np.full(14, 1 / 14), atol=1e-4)
    np.testing.assert_allclose(t.sum(0), np.full(10, 1 / 10), atol=1e-4)


def test_self_alignment_recovers_identity(rng):
    """GW of a cloud with itself should put most mass on the diagonal."""
    x = rng.normal(size=(12, 8)) * 3.0
    res = entropic_gw(x, x, epsilon=0.005, max_iterations=500)
    t = np.asarray(res.coupling)
    assert _diag_frac(t) > 0.8
    assert np.all(np.argmax(t, axis=1) == np.arange(12))


def test_isometry_invariance(rng):
    """GW depends only on intra-cloud distances: an orthogonal transform +
    translation of y must not change the coupling."""
    x = rng.normal(size=(11, 5))
    q_mat, _ = np.linalg.qr(rng.normal(size=(5, 5)))
    y = x @ q_mat + 7.0
    res = entropic_gw(x, y, epsilon=0.005, max_iterations=500)
    res_self = entropic_gw(x, x, epsilon=0.005, max_iterations=500)
    np.testing.assert_allclose(
        np.asarray(res.coupling), np.asarray(res_self.coupling), atol=1e-4
    )


def test_matches_numpy_oracle(rng):
    x = rng.normal(size=(9, 4))
    y = rng.normal(size=(9, 4)) * 2.0
    res = entropic_gw(x, y, epsilon=0.02, max_iterations=500,
                      threshold=1e-7)
    t_oracle = entropic_gw_np(x, y, epsilon=0.02, tol=1e-9)
    # fp32 device GW vs fp64 oracle; entries up to ~0.11
    np.testing.assert_allclose(np.asarray(res.coupling), t_oracle, atol=1e-3)


def test_masked_matches_unpadded(rng):
    x = rng.normal(size=(7, 5))
    y = rng.normal(size=(9, 6))
    cap = 12
    xp = np.zeros((cap, 5))
    xp[:7] = x
    yp = np.zeros((cap, 6))
    yp[:9] = y
    xm = np.arange(cap) < 7
    ym = np.arange(cap) < 9
    res_pad = entropic_gw(xp, yp, epsilon=0.01, max_iterations=300,
                          x_mask=jnp.asarray(xm), y_mask=jnp.asarray(ym))
    res = entropic_gw(x, y, epsilon=0.01, max_iterations=300)
    t_pad = np.asarray(res_pad.coupling)
    np.testing.assert_allclose(t_pad[:7, :9], np.asarray(res.coupling),
                               atol=1e-4)
    assert np.abs(t_pad[7:, :]).max() < 1e-10
    assert np.abs(t_pad[:, 9:]).max() < 1e-10


def test_per_label_batch_equals_individual(rng):
    """vmapped per-label EGW == per-label loop of single solves."""
    sizes_x = [5, 8]
    sizes_y = [6, 7]
    cap = 8
    d, dp = 4, 3
    xs = np.zeros((2, cap, d))
    ys = np.zeros((2, cap, dp))
    xm = np.zeros((2, cap), bool)
    ym = np.zeros((2, cap), bool)
    clouds = []
    for i in range(2):
        x = rng.normal(size=(sizes_x[i], d))
        y = rng.normal(size=(sizes_y[i], dp))
        xs[i, : sizes_x[i]] = x
        ys[i, : sizes_y[i]] = y
        xm[i, : sizes_x[i]] = True
        ym[i, : sizes_y[i]] = True
        clouds.append((x, y))

    batched = egw_per_label(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xm), jnp.asarray(ym),
        epsilon=0.01, max_iterations=300,
    )
    for i, (x, y) in enumerate(clouds):
        single = entropic_gw(x, y, epsilon=0.01, max_iterations=300)
        np.testing.assert_allclose(
            np.asarray(batched.coupling[i])[: sizes_x[i], : sizes_y[i]],
            np.asarray(single.coupling),
            atol=2e-4,
        )


def test_nan_inputs_are_scrubbed(rng):
    """Reference NaN-scrub parity (MRI_PET_OT.py:86-89)."""
    x = rng.normal(size=(8, 4))
    x[0, 0] = np.nan
    y = rng.normal(size=(8, 4))
    res = entropic_gw(x, y, epsilon=0.01, max_iterations=200)
    assert np.isfinite(np.asarray(res.coupling)).all()


def test_jittable(rng):
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    fn = jax.jit(lambda a, b: entropic_gw(a, b, epsilon=0.01,
                                          max_iterations=100).coupling)
    t = np.asarray(fn(x, y))
    assert t.shape == (8, 8)
    np.testing.assert_allclose(t.sum(), 1.0, atol=1e-4)

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
