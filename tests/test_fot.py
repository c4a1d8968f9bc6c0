"""Tests for FOT feature coupling + parity wrappers."""

import pytest
import numpy as np

from otfusion_tpu.ops import fot, get_coupling_fot, mdict_to_matrix
from tests.oracles import fot_np


def test_feature_marginals_uniform(rng):
    x = rng.normal(size=(20, 12))
    y = rng.normal(size=(20, 16))
    ts = np.eye(20) / 20.0
    res = fot(x, y, ts, epsilon=5e-3, threshold=1e-6)
    t = np.asarray(res.coupling)
    np.testing.assert_allclose(t.sum(1), np.full(12, 1 / 12), atol=1e-4)
    np.testing.assert_allclose(t.sum(0), np.full(16, 1 / 16), atol=1e-4)


def test_matches_numpy_oracle(rng):
    x = rng.normal(size=(15, 8))
    y = rng.normal(size=(15, 10))
    ts = np.eye(15)  # unnormalised on purpose: solver must normalise
    res = fot(x, y, ts, epsilon=0.01, threshold=1e-7)
    t_oracle = fot_np(x, y, ts.copy(), epsilon=0.01)
    # fp32 device solve vs fp64 oracle: entries up to ~0.1, tolerance 5e-4
    np.testing.assert_allclose(np.asarray(res.coupling), t_oracle, atol=5e-4)


def test_identical_features_align_diagonally(rng):
    """With Y = X and identity sample coupling, features should map to
    themselves: the diagonal of Tv dominates."""
    x = rng.normal(size=(30, 10)) * 2.0
    res = fot(x, x, np.eye(30) / 30, epsilon=2e-3, threshold=1e-6)
    t = np.asarray(res.coupling)
    assert np.all(np.argmax(t, axis=1) == np.arange(10))


def test_permuted_features_recovered(rng):
    """Y = X with permuted columns: Tv should recover the permutation."""
    x = rng.normal(size=(40, 8)) * 2.0
    perm = rng.permutation(8)
    y = x[:, perm]
    res = fot(x, y, np.eye(40) / 40, epsilon=2e-3, threshold=1e-6)
    t = np.asarray(res.coupling)
    # column j of y equals column perm[j] of x -> argmax over rows of T
    recovered = np.argmax(t, axis=0)
    np.testing.assert_array_equal(recovered[np.argsort(perm)]
                                  if False else perm[np.argsort(perm)],
                                  np.arange(8))  # sanity of the test itself
    assert np.all(np.argmax(t, axis=1) == np.argsort(perm))


def test_mdict_to_matrix_spec():
    """Block-scatter spec from baseline_models_fusion.py:233-239."""
    m_dict = {0: np.full((2, 2), 1.0), 1: np.full((1, 3), 2.0)}
    src = np.array([0, 1, 0])
    tgt = np.array([1, 0, 0, 1, 1])
    out = mdict_to_matrix(m_dict, src, tgt)
    assert out.shape == (3, 5)
    # label 0 rows {0,2}, cols {1,2} get 1.0
    np.testing.assert_allclose(out[np.ix_([0, 2], [1, 2])], 1.0)
    # label 1 rows {1}, cols {0,3,4} get 2.0
    np.testing.assert_allclose(out[np.ix_([1], [0, 3, 4])], 2.0)
    assert out.sum() == 2 * 2 * 1.0 + 3 * 2.0


def test_get_coupling_fot_dict_path(rng):
    """Per-label dict API (reference fot.py:155-220) end to end."""
    x_dict = {0: rng.normal(size=(6, 5)), 1: rng.normal(size=(8, 5))}
    y_dict = {0: rng.normal(size=(6, 7)), 1: rng.normal(size=(8, 7))}
    ts_dict = {0: np.eye(6) / 6, 1: np.eye(8) / 8}
    tv, log = get_coupling_fot((x_dict, y_dict), ts_dict, eps=0.01)
    assert tv.shape == (5, 7)
    assert np.isfinite(tv).all()
    assert "time" in log and "cost" in log
    # Matches manual block assembly + direct solve
    x = np.concatenate([x_dict[0], x_dict[1]])
    y = np.concatenate([y_dict[0], y_dict[1]])
    ts = np.zeros((14, 14))
    ts[:6, :6] = np.eye(6) / 6
    ts[6:, 6:] = np.eye(8) / 8
    direct = fot(x, y, ts, epsilon=0.01)
    np.testing.assert_allclose(tv, np.asarray(direct.coupling), atol=1e-5)

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
