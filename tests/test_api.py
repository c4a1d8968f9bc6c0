"""Tests for the perturbot.match-parity coupling API + COOT-L + EMD."""

import numpy as np
import pytest

from otfusion_tpu.ops import api
from otfusion_tpu.ops.emd import emd, gw_conditional_gradient


@pytest.fixture
def dicts(rng):
    x_dict = {0: rng.normal(size=(6, 5)).astype(np.float32),
              1: rng.normal(size=(9, 5)).astype(np.float32)}
    y_dict = {0: rng.normal(size=(7, 5)).astype(np.float32),
              1: rng.normal(size=(8, 5)).astype(np.float32)}
    return x_dict, y_dict


def _check_ts_dict(ts, x_dict, y_dict, mass_each=True):
    for l in x_dict:
        t = ts[l]
        assert t.shape == (x_dict[l].shape[0], y_dict[l].shape[0])
        assert np.isfinite(t).all()
        if mass_each:
            np.testing.assert_allclose(t.sum(), 1.0, atol=1e-3)


def test_egw_ott_per_label(dicts):
    ts, log = api.get_coupling_egw_ott(dicts, eps=0.01)
    _check_ts_dict(ts, *dicts)
    for l in (0, 1):
        assert "GW cost" in log[l] and "n_iters_outer" in log[l]


def test_egw_labels_global_block_diag(dicts):
    ts, log = api.get_coupling_egw_labels_ott(dicts, eps=0.01)
    x_dict, y_dict = dicts
    # global plan split per label; each block carries n_l/N mass
    total = sum(ts[l].sum() for l in ts)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)
    _check_ts_dict(ts, x_dict, y_dict, mass_each=False)


def test_egw_all_ignores_labels(dicts):
    t, log = api.get_coupling_egw_all_ott(dicts, eps=0.01)
    assert t.shape == (15, 15)
    np.testing.assert_allclose(t.sum(), 1.0, atol=1e-3)


def test_eot_and_leot(dicts):
    t, _ = api.get_coupling_eot_ott(dicts, eps=0.05)
    assert t.shape == (15, 15)
    np.testing.assert_allclose(t.sum(1), 1 / 15, atol=1e-3)

    ts, _ = api.get_coupling_leot_ott(dicts, eps=0.05)
    _check_ts_dict(ts, *dicts, mass_each=False)
    # off-block mass is exactly zero by construction: total mass = 1
    total = sum(ts[l].sum() for l in ts)
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_cotl_joint_couplings(rng):
    # y = permuted-feature copy of x so COOT has real structure to find
    x_dict = {0: rng.normal(size=(10, 6)).astype(np.float32),
              1: rng.normal(size=(12, 6)).astype(np.float32)}
    perm = rng.permutation(6)
    y_dict = {l: x_dict[l][:, perm] for l in x_dict}
    ts, log = api.get_coupling_cotl((x_dict, y_dict), eps=0.05)
    _check_ts_dict(ts, x_dict, y_dict)
    tv = log["Tv"]
    assert tv.shape == (6, 6)
    assert np.all(np.argmax(tv, axis=1) == np.argsort(perm))
    assert log["n_iters"] >= 1

    ts2, log2 = api.get_coupling_cotl_sinkhorn((x_dict, y_dict), eps=0.05)
    assert np.isfinite(log2["Tv"]).all()


def test_emd_exact_small():
    a = np.array([0.5, 0.5])
    b = np.array([0.5, 0.5])
    cost = np.array([[0.0, 1.0], [1.0, 0.0]])
    t = emd(a, b, cost)
    np.testing.assert_allclose(t, np.eye(2) * 0.5, atol=1e-9)


def test_emd_marginals(rng):
    a = rng.uniform(0.1, 1, 5)
    a /= a.sum()
    b = rng.uniform(0.1, 1, 7)
    b /= b.sum()
    cost = rng.uniform(size=(5, 7))
    t = emd(a, b, cost)
    np.testing.assert_allclose(t.sum(1), a, atol=1e-9)
    np.testing.assert_allclose(t.sum(0), b, atol=1e-9)


def test_gw_cg_self_alignment(rng):
    x = rng.normal(size=(8, 4))
    t = gw_conditional_gradient(x, x)
    np.testing.assert_allclose(t.sum(), 1.0, atol=1e-8)
    # exact GW of a cloud with itself: diagonal(ish) permutation plan
    assert np.trace(t) / t.sum() > 0.5


def test_gw_cg_api(dicts):
    ts, log = api.get_coupling_gw_cg(dicts)
    _check_ts_dict(ts, *dicts)


def test_pgd_alias(dicts):
    ts, _ = api.get_coupling_egw_pgd(dicts, eps=0.01)
    _check_ts_dict(ts, *dicts)

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
