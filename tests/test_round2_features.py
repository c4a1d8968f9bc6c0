"""Round-2 additions: kNN-baseline couplings, entropy uncertainty,
loader prefetch, --num-workers plumbing, --device flag."""

import numpy as np
import pytest

from otfusion_tpu.metrics import (
    diag_fraction,
    entropy_decomposition,
    foscttm,
    knn_coupling,
    knn_couplings_per_label,
    predictive_entropy,
)


def test_knn_coupling_matches_reference_semantics(rng):
    """T[i, j] = 1/(n k) on each row's k nearest neighbours, 0 elsewhere
    (eval/utils.py:48-56)."""
    x = rng.normal(size=(10, 5))
    y = rng.normal(size=(12, 5))
    k = 3
    t = knn_coupling(x, y, k)
    assert t.shape == (10, 12)
    np.testing.assert_allclose(t.sum(), 1.0)
    # per-row: exactly k entries of 1/(n k), and they ARE the k nearest
    for i in range(10):
        nz = np.flatnonzero(t[i])
        assert len(nz) == k
        d = np.linalg.norm(y - x[i], axis=1)
        assert set(nz) == set(np.argsort(d)[:k])
        np.testing.assert_allclose(t[i, nz], 1.0 / (10 * k))


def test_knn_coupling_is_the_floor_for_ot(rng):
    """The entropic GW coupling on correlated clouds must beat the kNN
    baseline's diagonal mass (VERDICT round-1 next-step 9: the reference
    compares its OT metrics against this floor, eval/utils.py:48-87)."""
    import jax.numpy as jnp

    from otfusion_tpu.ops.gromov import entropic_gw

    n, d = 24, 8
    base = rng.normal(size=(n, d))
    x = base + 0.05 * rng.normal(size=(n, d))
    y = base @ rng.normal(size=(d, d)) * 0.2
    res = entropic_gw(jnp.asarray(x), jnp.asarray(y), epsilon=5e-3,
                      max_iterations=200)
    t_ot = np.asarray(res.coupling)
    t_knn = knn_coupling(x, y, k=1)
    # GW aligns the intrinsic geometry; kNN across un-aligned spaces is
    # near-random. Diagonal mass fraction: OT must dominate.
    assert diag_fraction(t_ot) > diag_fraction(t_knn)


def test_knn_couplings_per_label_blocks(rng):
    xg = {0: rng.normal(size=(5, 4)), 1: rng.normal(size=(7, 4))}
    yg = {0: rng.normal(size=(5, 4)), 1: rng.normal(size=(7, 4))}
    out = knn_couplings_per_label(xg, yg, ks=[1, 2])
    assert set(out.keys()) == {1, 2}
    assert out[1][0].shape == (5, 5)
    assert out[2][1].shape == (7, 7)
    # mass may fall off-block (cross-label neighbours are dropped, like
    # the reference's slicing) but never exceeds the global total
    total = sum(b.sum() for b in out[1].values())
    assert 0.0 < total <= 1.0 + 1e-12


def test_predictive_entropy_bounds_and_quirk():
    logits = np.array([[10.0, -10.0], [0.0, 0.0]])
    h = predictive_entropy(logits)
    assert h[0] < 1e-3          # near-certain -> ~0
    np.testing.assert_allclose(h[1], 1.0, atol=1e-12)  # uniform -> 1
    # strict-reproduction mode drops class 0's contribution (metrics.py
    # u_all[:, 1:] quirk): half the uniform entropy
    h_quirk = predictive_entropy(logits, skip_first_class=True)
    np.testing.assert_allclose(h_quirk[1], 0.5, atol=1e-12)


def test_entropy_decomposition_identities(rng):
    # identical members -> zero epistemic; disagreeing members -> positive
    p = np.full((4, 6, 2), 0.5)
    d = entropy_decomposition(p)
    np.testing.assert_allclose(d["epistemic"], 0.0, atol=1e-12)
    np.testing.assert_allclose(d["total"],
                               d["aleatoric"] + d["epistemic"], atol=1e-12)
    confident = np.zeros((2, 6, 2))
    confident[0, :, 0] = 1.0
    confident[1, :, 1] = 1.0
    d2 = entropy_decomposition(confident)
    assert (d2["epistemic"] > 0.9).all()  # members certain but disagree


def test_prefetch_preserves_order_and_raises():
    from otfusion_tpu.data.loader import prefetch

    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("loader died")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_volume_cache_honors_num_workers(tmp_path):
    from otfusion_tpu.data.loader import _VolumeCache

    cache = _VolumeCache((4, 4, 4), num_workers=3)
    assert cache._pool._max_workers == 3


def test_ensemble_reports_entropy_decomposition(rng):
    from otfusion_tpu.train.ensemble import evaluate_ensemble

    logits = [rng.normal(size=(10, 2)) for _ in range(3)]
    labels = rng.integers(0, 2, size=10)
    m = evaluate_ensemble(logits, labels)
    for key in ("entropy_total", "entropy_aleatoric", "entropy_epistemic"):
        assert np.isfinite(m[key])
    assert m["entropy_total"] >= m["entropy_aleatoric"] - 1e-9


def test_foscttm_aligned_better_than_random(rng):
    x = rng.normal(size=(30, 6))
    assert foscttm(x, x + 0.01 * rng.normal(size=(30, 6))) < 0.05
    assert abs(foscttm(x, rng.normal(size=(30, 6))) - 0.5) < 0.2
