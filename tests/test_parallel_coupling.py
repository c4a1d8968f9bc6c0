"""Sharded per-epoch coupling pipeline (VERDICT round-1 weak #2 / next
step 3): feature dims shard over the mesh, the FOT Sinkhorn solves a
row-sharded cost matrix, and Tv comes back device-local row shards that
agree with the replicated pipeline."""

import jax
import numpy as np
import pytest

from otfusion_tpu.parallel import make_mesh, make_sharded_coupling_pipeline
from otfusion_tpu.train.coupling import coupling_pipeline


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh()


def _problem(rng, L=2, cap=8, d=64):
    base = rng.normal(size=(L, cap, d)).astype(np.float32)
    mri = base + 0.1 * rng.normal(size=(L, cap, d)).astype(np.float32)
    pet = (base @ rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    mask = np.ones((L, cap), bool)
    return pet.astype(np.float32), mri, mask


def test_sharded_coupling_matches_replicated(mesh, rng):
    pet, mri, mask = _problem(rng)
    kwargs = dict(epsilon=5e-3, gw_max_iterations=50,
                  sinkhorn_max_iterations=100, fot_epsilon=5e-3,
                  fot_max_iterations=200)
    tv_ref, gw_ref, fot_ref = coupling_pipeline(pet, mri, mask, mask,
                                                **kwargs)
    sharded = make_sharded_coupling_pipeline(mesh)
    tv, gw, fot = sharded(pet, mri, mask, mask, **kwargs)

    np.testing.assert_allclose(np.asarray(tv), np.asarray(tv_ref),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gw.coupling),
                               np.asarray(gw_ref.coupling),
                               rtol=1e-4, atol=1e-7)

    # Tv is genuinely ROW-SHARDED: 8 device-local shards of (d/8, d).
    d = pet.shape[-1]
    assert len(tv.sharding.device_set) == 8
    shards = tv.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (d // 8, d) for s in shards)


def test_sharded_coupling_rejects_indivisible(mesh, rng):
    pet, mri, mask = _problem(rng, d=60)  # 60 % 8 != 0
    sharded = make_sharded_coupling_pipeline(mesh)
    with pytest.raises(ValueError, match="not divisible"):
        sharded(pet, mri, mask, mask, epsilon=5e-3, gw_max_iterations=5,
                sinkhorn_max_iterations=10, fot_epsilon=5e-3,
                fot_max_iterations=10)


def test_coupling_service_falls_back_when_indivisible(mesh, rng):
    """CouplingService silently uses the replicated pipeline when the
    backbone dim doesn't divide the mesh (never crashes training)."""
    from otfusion_tpu.train.coupling import CouplingService

    feats = rng.normal(size=(12, 60)).astype(np.float32)
    labels = rng.integers(0, 2, size=12)

    def fake_extract(state, mri, pet):
        return mri, pet

    svc = CouplingService(fake_extract, n_labels=2,
                          max_samples_per_label=4, mesh=mesh,
                          gw_max_iterations=5,
                          sinkhorn_max_iterations=10)
    tv = svc.compute(None, [(feats, feats * 0.5, labels)])
    assert np.isfinite(np.asarray(tv)).all()
