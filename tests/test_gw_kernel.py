"""Fused whole-solve GW Pallas kernel vs the XLA while_loop solver.

interpret=True runs the kernel's exact program on CPU — the TPU timing
story lives in scripts/bench_gw_kernel.py; here we pin down numerics:
same preprocessing, same loop semantics, same plans."""

import jax.numpy as jnp
import numpy as np
import pytest

from otfusion_tpu.ops.gromov import egw_per_label
from otfusion_tpu.experimental.gw_kernel import egw_per_label_pallas


def _groups(rng, L=2, cap=16, d=12):
    z = rng.normal(size=(L, cap, 4))
    x = (z @ rng.normal(size=(4, d))
         + 0.05 * rng.normal(size=(L, cap, d))).astype(np.float32)
    y = (z @ rng.normal(size=(4, d))
         + 0.05 * rng.normal(size=(L, cap, d))).astype(np.float32)
    mask = np.ones((L, cap), bool)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)


@pytest.mark.parametrize("masked", [False, True])
def test_gw_kernel_matches_xla_solver(rng, masked):
    x, y, mask = _groups(rng)
    x_mask, y_mask = mask, mask
    if masked:
        x_mask = mask.at[0, 12:].set(False)
        y_mask = mask.at[1, 10:].set(False)

    kwargs = dict(epsilon=5e-3, max_iterations=400)
    ref = egw_per_label(x, y, x_mask, y_mask,
                        sinkhorn_max_iterations=2000, **kwargs)
    out = egw_per_label_pallas(x, y, x_mask, y_mask, interpret=True,
                               **kwargs)

    t_ref = np.asarray(ref.coupling)
    t_out = np.asarray(out.coupling)
    np.testing.assert_allclose(t_out, t_ref, rtol=1e-3, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.n_iters),
                                  np.asarray(ref.n_iters))

    # marginal constraints hold; padded entries carry zero mass
    for lbl in range(2):
        n_valid = int(np.asarray(x_mask[lbl]).sum())
        m_valid = int(np.asarray(y_mask[lbl]).sum())
        rows = t_out[lbl].sum(axis=1)
        np.testing.assert_allclose(rows[:n_valid], 1.0 / n_valid,
                                   atol=5e-4)
        assert np.abs(t_out[lbl][n_valid:, :]).sum() == 0.0
        assert np.abs(t_out[lbl][:, m_valid:]).sum() == 0.0


def test_gw_kernel_aligns_correlated_clouds(rng):
    x, y, mask = _groups(rng, cap=24)
    out = egw_per_label_pallas(x, y, mask, mask, epsilon=5e-3,
                               max_iterations=400, interpret=True)
    from otfusion_tpu.metrics.ot_quality import diag_fraction

    for lbl in range(2):
        # random coupling sits at 1/24; require clear alignment signal
        assert diag_fraction(np.asarray(out.coupling[lbl])) > 2.5 / 24
