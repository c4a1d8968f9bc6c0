"""Feature Optimal Transport (FOT / CO-Optimal-Transport feature stage).

Produces the (d, d') feature-to-feature coupling ``Tv`` that maps PET
features into MRI space — the quantity the fusion models multiply by
(``pet_feat @ Tv.T``, reference MRI_PET_OT_OT_per_epoch_attn.py:728).

Reference implementation: ``fot_numpy`` (perturbot/match/fot.py:14-152), a
NumPy block-coordinate-descent loop that each iteration rebuilds the feature
cost ``M = constC_v - hC1 @ Ts @ hC2.T`` and calls OTT's CPU ``linear.solve``
with ``scale_cost="max_cost"``.

Key structural observation (and why this rebuild is a single solve): FOT
holds the *sample* coupling ``Ts`` fixed — unlike full COOT, nothing inside
the loop updates it — so the cost matrix ``M`` is constant across BCD
iterations and the iterate ``Tv`` is the solution of one entropic OT
problem. The reference loop (niter up to 2000, fot.py:124-148) therefore
re-solves the identical problem and exits via its ``|cost_old - cost| <
1e-7`` test on the second pass. We compute ``M`` once (fused matmuls on the
MXU) and run one Sinkhorn solve; the result matches the reference's
fixed point.

Reference quirk normalised (documented, not replicated): fot.py:109-110
passes ``w1 = Ts.sum(axis=0)`` / ``w2 = Ts.sum(axis=1)`` to
``init_matrix_np`` — the two marginals are swapped relative to the datasets
they weight. Every live call site uses couplings with uniform marginals
(identity/B in-batch, MRI_PET_OT.py:672; Sinkhorn outputs per label), where
the swap is a no-op. We use the correctly-aligned marginals.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.ops.sinkhorn import sinkhorn


class FOTResult(NamedTuple):
    """Feature coupling and solve diagnostics."""

    coupling: jnp.ndarray   # (d, d') feature transport plan
    cost: jnp.ndarray       # <M, Tv> on the unscaled linearised cost
    converged: jnp.ndarray
    n_iters: jnp.ndarray    # inner Sinkhorn iterations


def feature_cost(
    x: jnp.ndarray,
    y: jnp.ndarray,
    ts: jnp.ndarray,
) -> jnp.ndarray:
    """Linearised COOT feature cost ``M (d, d')`` for fixed sample plan Ts.

    M_kl = sum_ij (X_ik - Y_jl)^2 Ts_ij
         = (X^2ᵀ w_x) 1ᵀ + 1 (w_yᵀ Y^2) - 2 Xᵀ Ts Y

    with w_x = Ts 1 (row marginals), w_y = Tsᵀ 1 (column marginals).
    Matches the reference's constC/h1/h2 factorisation
    (perturbot/match/utils.py:161-184 with h1(a)=a, h2(b)=2b) evaluated on
    transposed data, fused into three MXU matmuls.
    """
    w_x = jnp.sum(ts, axis=1)  # (n,)
    w_y = jnp.sum(ts, axis=0)  # (m,)
    const_c = ((x * x).T @ w_x)[:, None] + ((y * y).T @ w_y)[None, :]
    return const_c - 2.0 * (x.T @ ts) @ y


def fot(
    x: jnp.ndarray,
    y: jnp.ndarray,
    ts: jnp.ndarray,
    *,
    epsilon: float = 5e-3,
    max_iterations: int = 2000,
    threshold: float = 1e-3,
) -> FOTResult:
    """Solve the FOT feature coupling for datasets ``x`` (n, d), ``y`` (m, d').

    ``ts`` is the fixed sample coupling (n, m); it is normalised to total
    mass 1 exactly as the reference does (fot.py:108). ``epsilon`` is
    relative to the max of the feature cost (OTT Geometry with
    scale_cost="max_cost", fot.py:131). Feature marginals are uniform
    (fot.py:104-107).
    """
    x = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(x, jnp.float32)))
    y = jax.lax.stop_gradient(jnp.nan_to_num(jnp.asarray(y, jnp.float32)))
    ts = jax.lax.stop_gradient(jnp.asarray(ts, jnp.float32))
    ts = ts / jnp.maximum(jnp.sum(ts), 1e-30)

    m = feature_cost(x, y, ts)
    res = sinkhorn(
        m,
        epsilon=epsilon,
        max_iterations=max_iterations,
        threshold=threshold,
        scale_cost=True,
    )
    return FOTResult(
        coupling=res.coupling,
        cost=jnp.sum(m * res.coupling),
        converged=res.converged,
        n_iters=res.n_iters,
    )


def apply_feature_coupling(
    features: jnp.ndarray,
    tv: jnp.ndarray,
    normalize: bool = True,
) -> jnp.ndarray:
    """Map ``features`` (B, d_src) into target space via plan ``tv``
    (d_src, d_tgt): the OT barycentric projection
    ``out[:, l] = sum_k f[:, k] tv[k, l] / sum_k tv[k, l]``.

    Normalisation note (reference quirks unified, not replicated): the base
    trainer row-normalises the plan with a NaN->1e-8 guard before applying
    it (MRI_PET_OT.py:684-697); the flagship applies the raw plan via
    ``pet_feat @ T.t()`` (attn:728) — an orientation that only type-checks
    because d_pet == d_mri == 2048, and whose unnormalised output magnitude
    (~1/d) is immediately rescaled by the attention block's LayerNorm. The
    barycentric projection is the common intent of both; ``normalize=False``
    reproduces the raw-plan magnitude.
    """
    tv = jnp.nan_to_num(tv, nan=1e-8)
    if normalize:
        col_mass = jnp.sum(tv, axis=0, keepdims=True)
        tv = tv / jnp.where(col_mass == 0, 1e-8, col_mass)
    return features @ tv


def mdict_to_matrix(
    m_dict: Dict[int, np.ndarray],
    source_labels: np.ndarray,
    target_labels: np.ndarray,
) -> np.ndarray:
    """Scatter per-label couplings into one block matrix.

    Host-side utility replacing the reference's missing
    ``perturbot.utils.mdict_to_matrix`` (imported at fot.py:11; behavioural
    spec preserved at baseline_models_fusion.py:233-239): entry block
    [rows with source label l] x [cols with target label l] receives
    ``m_dict[l]``; everything else is zero.
    """
    source_labels = np.asarray(source_labels)
    target_labels = np.asarray(target_labels)
    total = np.zeros((len(source_labels), len(target_labels)), dtype=np.float64)
    for label, block in m_dict.items():
        rows = np.where(source_labels == label)[0]
        cols = np.where(target_labels == label)[0]
        total[np.ix_(rows, cols)] = block
    return total


def get_coupling_fot(
    data: Tuple[Dict[int, np.ndarray], Dict[int, np.ndarray]],
    ts: Union[Dict[int, np.ndarray], np.ndarray],
    eps: float = 5e-3,
) -> Tuple[np.ndarray, Dict]:
    """API-parity wrapper mirroring the reference's ``get_coupling_fot``
    (perturbot/match/fot.py:155-220).

    Takes per-label feature dicts, assembles the block-diagonal sample
    coupling, and solves the feature OT on device. Returns
    ``(Tv, log_dict)`` with the reference's log keys.
    """
    import time

    x_dict, y_dict = data
    labels = list(x_dict.keys())
    if isinstance(ts, dict):
        src_labels = np.concatenate(
            [np.full(x_dict[l].shape[0], l) for l in labels]
        )
        tgt_labels = np.concatenate(
            [np.full(y_dict[l].shape[0], l) for l in labels]
        )
        ts = mdict_to_matrix(ts, src_labels, tgt_labels)
    x = np.concatenate([x_dict[l] for l in labels])
    y = np.concatenate([y_dict[l] for l in labels])

    start = time.time()
    result = jax.jit(fot, static_argnames=("epsilon",))(
        x, y, np.asarray(ts), epsilon=eps
    )
    tv = np.asarray(result.coupling)
    log = {
        "cost": [float(result.cost)],
        "converged": bool(result.converged),
        "n_iters": int(result.n_iters),
        "time": time.time() - start,
    }
    return tv, log
