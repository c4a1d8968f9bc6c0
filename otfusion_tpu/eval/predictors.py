"""Coupling-weighted cross-modal predictors.

The reference harness imports these from ``perturbot.predict.linear_regression``
and ``perturbot.predict.mlp`` (cv_inner_loop.py:49-56) — **modules that do
not exist in the reference repository** (SURVEY.md §2.8: "Imports reference
missing perturbot.predict.{scvi_vae,mlp,linear_regression} → not runnable
as committed"). They are reconstructed here from their call-site semantics:

* ``param = weighted_ols_normed(X_dict, Y_dict, Ts)`` then
  ``pred = predict(val_X, param)`` (cv_inner_loop.py:319-320) — a linear
  map fit on coupling-weighted sample pairs, on z-scored ("normed")
  features;
* baselines ``ols_normed`` / ``weight_1_ols_normed`` / ``weight_conc_normed``
  labelled "perfect" / "random" / "by_conc" (cv_inner_loop.py:133-134) —
  the same fit under the identity, uniform, and dosage-block couplings
  (the couplings the reference builds explicitly in
  cv_outer_loop.py:163-175);
* ``model, log = train_mlp((X_dict, Y_dict), Ts)`` with ``model(val_X)``
  (cv_inner_loop.py:456-477) — a small MLP on barycentric-projected
  targets.

Math. Given per-label couplings ``T_l`` (n_l × m_l), the weighted OLS
objective is ``min_W Σ_l Σ_ij T^l_ij ||W^T x̃_i − y_j||²`` with
``x̃ = [x, 1]`` (bias). Normal equations:
``(Σ_l X̃_lᵀ diag(T_l·1) X̃_l + λI) W = Σ_l X̃_lᵀ T_l Y_l``.
The Gram accumulation is plain matmuls; the (d+1)² solve runs host-side in
float64 because TPUs have no native f64 and the system is often
ill-conditioned at d = 2048. The MLP trains on device (Flax + optax, one
jitted ``lax.scan`` over epochs).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def make_G(size: int, label, k=None) -> np.ndarray:
    """Block membership matrix of a side-information labelling
    (reference eval/utils.py:6-15): ``G[i, j] = 1`` iff samples i, j share
    a Z class. Vectorised equality instead of the reference's triple loop."""
    label = np.asarray(label).ravel()
    if size != len(label):
        raise ValueError(f"size {size} != len(label) {len(label)} ({k})")
    g = (label[:, None] == label[None, :]).astype(np.float64)
    if not (g.sum(axis=0) > 0).all():
        raise ValueError(f"empty Z class column ({k})")
    return g


def _zstats(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mean = a.mean(axis=0)
    std = a.std(axis=0)
    return mean, np.where(std < 1e-12, 1.0, std)


def _weighted_ols(
    x_dict: Dict, y_dict: Dict, t_dict, ridge: float = 1e-6
) -> Dict:
    """Closed-form coupling-weighted OLS on z-scored features. Returns the
    param dict consumed by :func:`predict`. A single dense coupling over
    the label-concatenated clouds (the all-to-all methods, e.g. ECOOT /
    EGW_all_ott) is treated as one group so cross-label mass is kept."""
    if not isinstance(t_dict, dict):
        labels = list(x_dict.keys())
        x_dict = {
            0: np.concatenate([np.asarray(x_dict[l]) for l in labels])
        }
        y_dict = {
            0: np.concatenate([np.asarray(y_dict[l]) for l in labels])
        }
        t_dict = {0: np.asarray(t_dict)}
    labels = list(x_dict.keys())
    x_all = np.concatenate([np.asarray(x_dict[l], np.float64) for l in labels])
    y_all = np.concatenate([np.asarray(y_dict[l], np.float64) for l in labels])
    x_mean, x_std = _zstats(x_all)
    y_mean, y_std = _zstats(y_all)

    d = x_all.shape[1] + 1  # + bias
    dp = y_all.shape[1]
    gram = np.zeros((d, d))
    cross = np.zeros((d, dp))
    for l in labels:
        x = (np.asarray(x_dict[l], np.float64) - x_mean) / x_std
        y = (np.asarray(y_dict[l], np.float64) - y_mean) / y_std
        t = np.asarray(t_dict[l], np.float64)
        mass = t.sum()
        if mass <= 0:
            continue
        t = t / mass * t.shape[0]  # keep label blocks comparably weighted
        xb = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)
        row_mass = t.sum(axis=1)
        gram += xb.T @ (xb * row_mass[:, None])
        cross += xb.T @ (t @ y)
    gram += ridge * np.trace(gram) / d * np.eye(d)
    w = np.linalg.solve(gram, cross)
    return {
        "W": w,
        "x_mean": x_mean,
        "x_std": x_std,
        "y_mean": y_mean,
        "y_std": y_std,
    }


def predict(x: np.ndarray, param: Dict) -> np.ndarray:
    """Apply a fitted linear param (reconstructs
    ``perturbot.predict.linear_regression.predict``; used as
    ``pred_from_param`` at cv_inner_loop.py:135)."""
    x = (np.asarray(x, np.float64) - param["x_mean"]) / param["x_std"]
    xb = np.concatenate([x, np.ones((x.shape[0], 1))], axis=1)
    y = xb @ param["W"]
    return y * param["y_std"] + param["y_mean"]


def weighted_ols_normed(x_dict: Dict, y_dict: Dict, t_dict: Dict) -> Dict:
    """The harness's main prediction model (``pred_method``,
    cv_inner_loop.py:132): OLS weighted by the OT coupling."""
    return _weighted_ols(x_dict, y_dict, t_dict)


def ols_normed(x_dict: Dict, y_dict: Dict, z_dict: Optional[Dict] = None) -> Dict:
    """"perfect" baseline (cv_inner_loop.py:133-134): identity pairing —
    assumes per-label X/Y rows are truly aligned, as the synthetic
    chemical-screen data guarantees."""
    t = {
        k: np.eye(np.asarray(x_dict[k]).shape[0]) for k in x_dict.keys()
    }
    return _weighted_ols(x_dict, y_dict, t)


def weight_1_ols_normed(
    x_dict: Dict, y_dict: Dict, z_dict: Optional[Dict] = None
) -> Dict:
    """"random" baseline: uniform coupling — every source matched equally
    to every target; the regression floor."""
    t = {
        k: np.ones(
            (np.asarray(x_dict[k]).shape[0], np.asarray(y_dict[k]).shape[0])
        )
        for k in x_dict.keys()
    }
    return _weighted_ols(x_dict, y_dict, t)


def weight_conc_normed(x_dict: Dict, y_dict: Dict, z_dict: Dict) -> Dict:
    """"by_conc" baseline: coupling constant within dosage blocks
    (make_G over Z, as built explicitly at cv_outer_loop.py:172-175)."""
    t = {
        k: make_G(np.asarray(x_dict[k]).shape[0], z_dict[k], k)
        for k in x_dict.keys()
    }
    return _weighted_ols(x_dict, y_dict, t)


def _barycentric_targets(x_dict: Dict, y_dict: Dict, t_dict):
    if not isinstance(t_dict, dict):
        labels = list(x_dict.keys())
        x_dict = {0: np.concatenate([np.asarray(x_dict[l]) for l in labels])}
        y_dict = {0: np.concatenate([np.asarray(y_dict[l]) for l in labels])}
        t_dict = {0: np.asarray(t_dict)}
    xs, ys = [], []
    for l in x_dict.keys():
        x = np.asarray(x_dict[l], np.float32)
        y = np.asarray(y_dict[l], np.float32)
        t = np.asarray(t_dict[l], np.float64)
        row = t.sum(axis=1)
        row = np.where(row == 0, 1e-30, row)
        xs.append(x)
        ys.append(((t / row[:, None]) @ y).astype(np.float32))
    return np.concatenate(xs), np.concatenate(ys)


def train_mlp(
    train_data: Tuple[Dict, Dict],
    t_dict: Dict,
    *,
    hidden: int = 512,
    epochs: int = 300,
    learning_rate: float = 1e-3,
    seed: int = 0,
):
    """Reconstruction of ``perturbot.predict.mlp.train_mlp``
    (cv_inner_loop.py:456-459): fit an MLP X → Y on coupling-matched
    pairs. Targets are the barycentric projections ``(T_l/row) @ Y_l`` —
    the standard soft-matching surrogate. Trains on device: full-batch
    Adam, the whole epoch loop as one jitted ``lax.scan``.

    Returns ``(predict_fn, log)`` where ``predict_fn(x) -> y_hat`` accepts
    a NumPy array (the reference's torch-module call surface,
    cv_inner_loop.py:477, adapted to ndarray-in/ndarray-out).
    """
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    x, y = _barycentric_targets(train_data[0], train_data[1], t_dict)
    x_mean, x_std = _zstats(x.astype(np.float64))
    y_mean, y_std = _zstats(y.astype(np.float64))
    xn = jnp.asarray((x - x_mean) / x_std, jnp.float32)
    yn = jnp.asarray((y - y_mean) / y_std, jnp.float32)

    class _MLP(nn.Module):
        out_dim: int

        @nn.compact
        def __call__(self, h):
            h = nn.Dense(hidden)(h)
            h = nn.relu(h)
            h = nn.Dense(hidden)(h)
            h = nn.relu(h)
            return nn.Dense(self.out_dim)(h)

    model = _MLP(out_dim=y.shape[1])
    params = model.init(jax.random.PRNGKey(seed), xn[:1])
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((model.apply(p, xn) - yn) ** 2)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.jit(
        lambda c: jax.lax.scan(step, c, None, length=epochs)
    )((params, opt_state))
    losses = np.asarray(losses)

    apply_jit = jax.jit(model.apply)

    def predict_fn(v: np.ndarray) -> np.ndarray:
        vn = jnp.asarray(
            (np.asarray(v, np.float64) - x_mean) / x_std, jnp.float32
        )
        out = np.asarray(apply_jit(params, vn), np.float64)
        return out * y_std + y_mean

    log = {"final_loss": float(losses[-1]), "loss_curve": losses}
    return predict_fn, log


__all__ = [
    "make_G",
    "ols_normed",
    "predict",
    "train_mlp",
    "weight_1_ols_normed",
    "weight_conc_normed",
    "weighted_ols_normed",
]
