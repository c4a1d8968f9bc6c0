"""OT coupling quality metrics.

Vectorised re-derivations of the reference's dormant evaluation oracles
(perturbot/perturbot/eval/match.py, eval/utils.py) — used here as the test
battery for the Sinkhorn/GW/FOT kernels:

  * FOSCTTM — "fraction of samples closer than the true match"
    (eval/utils.py:18-46): for aligned X, Y, the mean normalised rank of
    the true match y_i among all y by distance from x_i.
  * diagonal mass fraction of a (block of) coupling(s)
    (eval/match.py:89-177, simplified to label-free diagonals).
  * relative MSE of the coupling diagonal vs the perfect (identity)
    coupling, normalised by the all-to-all coupling's error
    (eval/match.py:10-27).
"""

from __future__ import annotations

import numpy as np


def foscttm(x: np.ndarray, y: np.ndarray) -> float:
    """Mean fraction-closer-than-true-match of aligned rows of x vs y.
    0 = perfect alignment, 0.5 = random."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.shape[0]
    d2 = (
        np.sum(x * x, 1)[:, None]
        + np.sum(y * y, 1)[None, :]
        - 2.0 * x @ y.T
    )
    true_d = np.diag(d2)
    closer = (d2 < true_d[:, None]).sum(axis=1)
    ties = (d2 == true_d[:, None]).sum(axis=1) - 1  # mean-rank tie handling
    return float(((closer + ties / 2.0) / (n - 1)).mean())


def diag_fraction(t: np.ndarray) -> float:
    """Fraction of total coupling mass on the diagonal."""
    t = np.asarray(t, np.float64)
    return float(np.trace(t) / max(t.sum(), 1e-30))


def relative_mse(t: np.ndarray) -> float:
    """MSE of diag(T/sum) vs diag(identity/n), relative to the all-to-all
    coupling's error (reference get_rel_mse, eval/match.py:10-27).
    0 = perfect, 1 = as bad as uniform."""
    t = np.asarray(t, np.float64)
    n = t.shape[0]
    t = t / max(t.sum(), 1e-30)
    perfect_diag = 1.0 / n
    err = np.mean((np.diag(t) - perfect_diag) ** 2)
    worst = np.mean((1.0 / (n * t.shape[1]) - perfect_diag) ** 2)
    return float(err / max(worst, 1e-30))
