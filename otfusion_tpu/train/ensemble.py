"""Deep-ensemble evaluation with uncertainty metrics.

Reference test_ensemble (main.py:351-448 / test.py:219-355): N
independently trained members; softmax probabilities averaged; reports
accuracy, weighted F1, AUC, Cohen's kappa, plus the calibration battery
(ECE, AURC/EAURC, AUPR, FPR@95, NLL, Brier — metrics.py/metrics2.py).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

from otfusion_tpu.metrics.calibration import (
    entropy_decomposition,
    uncertainty_metrics,
)


def _softmax(logits):
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def evaluate_ensemble(
    member_logits: Sequence[np.ndarray],
    labels: np.ndarray,
) -> Dict[str, float]:
    """Metrics for an ensemble given each member's (N, C) logits."""
    from sklearn.metrics import (
        cohen_kappa_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    labels = np.asarray(labels)
    probs = np.mean([_softmax(np.asarray(l)) for l in member_logits], axis=0)
    preds = probs.argmax(axis=1)

    metrics = {
        "accuracy": float((preds == labels).mean()),
        "precision": float(
            precision_score(labels, preds, average="weighted",
                            zero_division=0)
        ),
        "recall": float(
            recall_score(labels, preds, average="weighted", zero_division=0)
        ),
        "f1": float(
            f1_score(labels, preds, average="weighted", zero_division=0)
        ),
        "kappa": float(cohen_kappa_score(labels, preds)),
        "n_members": len(member_logits),
    }
    try:
        if probs.shape[1] == 2:
            metrics["auc"] = float(roc_auc_score(labels, probs[:, 1]))
        else:
            metrics["auc"] = float(
                roc_auc_score(labels, probs, multi_class="ovr")
            )
    except ValueError:
        metrics["auc"] = float("nan")

    # Uncertainty battery on the averaged predictive distribution.
    log_probs = np.log(np.maximum(probs, 1e-12))
    metrics.update(
        {f"ens_{k}": v for k, v in uncertainty_metrics(log_probs,
                                                       labels).items()}
    )
    # Predictive-entropy decomposition over the members (total =
    # aleatoric + epistemic; reference metrics.py:101-129 scaffolding).
    decomp = entropy_decomposition(
        np.stack([_softmax(np.asarray(l)) for l in member_logits])
    )
    metrics.update({
        "entropy_total": float(decomp["total"].mean()),
        "entropy_aleatoric": float(decomp["aleatoric"].mean()),
        "entropy_epistemic": float(decomp["epistemic"].mean()),
    })
    return metrics


def collect_member_logits(
    states: Sequence,
    eval_step: Callable,
    batches: Sequence,
    t_features: Sequence | None = None,
) -> tuple[List[np.ndarray], np.ndarray]:
    """Run each ensemble member over ``batches``; returns per-member
    logits + labels. ``t_features`` supplies each member's coupling."""
    member_logits = []
    labels_out = None
    for i, state in enumerate(states):
        logits = []
        labels = []
        tv = None if t_features is None else t_features[i]
        for batch in batches:
            out = eval_step(state, *batch, tv)
            logits.append(np.asarray(out["logits"]))
            labels.append(np.asarray(batch[-1]))
        member_logits.append(np.concatenate(logits))
        labels_out = np.concatenate(labels)
    return member_logits, labels_out
