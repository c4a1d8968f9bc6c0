"""Metrics: classification, calibration/uncertainty, OT coupling quality."""

from otfusion_tpu.metrics.classification import (
    classification_metrics,
    confusion_matrix,
)
from otfusion_tpu.metrics.calibration import (
    expected_calibration_error,
    aurc_eaurc,
    fpr_at_95_tpr,
    aupr_error,
    negative_log_likelihood,
    brier_score,
    predictive_entropy,
    entropy_decomposition,
    uncertainty_metrics,
)
from otfusion_tpu.metrics.ot_quality import (
    foscttm,
    diag_fraction,
    relative_mse,
    knn_coupling,
    knn_couplings_per_label,
)

__all__ = [
    "classification_metrics",
    "confusion_matrix",
    "expected_calibration_error",
    "aurc_eaurc",
    "fpr_at_95_tpr",
    "aupr_error",
    "negative_log_likelihood",
    "brier_score",
    "uncertainty_metrics",
    "predictive_entropy",
    "entropy_decomposition",
    "foscttm",
    "diag_fraction",
    "relative_mse",
    "knn_coupling",
    "knn_couplings_per_label",
]
