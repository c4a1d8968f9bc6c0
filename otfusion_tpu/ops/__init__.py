"""Optimal-transport compute kernels (pure-JAX reference paths + Pallas TPU kernels)."""

from otfusion_tpu.ops.costs import (
    pairwise_sq_euclidean,
    scale_by_max,
    masked_max,
)
from otfusion_tpu.ops.sinkhorn import sinkhorn, SinkhornResult
from otfusion_tpu.ops.gromov import (
    entropic_gw,
    entropic_gw_labels,
    egw_per_label,
    GWResult,
)
from otfusion_tpu.ops.fot import (
    fot,
    apply_feature_coupling,
    get_coupling_fot,
    mdict_to_matrix,
    FOTResult,
)
from otfusion_tpu.ops.cot import cotl, COTLResult
from otfusion_tpu.ops import api

__all__ = [
    "pairwise_sq_euclidean",
    "scale_by_max",
    "masked_max",
    "sinkhorn",
    "SinkhornResult",
    "entropic_gw",
    "entropic_gw_labels",
    "egw_per_label",
    "GWResult",
    "fot",
    "apply_feature_coupling",
    "get_coupling_fot",
    "mdict_to_matrix",
    "FOTResult",
    "cotl",
    "COTLResult",
    "api",
]
