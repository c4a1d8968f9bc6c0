"""Optimal-transport compute kernels (pure-JAX reference paths + Pallas TPU kernels)."""

from otfusion_tpu.ops.costs import (
    pairwise_sq_euclidean,
    scale_by_max,
    masked_max,
)
from otfusion_tpu.ops.sinkhorn import sinkhorn, SinkhornResult
from otfusion_tpu.ops.gromov import (
    entropic_gw,
    egw_per_label,
    GWResult,
)
from otfusion_tpu.ops.fot import (
    fot,
    get_coupling_fot,
    mdict_to_matrix,
    FOTResult,
)

__all__ = [
    "pairwise_sq_euclidean",
    "scale_by_max",
    "masked_max",
    "sinkhorn",
    "SinkhornResult",
    "entropic_gw",
    "egw_per_label",
    "GWResult",
    "fot",
    "get_coupling_fot",
    "mdict_to_matrix",
    "FOTResult",
]
