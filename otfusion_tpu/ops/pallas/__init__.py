"""Import shim — the Pallas kernels were DEMOTED to
``otfusion_tpu.experimental`` after losing to the XLA while_loop solvers
at every production shape (measured numbers + analysis in
experimental/__init__.py). The production solvers are ``ops.sinkhorn``
and ``ops.gromov``."""

from otfusion_tpu.experimental import (
    egw_per_label_pallas,
    gw_solve_pallas,
    sinkhorn_pallas,
)

__all__ = ["sinkhorn_pallas", "egw_per_label_pallas", "gw_solve_pallas"]
