"""Experimental Pallas TPU kernels — NOT the production path.

Both kernels here are correct (plans agree with the XLA solvers to
~2e-5) but LOSE to XLA's fused ``lax.while_loop`` solvers at the
production shapes, so they are demoted per the honest-measurement rule.
Negative results (v5e, chained RTT-amortised timing,
scripts/bench_gw_kernel.py):

  * ``sinkhorn_kernel``: 2048x2048 FOT Sinkhorn, 64 iterations —
    70.7 ms vs 3.3 ms XLA (21x loss). XLA already keeps the cost matrix
    VMEM-resident across the fused loop, so the kernel's
    save-HBM-traffic premise doesn't bind.
  * ``gw_kernel``: whole-solve per-label entropic GW (2 labels x 64 x
    64) — 16.4 ms vs 11.0 ms XLA per solve (0.67x). Per outer iteration
    both implementations sit at the SAME ~37 us latency floor (the loop
    body is ~90 serially-dependent tiny VPU/MXU ops; dispatch is not the
    bottleneck once XLA fuses the body), and XLA's vmap advances ALL
    labels per iteration while a Pallas grid runs labels sequentially —
    so the kernel pays sum(iters) where XLA pays max(iters).

Conclusion recorded for future rounds: at these problem sizes the
solvers are op-latency-bound, not memory- or dispatch-bound; a Pallas
win would require batching labels inside one kernel program (which only
reproduces XLA's schedule) or algorithmic changes, not kernel fusion.
The production solvers are ``ops.sinkhorn`` / ``ops.gromov``.
"""

from otfusion_tpu.experimental.sinkhorn_kernel import sinkhorn_pallas
from otfusion_tpu.experimental.gw_kernel import (
    egw_per_label_pallas,
    gw_solve_pallas,
)

__all__ = ["sinkhorn_pallas", "egw_per_label_pallas", "gw_solve_pallas"]
