"""Pallas TPU kernels for the hot OT ops."""

from otfusion_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_pallas

__all__ = ["sinkhorn_pallas"]
