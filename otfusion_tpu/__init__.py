"""otfusion_tpu — TPU-native OT-based heterogeneous multi-modal fusion framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
``sungyoonahn/OT-based-Heterogeneous-Multi-Modal-Fusion-Embedding-for-AD-analysis-``
(the reference is a single-GPU PyTorch research codebase with CPU-pinned
NumPy/OTT optimal-transport solvers; see SURVEY.md).

Design principles:
  * every hot path (backbones, fusion, Sinkhorn/GW/FOT solvers) is a pure
    jittable JAX function running on TPU with static shapes;
  * optimal transport runs *inside* the training step instead of a
    host round-trip per batch/epoch;
  * multi-chip scaling via ``jax.sharding.Mesh`` + collectives, never
    hand-written comm.

Subpackages:
  ops       — OT solvers (Sinkhorn, entropic GW, FOT/COOT) + Pallas kernels
  models    — Flax model zoo (3D ResNet, MedicalNet, Res2Net, Swin, UNETR, fusion)
  data      — NIfTI ingestion, pairing, splits, synthetic fixtures, loaders
  train     — train/eval steps, per-epoch coupling service, loops, checkpoints
  parallel  — mesh construction and sharding rules
  metrics   — classification, calibration/uncertainty, OT-quality metrics
  utils     — reporting (results.txt/CSV), plotting, logging
"""

__version__ = "0.1.0"
