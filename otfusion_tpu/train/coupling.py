"""Per-epoch coupling service.

Rebuilds ``compute_pet_to_mri_coupling`` (reference
MRI_PET_OT_OT_per_epoch_attn.py:940-961): before each epoch, extract
backbone features for the whole train set, group them by label (capped at
``max_samples_per_label``, reference ``--max-jax-samples`` default 64),
solve per-label entropic GW for the sample plans, then FOT for the
(d_pet, d_mri) feature plan consumed by every forward of the next epoch.

TPU-native differences from the reference:
  * feature extraction is a jitted batched forward (no .cpu().numpy());
  * label groups are padded to the static cap and the per-label GW family
    is ONE vmapped XLA program;
  * the EGW+FOT pipeline is jit-compiled once and reused across epochs
    (shapes are static: (n_labels, cap, d));
  * the resulting plan stays device-resident — no torch round-trip.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


from otfusion_tpu.ops.gromov import egw_per_label
from otfusion_tpu.ops.sinkhorn import sinkhorn


def group_and_pad(
    features: np.ndarray,
    labels: np.ndarray,
    n_labels: int,
    cap: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Group rows of ``features`` by label, truncating each group at ``cap``
    (first-come order, matching reference group_features_by_label
    attn:917-937) and zero-padding to the static cap.

    Returns (stacked (n_labels, cap, d), mask (n_labels, cap))."""
    d = features.shape[1]
    out = np.zeros((n_labels, cap, d), features.dtype)
    mask = np.zeros((n_labels, cap), bool)
    for lbl in range(n_labels):
        rows = features[labels == lbl][:cap]
        out[lbl, : len(rows)] = rows
        mask[lbl, : len(rows)] = True
    return out, mask


COUPLING_STATIC_ARGNAMES = (
    "epsilon", "gw_max_iterations", "sinkhorn_max_iterations",
    "fot_epsilon", "fot_max_iterations",
)


def coupling_pipeline_impl(
    pet_groups: jnp.ndarray,   # (L, cap, d_pet)
    mri_groups: jnp.ndarray,   # (L, cap, d_mri)
    pet_mask: jnp.ndarray,     # (L, cap)
    mri_mask: jnp.ndarray,
    *,
    epsilon: float = 5e-3,
    gw_max_iterations: int = 2000,
    sinkhorn_max_iterations: int = 2000,
    fot_epsilon: float = 5e-3,
    fot_max_iterations: int = 2000,
):
    """EGW per label -> block-diagonal sample plan -> FOT feature plan.

    Runs entirely on device; the block-diagonal assembly of per-label
    plans (reference mdict_to_matrix + concatenation, fot.py:206-213) is
    fused into the FOT cost computation: because off-block mass is zero,
    ``M = constC - 2 X^T Ts Y`` decomposes into a sum over labels of
    per-label terms — computed batched and summed, never materialising
    the (L*cap, L*cap) block matrix.
    """
    gw = egw_per_label(
        pet_groups, mri_groups, pet_mask, mri_mask,
        epsilon=epsilon,
        max_iterations=gw_max_iterations,
        sinkhorn_max_iterations=sinkhorn_max_iterations,
    )
    ts = gw.coupling  # (L, cap, cap), zero mass on padding

    # Normalise total mass to 1 across the block-diagonal plan
    # (fot normalises Ts to sum 1; each label block sums to 1 here).
    total = jnp.maximum(jnp.sum(ts), 1e-30)
    ts = ts / total

    x = jnp.where(pet_mask[..., None], pet_groups, 0.0)
    y = jnp.where(mri_mask[..., None], mri_groups, 0.0)

    # Per-label pieces of the COOT feature cost, summed over labels:
    # w_x/w_y are the block marginals; cross term batches over L.
    w_x = jnp.sum(ts, axis=2)  # (L, cap)
    w_y = jnp.sum(ts, axis=1)  # (L, cap)
    const_c = (
        jnp.einsum("lnd,ln->d", x * x, w_x)[:, None]
        + jnp.einsum("lme,lm->e", y * y, w_y)[None, :]
    )
    cross = jnp.einsum("lnd,lnm,lme->de", x, ts, y)
    m = const_c - 2.0 * cross

    fot_res = sinkhorn(
        m,
        epsilon=fot_epsilon,
        max_iterations=fot_max_iterations,
        scale_cost=True,
    )
    return fot_res.coupling, gw, fot_res


# Single-device entry point (the DP-sharded variant lives in
# parallel/mesh.py:make_sharded_coupling_pipeline, jitting the same impl
# with feature-dim in_shardings).
coupling_pipeline = jax.jit(
    coupling_pipeline_impl, static_argnames=COUPLING_STATIC_ARGNAMES
)


class CouplingService:
    """Owns the jitted feature-extract + coupling pipeline across epochs."""

    def __init__(
        self,
        feature_extract_step: Callable,
        n_labels: int,
        max_samples_per_label: int = 64,
        epsilon: float = 5e-3,
        gw_max_iterations: int = 2000,
        sinkhorn_max_iterations: int = 2000,
        fot_epsilon: float = 5e-3,
        mesh=None,
    ):
        self.feature_extract_step = feature_extract_step
        self.n_labels = n_labels
        self.cap = max_samples_per_label
        self.epsilon = epsilon
        self.gw_max_iterations = gw_max_iterations
        self.sinkhorn_max_iterations = sinkhorn_max_iterations
        self.fot_epsilon = fot_epsilon
        self.mesh = mesh
        self._pipeline = coupling_pipeline
        # The feature-sharded pipeline also serves multi-process groups:
        # inputs are assembled per-shard via jax.make_array_from_callback
        # (every process holds the identical global numpy groups), see
        # parallel/mesh.py:make_sharded_coupling_pipeline.
        if mesh is not None:
            from otfusion_tpu.parallel import make_sharded_coupling_pipeline

            self._pipeline = make_sharded_coupling_pipeline(mesh)
        self.last_log: dict = {}

    def compute(self, state, batches: Iterable) -> jnp.ndarray:
        """Extract features over ``batches`` of (mri, pet, labels) and
        return the device-resident (d_pet, d_mri) feature plan."""
        multiproc = jax.process_count() > 1
        mri_feats, pet_feats, labels = [], [], []
        # Lagged device->host fetches (same pattern as the epoch loops):
        # converting each batch's features immediately would stall on a
        # tunnel round-trip before the next forward can dispatch. Keep a
        # short deque of device arrays so JAX's async dispatch overlaps
        # batch i+1's forward with batch i's fetch; the bound keeps at
        # most ~3 volume batches of inputs in flight (HBM).
        pending: deque = deque()

        def _drain():
            mf, pf = pending.popleft()
            mri_feats.append(np.asarray(mf))
            pet_feats.append(np.asarray(pf))

        for mri, pet, lbl in batches:
            pending.append(self.feature_extract_step(state, mri, pet))
            if multiproc:
                # the DP-wrapped feature step returns the GLOBAL batch
                # (replicated) while the host-sharded loader yields only
                # this host's rows — gather labels to the same global
                # per-batch row order (rows concatenate in process
                # order, matching make_array_from_process_local_data).
                from otfusion_tpu.parallel.multihost import allgather_rows

                labels.append(allgather_rows(np.asarray(lbl)))
            else:
                labels.append(np.asarray(lbl))
            if len(pending) > 2:
                _drain()
        while pending:
            _drain()
        mri_all = np.concatenate(mri_feats)
        pet_all = np.concatenate(pet_feats)
        y = np.concatenate(labels)
        if len(y) != len(mri_all):
            raise AssertionError(
                f"feature/label row mismatch: {len(mri_all)} features vs "
                f"{len(y)} labels — the coupling must see the whole train "
                "set in one consistent order")

        mri_g, mri_m = group_and_pad(mri_all, y, self.n_labels, self.cap)
        pet_g, pet_m = group_and_pad(pet_all, y, self.n_labels, self.cap)

        # Host numpy in: the pipeline's in_shardings place the groups
        # (feature-dim sharded over the mesh in the DP path; falls back
        # to the replicated pipeline when d doesn't divide the mesh).
        pipeline = self._pipeline
        if self.mesh is not None:
            from otfusion_tpu.parallel import data_axis_size

            n_rows = data_axis_size(self.mesh)
        if self.mesh is not None and (
            pet_g.shape[-1] % n_rows or mri_g.shape[-1] % n_rows
        ):
            pipeline = coupling_pipeline
        tv, gw, fot_res = pipeline(
            pet_g, mri_g, pet_m, mri_m,
            epsilon=self.epsilon,
            gw_max_iterations=self.gw_max_iterations,
            sinkhorn_max_iterations=self.sinkhorn_max_iterations,
            fot_epsilon=self.fot_epsilon,
        )
        self.last_log = {
            "gw_outer_iters": np.asarray(gw.n_iters).tolist(),
            "gw_converged": np.asarray(gw.converged).tolist(),
            "gw_cost": np.asarray(gw.cost).tolist(),
            "fot_converged": bool(fot_res.converged),
            "fot_iters": int(fot_res.n_iters),
        }
        return tv
