"""Epoch-loop engines shared by the CLI drivers.

``run_unimodal_training`` mirrors 3D_resnet.py main() (:705-1050):
Adam, no LR schedule, best-by-val-loss checkpoint, confusion matrix +
t-SNE of the best model's validation embeddings.

``run_fusion_training`` covers all three fusion trainers with one engine:
  * variant "per_epoch_attn" — MRI_PET_OT_OT_per_epoch_attn.py main()
    (:1068-1358): coupling from the full train set before epoch 1 and
    after every epoch except the last; forward requires Tv.
  * variant "base" — MRI_PET_OT.py main() (:962-1170): in-batch FOT inside
    the train step; per-epoch coupling used for validation only.
  * variant "mmfusion" — the no-OT baseline (trainer absent from the
    reference tree; recreated per SURVEY.md §7 to reproduce
    best_mmfusion_results.csv).
All three: AdamW(wd=1e-5) + ReduceLROnPlateau(0.5, patience 5) stepped per
epoch on val loss, best-by-val-loss checkpointing, fusion-style
results.txt, final confusion matrix (+ t-SNE of best-model logits for the
flagship).
"""

from __future__ import annotations

import json
import os
import time
from collections import deque
from dataclasses import dataclass

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from otfusion_tpu.data.loader import (
    Loader,
    MultimodalLoader,
    _VolumeCache,
    feed_dtype_for,
    prefetch,
)
from otfusion_tpu.metrics.classification import classification_metrics
from otfusion_tpu.models import MultimodalOTFusion, ResNet3DClassifier
from otfusion_tpu.train.coupling import CouplingService
from otfusion_tpu.train.steps import (
    make_feature_extract_step,
    make_fusion_eval_step,
    make_fusion_train_step,
    make_unimodal_eval_step,
    make_unimodal_train_step,
)
from otfusion_tpu.train.train_state import (
    ReduceLROnPlateau,
    create_train_state,
    set_learning_rate,
)
from otfusion_tpu.utils.checkpoint import (
    flush_checkpoints,
    load_metadata,
    restore_backbone,
    restore_checkpoint,
    save_checkpoint,
)
from otfusion_tpu.utils.plotting import (
    save_confusion_matrix_png,
    save_tsne_png,
)
from otfusion_tpu.utils.reporting import ResultsWriter


@dataclass
class EpochResult:
    train_loss: float
    train_acc: float
    val_loss: float
    val_acc: float
    metrics: Dict[str, float]


def _is_primary() -> bool:
    """Artifact-owning process: process 0 (single-process runs always
    qualify). Multi-host runs write results.txt / checkpoints / plots
    once, not once per host."""
    return jax.process_index() == 0


def _barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process) — used before
    restoring a checkpoint another process may still be writing."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


class _NullWriter:
    """results.txt stand-in on non-primary hosts."""

    def epoch_row(self, *a, **k):
        pass

    def summary(self, *a, **k):
        pass


def _append_jsonl(path, record):
    """Structured per-epoch metrics stream (one JSON object per line) —
    the machine-readable complement of results.txt. Primary-process only
    under multi-host. Returns the byte offset the line was written at
    (None on non-primary processes), for `_rewrite_last_jsonl`."""
    if not _is_primary():
        return None
    with open(path, "a") as f:
        offset = f.tell()
        f.write(json.dumps(record, default=float) + "\n")
    return offset


def _rewrite_last_jsonl(path, record, offset):
    """Replace the tail line written at ``offset`` in O(1), not O(file).

    The epoch row is appended right after eval so a crash during the
    (potentially minutes-long) checkpoint save or end-of-epoch coupling
    solve cannot lose a completed epoch's metrics; once those trailing
    phases finish, the same row is replaced with the complete record
    (full phase_seconds, post-plateau-scheduler lr). Seek+truncate keeps
    every earlier (complete) line intact if the process dies mid-write —
    the same exposure the original append already has — without
    re-reading and rewriting the whole stream each epoch."""
    if not _is_primary() or offset is None:
        return
    with open(path, "r+") as f:
        f.seek(offset)
        f.truncate()
        f.write(json.dumps(record, default=float) + "\n")


def _save_tv(save_path, tv):
    """Persist the flagship's serving coupling (primary-only, atomic).

    Written at every best-checkpoint save AND after the post-loop
    best-model re-evaluation, so any best_model/ on disk always has a
    t_feature.npy beside it for cli/predict.py — a preempted multi-day
    run stays servable. tmp+rename keeps the previous coupling valid if
    the process dies mid-write."""
    if not _is_primary():
        return
    from otfusion_tpu.utils.checkpoint import _to_host

    path = os.path.join(save_path, "t_feature.npy")
    tmp = path + ".tmp.npy"
    np.save(tmp, _to_host(tv))
    os.replace(tmp, path)


class _PhaseClock:
    """Wall-clock split of one epoch into named phases: call the
    instance at each phase boundary; ``phases`` maps tag -> seconds
    since the previous boundary (logged as ``phase_seconds``)."""

    def __init__(self):
        self.t0 = time.time()
        self._last = self.t0
        self.phases = {}

    def __call__(self, tag):
        now = time.time()
        self.phases[tag] = round(now - self._last, 3)
        self._last = now

    def elapsed(self):
        return time.time() - self.t0


class _MaybeProfile:
    """jax.profiler trace for one epoch when ``profile_dir`` is set."""

    def __init__(self, profile_dir, epoch, profile_epoch=1):
        self.active = profile_dir is not None and epoch == profile_epoch
        self.profile_dir = profile_dir

    def __enter__(self):
        if self.active:
            jax.profiler.start_trace(str(self.profile_dir))
        return self

    def __exit__(self, *exc):
        if self.active:
            jax.profiler.stop_trace()
        return False


def _global_n(local_n: int) -> int:
    """Global batch size: the step's loss/correct reduce over the GLOBAL
    batch, so metric weighting must too. Host-local loaders (multi-host
    ``host_shard``) see only their row block; sum the counts."""
    if jax.process_count() > 1:
        from otfusion_tpu.parallel.multihost import global_batch_size

        return global_batch_size(local_n)
    return int(local_n)


# In-flight steps before fetching metrics (see _run_train_epoch). 0
# restores the fetch-every-step behaviour (A/B measurement knob).
_PIPELINE_LAG = int(os.environ.get("OTFUSION_PIPELINE_LAG", "2"))


def _run_train_epoch(train_step, state, loader, extra_args, rng_base):
    total_loss, total_correct, total_n = 0.0, 0, 0
    # Batches stay host numpy: the jitted step transfers them under its
    # own in_shardings (sharded over the mesh in the DP path). prefetch
    # assembles batch i+1 on a background thread while step i computes.
    #
    # Metric fetches run LAGGED: a synchronous float(met["loss"]) after
    # every dispatch stalls the host on a device->host round-trip (tens
    # of ms through this environment's TPU tunnel) before step i+1 can
    # even be dispatched, leaving the device idle between steps. Keeping
    # a small deque of un-fetched metrics lets JAX's async dispatch queue
    # step i+1 while step i computes; the lag is bounded so at most
    # ~_PIPELINE_LAG+1 batches of inputs are in flight (HBM-bounded).
    pending = deque()
    for i, batch in enumerate(prefetch(iter(loader))):
        rng = jax.random.fold_in(rng_base, i)
        state, met = train_step(state, *batch, *extra_args, rng)
        pending.append((met, _global_n(batch[-1].shape[0])))
        if len(pending) > _PIPELINE_LAG:
            met, n = pending.popleft()
            total_loss += float(met["loss"]) * n
            total_correct += int(met["correct"])
            total_n += n
    for met, n in pending:
        total_loss += float(met["loss"]) * n
        total_correct += int(met["correct"])
        total_n += n
    return state, total_loss / total_n, total_correct / total_n


# Largest forward-only batch x voxel product the auto-scaled eval /
# feature batches will pick: 16 x 128^3. B=16 @128^3 is measured good on
# a v5e (215 ms forward, 74 samples/s, depth-101 bf16); B=32 @128^3 was
# NOT compilable in this environment within a 10-minute probe (the same
# server-side resource ceiling that HTTP-500s the B=16 train step and
# 2-microbatch grad-accum at this shape — docs/perf_notes.md lever 3).
# Explicit --eval/feature-batch-size values are never capped.
_AUTO_FWD_VOXEL_BUDGET = 16 * 128**3


def _resolve_eval_batch(eval_batch_size, batch_size, target_shape=None,
                        flag="--eval-batch-size"):
    """--eval-batch-size / --feature-batch-size policy: default 4x the
    train batch (eval/feature passes are forward-only — no stored
    backward activations — so 4x stays far below the train step's
    fwd+bwd HBM peak), voxel-budget capped at large volume shapes (see
    _AUTO_FWD_VOXEL_BUDGET); explicit values validated but never
    capped."""
    if eval_batch_size is not None and eval_batch_size < 1:
        raise ValueError(
            f"{flag} must be >= 1, got {eval_batch_size}")
    if eval_batch_size is not None:
        return eval_batch_size
    auto = 4 * batch_size
    if target_shape is not None:
        voxels = int(np.prod(target_shape))
        cap = max(1, _AUTO_FWD_VOXEL_BUDGET // max(1, voxels))
        # never auto-pick below the train batch itself (the train step
        # already proves that batch fits with backward activations)
        auto = max(min(auto, cap), batch_size)
    return auto


def _resolve_stem(s2d_stem, resume, save_path):
    """Tri-state ``--s2d-stem`` policy (VERDICT r3 weak #1): ``None``
    (the CLI default) picks the space-to-depth stem for FRESH trainings
    — it is an exact weight-space rewrite of the plain stem, measured
    ~12% faster at the flagship shape (docs/perf_notes.md lever 1) — but
    a ``--resume`` keeps the stem recorded in the run's
    ``model_config.json``: Adam second moments are not exactly
    rewritable between stem layouts, so flipping a resumed run would
    silently degrade it. Explicit True/False is honoured, except that
    contradicting a resumed run's recorded stem raises (the restore
    would otherwise die on an opaque shape mismatch)."""
    recorded = None
    cfg_path = os.path.join(save_path, "model_config.json")
    if resume and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            recorded = bool(json.load(f).get("s2d_stem", False))
    elif resume and os.path.isdir(os.path.join(save_path, "latest")):
        recorded = False  # pre-manifest run: always the plain stem
    if s2d_stem is None:
        return recorded if recorded is not None else True
    if recorded is not None and bool(s2d_stem) != recorded:
        raise ValueError(
            f"--resume run at {save_path} was trained with "
            f"s2d_stem={recorded}; the optimiser state cannot be "
            "rewritten between stem layouts — drop the stem flag to "
            "keep the recorded one")
    return bool(s2d_stem)


def _run_eval_epoch(eval_step, state, loader, extra_args,
                    collect_logits=False):
    total_loss, total_correct, total_n = 0.0, 0, 0
    preds: List[int] = []
    targets: List[int] = []
    logits_all = []
    multiproc = jax.process_count() > 1

    def _drain(out, n):
        nonlocal total_loss, total_correct, total_n
        total_loss += float(out["loss"]) * n
        total_correct += int(out["correct"])
        total_n += n
        # preds come back replicated (global batch order)
        preds.extend(np.asarray(out["preds"]).tolist())
        if collect_logits:
            logits_all.append(np.asarray(out["logits"]))

    # Same lagged-fetch pipelining as _run_train_epoch: dispatch batch
    # i+1 before fetching batch i's metrics (the per-batch host fetch
    # otherwise serialises a tunnel round-trip into every step).
    pending = deque()
    for batch in prefetch(iter(loader)):
        arrays = batch
        out = eval_step(state, *arrays, *extra_args)
        pending.append((out, _global_n(arrays[-1].shape[0])))
        # targets are host-local rows under multi-host loading — gather
        # them so the confusion metrics see the same global order on
        # every process (host-side collective; independent of the
        # device fetch, so it stays in-loop).
        if multiproc:
            from otfusion_tpu.parallel.multihost import allgather_rows

            targets.extend(allgather_rows(np.asarray(arrays[-1])).tolist())
        else:
            targets.extend(np.asarray(arrays[-1]).tolist())
        if len(pending) > _PIPELINE_LAG:
            _drain(*pending.popleft())
    for out, n in pending:
        _drain(out, n)
    logits = np.concatenate(logits_all) if logits_all else None
    return total_loss / total_n, total_correct / total_n, preds, targets, logits


def run_fusion_training(
    *,
    samples: Sequence,
    train_idx: Sequence[int],
    val_idx: Sequence[int],
    class_names: Dict[str, int],
    variant: str,
    model_depth: int,
    # Second-modality (PET/T2) class-folder table, persisted in the
    # serving manifest so cli/predict.py can rebuild the paired dataset
    # exactly (a name heuristic cannot recover e.g. T1->T2 pairings).
    class_names_b: Optional[Dict[str, int]] = None,
    target_shape,
    batch_size: int,
    lr: float,
    epochs: int,
    seed: int,
    save_path: str,
    augment: bool = False,
    projection_dropout: float = 0.3,
    max_jax_samples: int = 64,
    ot_epsilon: float = 5e-3,
    gw_max_iterations: int = 2000,
    sinkhorn_max_iterations: int = 2000,
    # In-batch FOT solver controls (base variant; threshold 0 pins the
    # iteration count at fot_max_iterations — the reduction-order
    # equivalence tests use this to disable the early exit).
    fot_max_iterations: int = 2000,
    fot_threshold: float = 1e-3,
    grad_accum: int = 1,
    feature_batch_size: Optional[int] = None,
    eval_batch_size: Optional[int] = None,
    mri_pretrained: Optional[str] = None,
    pet_pretrained: Optional[str] = None,
    mri_backbone: str = "",
    pet_backbone: str = "",
    remat: bool = False,
    # None = auto: s2d for fresh runs, the recorded stem on --resume
    # (_resolve_stem)
    s2d_stem: Optional[bool] = None,
    raw_plan: bool = False,
    dtype=jnp.float32,
    num_classes: int = 2,
    results_title: str = (
        "Multimodal MRI-PET with Optimal Transport - ADNI Dataset"
    ),
    config_lines: Optional[Dict[str, object]] = None,
    progress: bool = True,
    profile_dir: Optional[str] = None,
    resume: bool = False,
    num_devices: int | str | None = None,
    tp_size: int = 1,
    num_workers: int = 8,
    # Cadence of the resumable "latest" checkpoint (the final epoch
    # always saves): the write-behind saver only hides the orbax write
    # while an epoch outlasts it, so at small epoch times the
    # every-epoch default IS the epoch bottleneck (measured 22-33 s
    # checkpoint phase vs ~1 s train+eval on a loaded 1-CPU host).
    latest_every: int = 1,
) -> Dict[str, object]:
    if not len(val_idx) or not len(train_idx):
        raise ValueError(
            f"empty split: {len(train_idx)} train / {len(val_idx)} val "
            "samples — increase --val-fraction or the cohort size")
    os.makedirs(save_path, exist_ok=True)
    results_file = os.path.join(save_path, "results.txt")
    model_dir = os.path.join(save_path, "best_model")
    s2d_stem = _resolve_stem(s2d_stem, resume, save_path)

    # Data-parallel mesh over the first N chips (``0``/"auto" = all).
    # GSPMD is semantics-preserving, so every number below (losses,
    # metrics, BatchNorm stats) matches the single-device trainer.
    from otfusion_tpu.parallel import place_state, resolve_mesh

    # ``tp_size > 1`` upgrades the 1-D data mesh to a 2-D (data, model)
    # mesh: fusion-trunk Dense kernels column-shard over ``model``
    # (place_state), batches shard over ``data`` (the step factories
    # detect the model axis and leave the state sharding committed).
    mesh = resolve_mesh(num_devices, tp_size)
    if mesh is not None and jax.process_count() > 1:
        # Establish the Gloo/collective cliques while the processes are
        # still in lockstep — the first context handshake has a hard
        # 30 s window that the big step compiles below can skew past
        # (parallel/multihost.py:warmup_collectives).
        from otfusion_tpu.parallel import warmup_collectives

        warmup_collectives(mesh)

    def _place(s):
        return place_state(s, mesh) if mesh is not None else s

    cache = _VolumeCache(target_shape, num_workers=num_workers)
    train_samples = [samples[i] for i in train_idx]
    val_samples = [samples[i] for i in val_idx]
    # Multi-host: each process walks the same seeded batch order but
    # loads only its contiguous row block (parallel/multihost.py).
    host_shard = None
    if jax.process_count() > 1:
        from otfusion_tpu.parallel.multihost import host_shard_spec

        host_shard = host_shard_spec()
    # bf16 mode ships bf16 volumes (bit-identical — the stem conv casts
    # anyway; halves H2D bytes + batch HBM, see loader.feed_dtype_for)
    feed = feed_dtype_for(dtype)
    train_loader = MultimodalLoader(
        train_samples, target_shape, batch_size, shuffle=True,
        augment=augment, seed=seed, cache=cache, host_shard=host_shard,
        feed_dtype=feed,
    )
    # Deterministic-order loader for feature extraction (no augmentation).
    # The pass is forward-only (eval mode, per-sample independent), so a
    # larger batch than the train step's fits in HBM and cuts the
    # per-epoch coupling-prep wall time without changing the coupling:
    # the loader order is the dataset order at any batch size, and
    # group_and_pad sees the identical feature rows. Memory: the pass
    # runs the backbone in eval mode with NO stored backward
    # activations, so its peak HBM at 4x the train batch stays well
    # below the train step's fwd+bwd peak (the OOM edge the init probe
    # below worries about is eager model.init, a different code path).
    # Pass --feature-batch-size to pin it (e.g. to --batch-size).
    feat_batch = _resolve_eval_batch(feature_batch_size, batch_size,
                                     target_shape,
                                     flag="--feature-batch-size")
    feat_loader = MultimodalLoader(
        train_samples, target_shape, feat_batch, shuffle=False, cache=cache,
        host_shard=host_shard, feed_dtype=feed,
    )
    # Eval is forward-only with running BN stats and sample-weighted loss
    # accumulation (_run_eval_epoch), so a larger eval batch is EXACT (up
    # to fp reduction order) and cuts the eval phase the same way the
    # feature pass above does — same 4x default, same HBM argument.
    eval_batch = _resolve_eval_batch(eval_batch_size, batch_size,
                                     target_shape)
    val_loader = MultimodalLoader(
        val_samples, target_shape, eval_batch, shuffle=False, cache=cache,
        host_shard=host_shard, feed_dtype=feed,
    )

    model = MultimodalOTFusion(
        num_classes=num_classes,
        depth=model_depth,
        projection_dropout=projection_dropout,
        variant=variant,
        mri_backbone=mri_backbone,
        pet_backbone=pet_backbone,
        remat=remat,
        s2d_stem=s2d_stem,
        raw_plan=raw_plan,
        dtype=dtype,
    )
    if _is_primary():
        # Serving manifest: everything cli/predict.py needs to rebuild
        # this exact model around the best checkpoint.
        with open(os.path.join(save_path, "model_config.json"), "w") as f:
            json.dump({
                "kind": "fusion", "variant": variant,
                "model_depth": model_depth,
                "target_shape": list(target_shape),
                "num_classes": num_classes,
                "projection_dropout": projection_dropout,
                "mri_backbone": mri_backbone,
                "pet_backbone": pet_backbone,
                "s2d_stem": s2d_stem, "raw_plan": raw_plan,
                "dtype": np.dtype(dtype).name,
                "class_names": class_names,
                "class_names_b": class_names_b,
            }, f, indent=2)
    mri0, pet0, _ = next(iter(feat_loader))
    # Init/shape-probe at batch 1: feat_loader batches are feature-pass
    # sized (4x the train batch by default), and model.init runs an eager
    # forward — at the production config (depth-101 @128^3 bf16) a
    # full-feature-batch init is a new HBM peak on a setup that already
    # sits at the OOM edge. Shapes are all init needs.
    mri0, pet0 = mri0[:1], pet0[:1]

    from otfusion_tpu.models.fusion import build_fusion_backbone

    def _backbone_dim(name_attr, sample):
        backbone = build_fusion_backbone(
            getattr(model, name_attr), model.depth, model.dtype,
            remat=model.remat, s2d_stem=model.s2d_stem)
        out = jax.eval_shape(
            lambda x: backbone.init_with_output(
                {"params": jax.random.key(0),
                 "dropout": jax.random.key(1)}, x, train=False)[0],
            jnp.asarray(sample),
        )
        out = out[1] if isinstance(out, tuple) else out
        return out.shape[-1]

    d_mri = _backbone_dim("mri_backbone", mri0)
    d_pet = _backbone_dim("pet_backbone", pet0)
    uniform_tv = jnp.full((d_pet, d_mri), 1.0 / (d_pet * d_mri),
                          jnp.float32)
    needs_tv = variant == "per_epoch_attn"
    init_tv = uniform_tv if needs_tv else None
    state = create_train_state(
        model, jax.random.key(seed),
        (jnp.asarray(mri0), jnp.asarray(pet0)),
        lr, optimizer="adamw", t_feature=init_tv,
    )
    if mri_pretrained:
        state = restore_backbone(state, mri_pretrained, "mri_backbone",
                                 depth=model_depth, backbone=mri_backbone)
    if pet_pretrained:
        state = restore_backbone(state, pet_pretrained, "pet_backbone",
                                 depth=model_depth, backbone=pet_backbone)
    state = _place(state)

    if mesh is not None:
        from otfusion_tpu.parallel import make_dp_fusion_steps

        train_step, eval_step, feat_step = make_dp_fusion_steps(
            model, mesh, state_template=state,
            in_batch_fot=(variant == "base"),
            fot_epsilon=1e-3,
            fot_max_iterations=fot_max_iterations,
            fot_threshold=fot_threshold,
            grad_accum=grad_accum,
        )
    else:
        train_step = make_fusion_train_step(
            model,
            in_batch_fot=(variant == "base"),
            fot_epsilon=1e-3,
            fot_max_iterations=fot_max_iterations,
            fot_threshold=fot_threshold,
            grad_accum=grad_accum,
            # Donate the input state: the old parameter/optimiser buffers
            # are freed during the step — at depth-101/128^3/B8 that
            # headroom is the difference between fitting HBM and
            # ResourceExhausted.
            donate=True,
        )
        eval_step = make_fusion_eval_step(model)
        feat_step = make_feature_extract_step(model)
    svc = None
    # Only the flagship consumes a per-epoch coupling; the base variant
    # solves in-batch inside its train step and its per-epoch eval
    # coupling is provably inert (see the note in the epoch loop).
    if variant == "per_epoch_attn":
        svc = CouplingService(
            feat_step,
            n_labels=num_classes,
            max_samples_per_label=max_jax_samples,
            epsilon=ot_epsilon,
            gw_max_iterations=gw_max_iterations,
            sinkhorn_max_iterations=sinkhorn_max_iterations,
            fot_epsilon=ot_epsilon,
            mesh=mesh,
        )

    writer = (
        ResultsWriter(results_file, results_title, config_lines or {},
                      style="fusion", append=resume)
        if _is_primary() else _NullWriter()
    )
    scheduler = ReduceLROnPlateau(lr, factor=0.5, patience=5)
    best_val_loss = float("inf")
    best_summary = None
    rng_base = jax.random.key(seed + 1)
    start_epoch = 1

    # True mid-training resume from the "latest" checkpoint (optimiser
    # state + scheduler state included); the reference exposes a
    # --start_epoch flag but has no resume logic (SURVEY.md §5).
    latest_dir = os.path.join(save_path, "latest")
    if resume and os.path.isdir(latest_dir):
        meta = load_metadata(latest_dir) or {}
        state = _place(restore_checkpoint(latest_dir, state,
                                          include_opt_state=True))
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_val_loss = float(meta.get("best_val_loss", float("inf")))
        best_summary = meta.get("best_summary")
        scheduler.lr = float(meta.get("lr", lr))
        scheduler.best = float(meta.get("sched_best", float("inf")))
        scheduler.bad_epochs = int(meta.get("sched_bad_epochs", 0))
        state = set_learning_rate(state, scheduler.lr)
        print(f"Resumed from {latest_dir} at epoch {start_epoch}")

    def compute_tv():
        # prefetch: overlap the loader's host I/O (cold first epoch) with
        # the device forward passes, same as the train/eval epochs
        return svc.compute(state, prefetch(iter(feat_loader)))

    tv = compute_tv() if needs_tv else None

    history = []
    jsonl_path = os.path.join(save_path, "metrics.jsonl")
    for epoch in range(start_epoch, epochs + 1):
        _clock = _PhaseClock()

        with _MaybeProfile(profile_dir, epoch):
            state, train_loss, train_acc = _run_train_epoch(
                train_step, state, train_loader,
                (tv if needs_tv else None,),
                jax.random.fold_in(rng_base, epoch),
            )
        _clock("train")
        # Note: the base reference recomputes the coupling each epoch and
        # hands it to evaluate (MRI_PET_OT.py:1072-1101), but evaluation
        # never uses it (ot_loss is 0 outside training, :663-707), so the
        # solve is skipped here — identical metrics, one less EGW+FOT pass.
        val_loss, val_acc, preds, targets, _ = _run_eval_epoch(
            eval_step, state, val_loader, (tv if needs_tv else None,)
        )
        _clock("eval")
        metrics = classification_metrics(targets, preds, num_classes)
        writer.epoch_row(epoch, train_loss, train_acc, val_loss, val_acc,
                         metrics)
        history.append(EpochResult(train_loss, train_acc, val_loss, val_acc,
                                   metrics))
        if progress:
            print(
                f"Epoch {epoch:03d} | train_loss={train_loss:.4f} "
                f"train_acc={train_acc:.4f} | val_loss={val_loss:.4f} "
                f"val_acc={val_acc:.4f} | f1={metrics['f1']:.4f} "
                f"({_clock.elapsed():.1f}s)"
            )

        # The jsonl row must log the coupling epoch N TRAINED WITH, not
        # the end-of-epoch solve consumed by epoch N+1 — capture the log
        # before compute_tv() overwrites it.
        epoch_coupling_log = svc.last_log if svc else None

        def _epoch_record():
            return {
                "epoch": epoch, "train_loss": train_loss,
                "train_acc": train_acc, "val_loss": val_loss,
                "val_acc": val_acc, **metrics,
                "epoch_seconds": round(_clock.elapsed(), 3),
                # wall-clock split of the full epoch: train / eval /
                # checkpoint (best+latest saves) / coupling (feature
                # pass + EGW/FOT solve) — the observability needed to
                # see which phase an epoch actually spends its time in.
                "phase_seconds": dict(_clock.phases),
                "coupling_log": epoch_coupling_log,
                "lr": scheduler.lr,
            }

        # Append now so a crash/preemption during the checkpoint save or
        # the minutes-long end-of-epoch coupling solve cannot lose this
        # completed epoch's row; rewritten with the trailing phases (and
        # the post-plateau-scheduler lr) once they finish.
        row_offset = _append_jsonl(jsonl_path, _epoch_record())

        if val_loss < best_val_loss:
            best_val_loss = val_loss
            best_summary = {"epoch": epoch, "val_loss": val_loss,
                            "val_acc": val_acc, **metrics}
            # collective under multi-host: every process participates
            # (orbax barriers internally); primary owns the filesystem
            save_checkpoint(model_dir, state, best_summary)
            if needs_tv and tv is not None:
                # Keep every best checkpoint servable: persist the
                # coupling these weights were trained to attend with,
                # so a preempted run still pairs best_model/ with a
                # valid t_feature.npy. The post-loop block overwrites
                # it with the coupling recomputed from the restored
                # best state (the exact serving pairing).
                _save_tv(save_path, tv)

        new_lr = scheduler.step(val_loss)
        state = set_learning_rate(state, new_lr)

        if epoch % max(1, latest_every) == 0 or epoch == epochs:
            save_checkpoint(
                latest_dir, state,
                {"epoch": epoch, "best_val_loss": best_val_loss,
                 "best_summary": best_summary, "lr": scheduler.lr,
                 "sched_best": scheduler.best,
                 "sched_bad_epochs": scheduler.bad_epochs},
                include_opt_state=True,
            )
        _clock("checkpoint")

        if needs_tv and epoch < epochs:
            tv = compute_tv()
            _clock("coupling")
        _rewrite_last_jsonl(jsonl_path, _epoch_record(), row_offset)

    writer.summary(best_val_loss, best_summary, model_dir)

    # Best-model final evaluation + artifacts (attn:1316-1356).
    flush_checkpoints()  # drain async write-behind ("latest" included)
    _barrier("restore-best")  # primary may still be flushing the ckpt
    state = _place(restore_checkpoint(model_dir, state))
    final_tv = compute_tv() if needs_tv else None
    _, _, preds, targets, logits = _run_eval_epoch(
        eval_step, state, val_loader, (final_tv,), collect_logits=True,
    )
    if _is_primary():
        save_confusion_matrix_png(
            targets, preds, class_names,
            os.path.join(save_path, "confusion_matrix.png"),
        )
        if (variant == "per_epoch_attn" and logits is not None
                and len(logits) > 3):
            save_tsne_png(logits, targets,
                          os.path.join(save_path, "tsne_best_val.png"))
        if needs_tv:
            # Persist the final coupling: the flagship's attention
            # consumes Tv at inference, so without it a trained model is
            # not servable standalone (the reference recomputes the plan
            # from TRAIN-set features every epoch and never saves it,
            # attn:1233-1296). cli/predict.py restores this.
            _save_tv(save_path, final_tv)

    return {
        "best_val_loss": best_val_loss,
        "best_summary": best_summary,
        "history": history,
        "model_dir": model_dir,
    }


def run_unimodal_training(
    *,
    samples: Sequence,
    train_idx: Sequence[int],
    val_idx: Sequence[int],
    class_names: Dict[str, int],
    model_depth: int,
    target_shape,
    batch_size: int,
    lr: float,
    epochs: int,
    seed: int,
    save_path: str,
    augment: bool = False,
    # None = auto: s2d for fresh runs, the recorded stem on --resume
    # (_resolve_stem)
    s2d_stem: Optional[bool] = None,
    grad_accum: int = 1,
    eval_batch_size: Optional[int] = None,
    dtype=jnp.float32,
    results_title: str = "3D ResNet Training Results - ADNI MRI Dataset",
    config_lines: Optional[Dict[str, object]] = None,
    progress: bool = True,
    profile_dir: Optional[str] = None,
    resume: bool = False,
    num_devices: int | str | None = None,
    tp_size: int = 1,
    num_workers: int = 8,
    latest_every: int = 1,  # see run_fusion_training
) -> Dict[str, object]:
    if not len(val_idx) or not len(train_idx):
        raise ValueError(
            f"empty split: {len(train_idx)} train / {len(val_idx)} val "
            "samples — increase --val-fraction or the cohort size")
    os.makedirs(save_path, exist_ok=True)
    results_file = os.path.join(save_path, "results.txt")
    model_dir = os.path.join(save_path, "best_model")
    num_classes = len(class_names)
    s2d_stem = _resolve_stem(s2d_stem, resume, save_path)

    from otfusion_tpu.parallel import place_state, resolve_mesh

    # ``tp_size > 1`` upgrades the 1-D data mesh to a 2-D (data, model)
    # mesh: fusion-trunk Dense kernels column-shard over ``model``
    # (place_state), batches shard over ``data`` (the step factories
    # detect the model axis and leave the state sharding committed).
    mesh = resolve_mesh(num_devices, tp_size)
    if mesh is not None and jax.process_count() > 1:
        # Establish the Gloo/collective cliques while the processes are
        # still in lockstep — the first context handshake has a hard
        # 30 s window that the big step compiles below can skew past
        # (parallel/multihost.py:warmup_collectives).
        from otfusion_tpu.parallel import warmup_collectives

        warmup_collectives(mesh)

    def _place(s):
        return place_state(s, mesh) if mesh is not None else s

    cache = _VolumeCache(target_shape, num_workers=num_workers)
    host_shard = None
    if jax.process_count() > 1:
        from otfusion_tpu.parallel.multihost import host_shard_spec

        host_shard = host_shard_spec()
    feed = feed_dtype_for(dtype)  # bf16 mode ships bf16 volumes (exact)
    train_loader = Loader(
        [samples[i] for i in train_idx], target_shape, batch_size,
        shuffle=True, augment=augment, seed=seed, cache=cache,
        host_shard=host_shard, feed_dtype=feed,
    )
    # forward-only eval at a larger batch is exact — see the fusion
    # trainer's val_loader note
    val_loader = Loader(
        [samples[i] for i in val_idx], target_shape,
        _resolve_eval_batch(eval_batch_size, batch_size, target_shape),
        shuffle=False, cache=cache, host_shard=host_shard, feed_dtype=feed,
    )

    model = ResNet3DClassifier(depth=model_depth, num_classes=num_classes,
                               s2d_stem=s2d_stem, dtype=dtype)
    if _is_primary():
        # Serving manifest for cli/predict.py (fusion-loop counterpart
        # above).
        with open(os.path.join(save_path, "model_config.json"), "w") as f:
            json.dump({
                "kind": "unimodal", "model_depth": model_depth,
                "target_shape": list(target_shape),
                "num_classes": num_classes, "s2d_stem": s2d_stem,
                "dtype": np.dtype(dtype).name,
                "class_names": class_names,
            }, f, indent=2)
    vol0, _ = next(iter(val_loader)) if len(val_loader) else next(iter(train_loader))
    # init at batch 1 — model.init runs an eager forward; shapes suffice
    state = create_train_state(
        model, jax.random.key(seed), (jnp.asarray(vol0[:1]),), lr,
        optimizer="adam",
    )
    state = _place(state)
    if mesh is not None:
        from otfusion_tpu.parallel import make_dp_unimodal_steps

        train_step, eval_step = make_dp_unimodal_steps(
            model, mesh, state_template=state, grad_accum=grad_accum)
    else:
        train_step = make_unimodal_train_step(model, donate=True,
                                              grad_accum=grad_accum)
        eval_step = make_unimodal_eval_step(model)

    writer = (
        ResultsWriter(results_file, results_title, config_lines or {},
                      style="unimodal", append=resume)
        if _is_primary() else _NullWriter()
    )
    best_val_loss = float("inf")
    best_summary = None
    rng_base = jax.random.key(seed + 1)
    start_epoch = 1

    latest_dir = os.path.join(save_path, "latest")
    if resume and os.path.isdir(latest_dir):
        meta = load_metadata(latest_dir) or {}
        state = _place(restore_checkpoint(latest_dir, state,
                                          include_opt_state=True))
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_val_loss = float(meta.get("best_val_loss", float("inf")))
        best_summary = meta.get("best_summary")
        print(f"Resumed from {latest_dir} at epoch {start_epoch}")

    history = []
    jsonl_path = os.path.join(save_path, "metrics.jsonl")
    for epoch in range(start_epoch, epochs + 1):
        _clock = _PhaseClock()

        with _MaybeProfile(profile_dir, epoch):
            state, train_loss, train_acc = _run_train_epoch(
                train_step, state, train_loader, (),
                jax.random.fold_in(rng_base, epoch),
            )
        _clock("train")
        val_loss, val_acc, preds, targets, _ = _run_eval_epoch(
            eval_step, state, val_loader, ()
        )
        _clock("eval")
        metrics = classification_metrics(targets, preds, num_classes)
        writer.epoch_row(epoch, train_loss, train_acc, val_loss, val_acc,
                         metrics)
        history.append(EpochResult(train_loss, train_acc, val_loss, val_acc,
                                   metrics))
        if progress:
            print(
                f"Epoch {epoch:03d} | train_loss={train_loss:.4f} "
                f"train_acc={train_acc:.4f} | val_loss={val_loss:.4f} "
                f"val_acc={val_acc:.4f} | f1={metrics['f1']:.4f} "
                f"({_clock.elapsed():.1f}s)"
            )
        def _epoch_record():
            return {
                "epoch": epoch, "train_loss": train_loss,
                "train_acc": train_acc, "val_loss": val_loss,
                "val_acc": val_acc, **metrics,
                "epoch_seconds": round(_clock.elapsed(), 3),
                "phase_seconds": dict(_clock.phases),
            }

        # durable-then-complete, as in the fusion loop: the row exists
        # before the checkpoint saves, then gains the checkpoint timing
        row_offset = _append_jsonl(jsonl_path, _epoch_record())
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            best_summary = {"epoch": epoch, "val_loss": val_loss,
                            "val_acc": val_acc, **metrics}
            # collective under multi-host (see fusion loop note)
            save_checkpoint(model_dir, state, best_summary)

        if epoch % max(1, latest_every) == 0 or epoch == epochs:
            save_checkpoint(
                latest_dir, state,
                {"epoch": epoch, "best_val_loss": best_val_loss,
                 "best_summary": best_summary},
                include_opt_state=True,
            )
        _clock("checkpoint")
        _rewrite_last_jsonl(jsonl_path, _epoch_record(), row_offset)

    writer.summary(best_val_loss, best_summary, model_dir)

    # Best-model artifacts: confusion matrix + t-SNE of pooled features
    # (3D_resnet.py:1016-1047).
    flush_checkpoints()  # drain async write-behind ("latest" included)
    _barrier("restore-best")
    state = _place(restore_checkpoint(model_dir, state))
    feats_all, preds, targets = [], [], []
    multiproc = jax.process_count() > 1
    for batch in val_loader:
        arrays = batch
        out = eval_step(state, *arrays)
        preds.extend(np.asarray(out["preds"]).tolist())
        if multiproc:
            from otfusion_tpu.parallel.multihost import allgather_rows

            targets.extend(allgather_rows(np.asarray(arrays[-1])).tolist())
        else:
            targets.extend(np.asarray(arrays[-1]).tolist())
        feats_all.append(np.asarray(out["features"]))
    if _is_primary():
        save_confusion_matrix_png(
            targets, preds, class_names,
            os.path.join(save_path, "confusion_matrix.png"),
        )
        feats = np.concatenate(feats_all) if feats_all else None
        if feats is not None and len(feats) > 3:
            save_tsne_png(
                feats, targets,
                os.path.join(save_path, "tsne_best_val.png"),
                title="t-SNE of Validation Predictions (Best 3D ResNet)")

    return {
        "best_val_loss": best_val_loss,
        "best_summary": best_summary,
        "history": history,
        "model_dir": model_dir,
    }
