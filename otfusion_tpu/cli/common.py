"""Shared CLI plumbing: argparse groups, seeding, split resolution."""

from __future__ import annotations

import argparse
import json
import os
import random
from pathlib import Path

import numpy as np


def add_common_args(parser: argparse.ArgumentParser, *, epochs: int,
                    batch_size: int, lr: float, save_path: str,
                    data_dir: str, num_workers: int = 4) -> None:
    parser.add_argument("--data-dir", type=str, default=data_dir,
                        help="Root directory of the ADNI class folders")
    parser.add_argument("--epochs", type=int, default=epochs)
    parser.add_argument("--batch-size", type=int, default=batch_size)
    parser.add_argument("--num-workers", type=int, default=num_workers,
                        help="Volume-loading threads (reference DataLoader "
                             "num_workers parity)")
    parser.add_argument("--lr", type=float, default=lr)
    parser.add_argument("--val-fraction", type=float, default=0.2)
    parser.add_argument("--target-shape", type=int, nargs=3,
                        default=(128, 128, 128), metavar=("D", "H", "W"))
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--save-path", type=str, default=save_path)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from <save-path>/latest (true "
                             "mid-training resume incl. optimiser and "
                             "LR-scheduler state; TPU-native addition)")
    parser.add_argument("--device", type=str, default="tpu",
                        help="Accelerator platform (tpu; cpu for debugging)")
    parser.add_argument("--num-devices", type=str, default="default",
                        help="Data-parallel chips: N, or 'auto' for all "
                             "visible devices (batch shards over a 1-D "
                             "mesh, gradients all-reduce over ICI; "
                             "TPU-native addition). Default: 1 device "
                             "single-process, 'auto' under --multihost "
                             "(a multi-process mesh must span the whole "
                             "group — explicit N that doesn't raises)")
    parser.add_argument("--multihost", action="store_true",
                        help="Join a jax.distributed process group before "
                             "backend init (coordinator/process env vars "
                             "per JAX convention); loaders shard rows "
                             "per host, process 0 owns artifacts "
                             "(TPU-native addition)")
    parser.add_argument("--tp-size", type=int, default=1,
                        help="Tensor-parallel ways: with --num-devices N, "
                             "builds a 2-D (N/tp, tp) mesh; fusion-trunk "
                             "Dense kernels column-shard over the model "
                             "axis (TPU-native addition)")
    parser.add_argument("--max-samples-per-class", type=int, default=None)
    parser.add_argument("--load-patient-ids", type=str, default=None,
                        help="Fixed-split or patient-filter JSON")
    parser.add_argument("--model-depth", type=int, default=101,
                        choices=[10, 18, 34, 50, 101, 152, 200])
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="Compute dtype (TPU-native addition)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Capture a jax.profiler trace of epoch 1 "
                             "into this directory (TPU-native addition)")
    parser.add_argument("--s2d-stem", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="Space-to-depth ResNet stem: exact "
                             "weight-space equivalent of the stride-2 "
                             "7x7 stem that fills the MXU better "
                             "(pretrained imports are rewritten "
                             "losslessly; measured ~12%% faster at the "
                             "flagship shape). Default: ON for fresh "
                             "runs; --resume keeps the stem recorded in "
                             "the run's model_config.json (TPU-native "
                             "addition)")
    parser.add_argument("--latest-every", type=int, default=1,
                        help="Save the resumable 'latest' checkpoint "
                             "(params+optimiser) every N epochs instead "
                             "of every epoch; the final epoch always "
                             "saves. The write-behind saver hides the "
                             "write only while an epoch outlasts it — "
                             "at small epoch times the every-epoch "
                             "'latest' write IS the epoch bottleneck "
                             "(TPU-native addition)")
    parser.add_argument("--eval-batch-size", type=int, default=None,
                        help="Batch size for validation/eval epochs "
                             "(forward-only — no stored backward "
                             "activations — so a larger batch than "
                             "--batch-size fits; default 4x "
                             "--batch-size). Eval uses running BN "
                             "stats and sample-weighted accumulation, "
                             "so metrics are batch-size independent "
                             "(TPU-native addition)")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Split each batch into N sequential "
                             "microbatches inside the jitted step "
                             "(lax.scan): one optimiser update per "
                             "batch with averaged gradients, activation "
                             "memory of a single microbatch — train at "
                             "effective batches HBM cannot hold whole. "
                             "Partial final batches run unaccumulated "
                             "(TPU-native addition)")


def add_ot_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--max-jax-samples", type=int, default=64,
                        help="Max samples per label for OT computation")
    parser.add_argument("--ot-epsilon", type=float, default=5e-3)
    parser.add_argument("--gw-max-iterations", type=int, default=2000)
    parser.add_argument("--sinkhorn-max-iterations", type=int, default=2000)
    parser.add_argument("--projection-dropout", type=float, default=0.3)
    parser.add_argument("--mri-pretrained", type=str, default=None,
                        help="Checkpoint dir of a unimodal MRI backbone")
    parser.add_argument("--pet-pretrained", type=str, default=None,
                        help="Checkpoint dir of a unimodal PET backbone")
    parser.add_argument("--mri-backbone", type=str, default="",
                        help="Registry backbone for MRI (e.g. unetr_vit, "
                             "medicalnet-10); empty = ResNet3D at "
                             "--model-depth")
    parser.add_argument("--pet-backbone", type=str, default="",
                        help="Registry backbone for PET; empty = ResNet3D")
    parser.add_argument("--remat", action="store_true",
                        help="Gradient-checkpoint the 3D ResNet blocks "
                             "(activation memory for large batches at "
                             "128^3; TPU-native addition)")
    parser.add_argument("--feature-batch-size", type=int, default=None,
                        help="Batch size for the per-epoch coupling's "
                             "feature-extraction pass (forward-only, so "
                             "a larger batch than --batch-size fits; "
                             "default 4x --batch-size). Per-sample eval-"
                             "mode outputs are batch-size independent, "
                             "so the coupling is unchanged")
    parser.add_argument("--raw-reference-plan", action="store_true",
                        help="Strict numerical reproduction of the "
                             "reference flagship's plan application: the "
                             "raw un-normalised pet_feat @ T.t() "
                             "(attn:728) instead of the column-"
                             "normalised barycentric projection (see "
                             "PARITY.md, behavioural deviations)")


def resolve_num_devices(value: str) -> "int | str | None":
    """--num-devices: 'auto' passes through, the unset default becomes
    None (resolve_mesh picks 1 single-process / 'auto' multi-process),
    anything else must be an int."""
    if value == "auto":
        return "auto"
    if value == "default":
        return None
    return int(value)


def set_seed(seed: int) -> None:
    """Host-side seeding (3D_resnet.py set_seed parity; device randomness
    is keyed explicitly via jax.random)."""
    random.seed(seed)
    np.random.seed(seed)


def resolve_dtype(name: str):
    import jax.numpy as jnp

    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def apply_multihost_flag(enabled: bool) -> None:
    """Join the process group BEFORE any backend-initialising JAX call
    (jax.distributed.initialize refuses to run after one)."""
    if not enabled:
        return
    from otfusion_tpu.parallel.multihost import initialize_multihost

    if not initialize_multihost():
        raise SystemExit(
            "--multihost set but no process group configuration found "
            "(set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
            "JAX_PROCESS_ID)")


def apply_device_flag(device: str) -> None:
    if device == "cpu":
        # The env var alone is ignored when a platform plugin (the axon
        # TPU plugin via sitecustomize) self-registers at interpreter
        # startup and force-sets jax_platforms — update the config
        # directly, before any backend initialises (ADVICE.md finding 1).
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:  # backend already initialised
            if "cpu" not in str(jax.devices()[0]).lower():
                raise RuntimeError(
                    "--device cpu requested after the JAX backend already "
                    "initialised on a non-CPU platform; pass the flag "
                    "before any jax usage or unset PALLAS_AXON_POOL_IPS"
                ) from e
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the OT pipelines are nested
    while_loops that cost minutes to compile on TPU the first time; cached
    compiles make subsequent runs start in seconds."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "otfusion_jax"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless


def resolve_multimodal_split(args, dataset, repo_root: Path,
                             fixed_indices=None):
    """Shared split logic of the fusion trainers (attn:1083-1165):
    fixed path-split JSON, precomputed indices (fixed patient-ID splits),
    patient-ID filter, or stratified split. Returns (train_idx, val_idx),
    after emitting the patient_ids/split artifacts."""
    from otfusion_tpu.data.splits import (
        indices_from_path_entries,
        save_path_split,
        stratified_split,
    )

    save_dir = Path(args.save_path)
    save_dir.mkdir(parents=True, exist_ok=True)
    with open(save_dir / "patient_ids_all.json", "w") as f:
        json.dump(dataset.patient_ids_used, f, indent=2)

    if fixed_indices is not None:
        train_idx, val_idx = fixed_indices
    elif getattr(args, "_fixed_split", None):
        spec = args._fixed_split
        train_idx = indices_from_path_entries(
            spec["train"], dataset.samples, repo_root
        )
        val_idx = indices_from_path_entries(
            spec["val"], dataset.samples, repo_root
        )
    else:
        labels = [s[2] for s in dataset.samples]
        train_idx, val_idx = stratified_split(
            labels, args.val_fraction, args.seed
        )

    save_path_split(save_dir / "train_split.json", dataset.samples,
                    train_idx, repo_root)
    save_path_split(save_dir / "val_split.json", dataset.samples,
                    val_idx, repo_root)
    return train_idx, val_idx
