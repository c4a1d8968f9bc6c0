"""Unimodal 3D ResNet trainer (reference 3D_resnet.py): single-modality
AD/CN/MCI classification with auto-detected class tables, --classes
filtering, fixed/stratified splits."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from otfusion_tpu.cli.common import (
    add_common_args,
    apply_multihost_flag,
    apply_device_flag,
    resolve_dtype,
    resolve_num_devices,
    set_seed,
)


def filter_classes(class_names: dict, wanted: list[str]) -> dict:
    """--classes AD CN -> re-indexed subset (3D_resnet.py:731-748)."""
    filtered = {}
    for simple in wanted:
        found = False
        for dir_name in class_names:
            if dir_name.startswith(simple + "_") or f"_{simple}_" in dir_name:
                filtered[dir_name] = len(filtered)
                found = True
                break
        if not found:
            raise ValueError(
                f"Class {simple} not found in available directories: "
                f"{list(class_names.keys())}"
            )
    return filtered


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train a 3D ResNet on one ADNI modality",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    add_common_args(
        parser, epochs=200, batch_size=4, lr=2e-5,
        save_path="results/ADNI_MRI_3D_RESNET", data_dir="datasets/ADNI",
        num_workers=2,
    )
    parser.add_argument("--classes", type=str, nargs="+", default=None)
    parser.add_argument("--balance-to-minority", action="store_true")
    parser.add_argument("--modality", type=str, default="auto",
                        choices=["auto", "mri", "pet", "t1", "t2"])
    args = parser.parse_args(argv)
    apply_multihost_flag(args.multihost)
    apply_device_flag(args.device)
    set_seed(args.seed)

    from otfusion_tpu.data.datasets import (
        CLASS_NAMES_MRI,
        CLASS_NAMES_MRI_T1,
        CLASS_NAMES_MRI_T2,
        CLASS_NAMES_PET,
        NiftiDataset,
        detect_class_names,
    )
    from otfusion_tpu.data.splits import (
        indices_from_path_entries,
        load_fixed_split,
        stratified_split,
    )
    from otfusion_tpu.train.loop import run_unimodal_training

    if args.modality == "mri":
        class_names = CLASS_NAMES_MRI
    elif args.modality == "pet":
        class_names = CLASS_NAMES_PET
    elif args.modality == "t1":
        class_names = CLASS_NAMES_MRI_T1
    elif args.modality == "t2":
        class_names = CLASS_NAMES_MRI_T2
    else:
        class_names = detect_class_names(args.data_dir)
    if args.classes:
        class_names = filter_classes(class_names, args.classes)
    print(f"Using classes: {class_names}")

    save_dir = Path(args.save_path)
    save_dir.mkdir(parents=True, exist_ok=True)

    spec = None
    if args.load_patient_ids:
        spec = load_fixed_split(args.load_patient_ids, class_names)

    common = dict(
        root_dir=args.data_dir,
        class_names=class_names,
        max_samples_per_class=args.max_samples_per_class,
        balance_to_minority=args.balance_to_minority,
        seed=args.seed,
    )

    if spec and spec["mode"] == "ids":
        # Two disjoint cohorts filtered by train/val patient IDs
        # (3D_resnet.py:818-843).
        train_ds = NiftiDataset(**common, patient_ids_filter=spec["train"])
        val_ds = NiftiDataset(**common, patient_ids_filter=spec["val"])
        samples = train_ds.samples + val_ds.samples
        train_idx = list(range(len(train_ds.samples)))
        val_idx = list(range(len(train_ds.samples), len(samples)))
    else:
        if spec and spec["mode"] == "filter":
            dataset = NiftiDataset(**{**common,
                                      "max_samples_per_class": None},
                                   patient_ids_filter=spec["filter"])
        else:
            dataset = NiftiDataset(**common)
        samples = dataset.samples
        if spec and spec["mode"] in ("paths", "path_list"):
            path_key = "mri_path" if args.modality != "pet" else "pet_path"
            repo_root = Path(args.data_dir).resolve().parent
            if spec["mode"] == "paths":
                train_idx = indices_from_path_entries(
                    spec["train"], samples, repo_root, path_key=path_key)
                val_idx = indices_from_path_entries(
                    spec["val"], samples, repo_root, path_key=path_key)
            else:
                raise ValueError(
                    "bare-list split files are train-only; supply a "
                    "{train, val} split JSON")
        else:
            with open(save_dir / "patient_ids.json", "w") as f:
                json.dump(dataset.patient_ids_used, f, indent=2)
            labels = [s[1] for s in samples]
            train_idx, val_idx = stratified_split(
                labels, args.val_fraction, args.seed)

    print(f"Split: {len(train_idx)} train / {len(val_idx)} val")

    result = run_unimodal_training(
        samples=samples,
        train_idx=train_idx,
        val_idx=val_idx,
        class_names=class_names,
        model_depth=args.model_depth,
        target_shape=tuple(args.target_shape),
        batch_size=args.batch_size,
        lr=args.lr,
        epochs=args.epochs,
        seed=args.seed,
        save_path=args.save_path,
        augment=args.augment,
        s2d_stem=args.s2d_stem,
        grad_accum=args.grad_accum,
        eval_batch_size=args.eval_batch_size,
        dtype=resolve_dtype(args.dtype),
        profile_dir=args.profile_dir,
        resume=args.resume,
        num_devices=resolve_num_devices(args.num_devices),
        tp_size=args.tp_size,
        num_workers=args.num_workers,
        latest_every=args.latest_every,
        config_lines={
            "Dataset": args.data_dir,
            "Train/Val Split": f"{1 - args.val_fraction:.1%}/"
                               f"{args.val_fraction:.1%}",
            "Total Samples": len(samples),
            "Train Samples": len(train_idx),
            "Val Samples": len(val_idx),
            "Batch Size": args.batch_size,
            "Learning Rate": args.lr,
            "Target Shape": list(args.target_shape),
            "Device": args.device,
        },
    )
    print(f"Best val loss: {result['best_val_loss']:.4f}")
    print("Training complete!")
    return result


if __name__ == "__main__":
    main()
