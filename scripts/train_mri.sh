#!/usr/bin/env bash
# MRI backbone pretraining (reference train_mri.sh): 50 samples/class,
# 30 epochs; emits patient_ids.json that train_pet.sh reuses so both
# backbones see the same cohort.
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI}"
SAVE="${SAVE:-results/ADNI_MRI_3D_RESNET}"
NUM_DEVICES="${NUM_DEVICES:-1}"

echo "Training 3D ResNet on MRI data (50 samples/class)"

python -m otfusion_tpu.cli.train_unimodal \
  --data-dir "$DATA_DIR" \
  --save-path "$SAVE" \
  --modality mri \
  --max-samples-per-class 50 \
  --epochs 30 \
  --batch-size 2 \
  --lr 1e-4 \
  --target-shape 128 128 128 \
  --num-devices "$NUM_DEVICES" \
  --augment \
  --seed 42

echo "MRI training complete — patient IDs at $SAVE/patient_ids.json"
