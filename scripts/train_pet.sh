#!/usr/bin/env bash
# PET backbone pretraining (reference train_pet.sh): reuses the patient
# cohort emitted by train_mri.sh so MRI/PET backbones are trained on the
# same patients before fusion.
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI}"
SAVE="${SAVE:-results/ADNI_PET_3D_RESNET}"
PATIENT_IDS="${PATIENT_IDS:-results/ADNI_MRI_3D_RESNET/patient_ids.json}"
NUM_DEVICES="${NUM_DEVICES:-1}"

if [ ! -f "$PATIENT_IDS" ]; then
  echo "Error: patient-IDs file not found: $PATIENT_IDS" >&2
  echo "Run scripts/train_mri.sh first to generate it." >&2
  exit 1
fi

echo "Training 3D ResNet on PET data (cohort from $PATIENT_IDS)"

python -m otfusion_tpu.cli.train_unimodal \
  --data-dir "$DATA_DIR" \
  --save-path "$SAVE" \
  --modality pet \
  --load-patient-ids "$PATIENT_IDS" \
  --epochs 30 \
  --batch-size 2 \
  --lr 1e-4 \
  --target-shape 128 128 128 \
  --num-devices "$NUM_DEVICES" \
  --augment \
  --seed 42

echo "PET training complete — results in $SAVE/"
