#!/usr/bin/env bash
# MRI T1+T2 OT fusion training (reference train_t1_t2_ot.sh): runs the
# T1/T2 fusion trainer on the cohort emitted by train_both.sh's T1 run.
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI/MRI-T1-T2}"
PATIENT_IDS="${PATIENT_IDS:-results/ADNI_MRI_T1_3D_RESNET_AD_CN/patient_ids.json}"
SAVE="${SAVE:-results/ADNI_MRI_T1_T2_OT_AD_CN}"
EPOCHS="${EPOCHS:-200}"
BATCH_SIZE="${BATCH_SIZE:-4}"
LR="${LR:-2e-5}"
SEED="${SEED:-42}"
MODEL_DEPTH="${MODEL_DEPTH:-101}"
TARGET_SHAPE=(${TARGET_SHAPE:-128 128 128})
VAL_FRACTION="${VAL_FRACTION:-0.2}"
NUM_WORKERS="${NUM_WORKERS:-2}"
NUM_DEVICES="${NUM_DEVICES:-1}"
MAX_JAX_SAMPLES="${MAX_JAX_SAMPLES:-100}"

echo "MRI T1-T2 Optimal Transport training -> $SAVE"

python -m otfusion_tpu.cli.train_t1_t2_ot \
  --data-dir "$DATA_DIR" \
  --save-path "$SAVE" \
  --load-patient-ids "$PATIENT_IDS" \
  --epochs "$EPOCHS" \
  --batch-size "$BATCH_SIZE" \
  --lr "$LR" \
  --target-shape "${TARGET_SHAPE[@]}" \
  --val-fraction "$VAL_FRACTION" \
  --num-workers "$NUM_WORKERS" \
  --num-devices "$NUM_DEVICES" \
  --seed "$SEED" \
  --model-depth "$MODEL_DEPTH" \
  --max-jax-samples "$MAX_JAX_SAMPLES" \
  --augment

echo "Training complete — results in $SAVE/"
