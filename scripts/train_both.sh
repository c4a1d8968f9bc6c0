#!/usr/bin/env bash
# Master T1+T2 pretraining (reference train_both.sh): trains the
# unimodal 3D ResNet on MRI T1 then MRI T2 with balance-to-minority,
# producing the two backbones the T1/T2 OT fusion trainer grafts.
# Hyperparameters are env-overridable, mirroring the reference's
# edit-the-variables-at-the-top convention.
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI/MRI-T1-T2}"
EPOCHS="${EPOCHS:-200}"
BATCH_SIZE="${BATCH_SIZE:-4}"
LR="${LR:-2e-5}"
SEED="${SEED:-42}"
MODEL_DEPTH="${MODEL_DEPTH:-101}"
TARGET_SHAPE=(${TARGET_SHAPE:-128 128 128})
VAL_FRACTION="${VAL_FRACTION:-0.2}"
NUM_WORKERS="${NUM_WORKERS:-2}"
NUM_DEVICES="${NUM_DEVICES:-1}"
T1_SAVE="${T1_SAVE:-results/ADNI_MRI_T1_3D_RESNET_AD_CN}"
T2_SAVE="${T2_SAVE:-results/ADNI_MRI_T2_3D_RESNET_AD_CN}"

run_modality() {
  local modality=$1 save=$2 step=$3
  echo "Step $step/2: training on MRI $modality data -> $save"
  python -m otfusion_tpu.cli.train_unimodal \
    --data-dir "$DATA_DIR" \
    --save-path "$save" \
    --modality "$modality" \
    --classes AD CN \
    --epochs "$EPOCHS" \
    --batch-size "$BATCH_SIZE" \
    --lr "$LR" \
    --target-shape "${TARGET_SHAPE[@]}" \
    --val-fraction "$VAL_FRACTION" \
    --num-workers "$NUM_WORKERS" \
    --num-devices "$NUM_DEVICES" \
    --seed "$SEED" \
    --model-depth "$MODEL_DEPTH" \
    --balance-to-minority \
    --augment
}

run_modality t1 "$T1_SAVE" 1
run_modality t2 "$T2_SAVE" 2

echo "All training complete: $T1_SAVE/ and $T2_SAVE/"
