#!/usr/bin/env bash
# Backbone-pretraining sweep (reference run_3d_resnet_backbones.sh):
# unimodal 3D ResNets per modality x depth x split.
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI}"
SPLIT_DIR="${SPLIT_DIR:-datasets/MRI_PET_split}"
RESULTS_ROOT="${RESULTS_ROOT:-results/backbone_pretraining}"
MODEL_DEPTHS=(101 152 200)
MODALITIES=(mri pet)
SPLITS=(all balanced)
EPOCHS="${EPOCHS:-200}"

for modality in "${MODALITIES[@]}"; do
  for depth in "${MODEL_DEPTHS[@]}"; do
    for split in "${SPLITS[@]}"; do
      split_file="$SPLIT_DIR/${split}_split.json"
      split_arg=()
      [[ -f "$split_file" ]] && split_arg=(--load-patient-ids "$split_file")
      bal_arg=()
      [[ "$split" == balanced ]] && bal_arg=(--balance-to-minority)
      save="$RESULTS_ROOT/${modality}_depth${depth}_${split}"
      echo ">>> $save"
      python -m otfusion_tpu.cli.train_unimodal \
        --data-dir "$DATA_DIR" --save-path "$save" \
        --modality "$modality" --model-depth "$depth" \
        --classes AD CN --epochs "$EPOCHS" \
        "${split_arg[@]}" "${bal_arg[@]}"
    done
  done
done
