#!/usr/bin/env bash
# No-OT multimodal fusion baseline sweep (reference
# "run scripts/run_mmfusion_experiments.sh"; its trainer is missing from
# the reference tree — recreated as otfusion_tpu.cli.train_mmfusion).
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI/MRI-PET}"
SPLIT_DIR="${SPLIT_DIR:-datasets/MRI_PET_split}"
RESULTS_ROOT="${RESULTS_ROOT:-results/MRI_PET_mmfusion}"
MODEL_DEPTHS=(101 152 200)
SPLITS=(all balanced)
EPOCHS="${EPOCHS:-50}"

for depth in "${MODEL_DEPTHS[@]}"; do
  for split in "${SPLITS[@]}"; do
    split_file="$SPLIT_DIR/${split}_split.json"
    split_arg=()
    [[ -f "$split_file" ]] && split_arg=(--load-patient-ids "$split_file")
    save="$RESULTS_ROOT/depth${depth}_${split}"
    echo ">>> $save"
    python -m otfusion_tpu.cli.train_mmfusion \
      --data-dir "$DATA_DIR" --save-path "$save" \
      --model-depth "$depth" --epochs "$EPOCHS" "${split_arg[@]}"
  done
done
