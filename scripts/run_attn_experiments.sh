#!/usr/bin/env bash
# Sweep parity with the reference run_attn_experiments.sh: flagship OT+attn
# over depth x dropout x split x pretraining.
set -euo pipefail

usage() {
  cat <<'EOF'
Usage: bash scripts/run_attn_experiments.sh [both|with_pretrain|no_pretrain]
EOF
}

PRETRAIN_CHOICE="${1:-both}"
RUN_NO=false; RUN_WITH=false
case "$PRETRAIN_CHOICE" in
  both) RUN_NO=true; RUN_WITH=true ;;
  with_pretrain) RUN_WITH=true ;;
  no_pretrain) RUN_NO=true ;;
  -h|--help) usage; exit 0 ;;
  *) usage; echo "Invalid pretrain choice: $PRETRAIN_CHOICE" >&2; exit 1 ;;
esac

DATA_DIR="${DATA_DIR:-datasets/ADNI/MRI-PET}"
SPLIT_DIR="${SPLIT_DIR:-datasets/MRI_PET_split}"
RESULTS_ROOT="${RESULTS_ROOT:-results/MRI_PET_OT_OT_per_epoch_attn}"
PRETRAIN_ROOT="${PRETRAIN_ROOT:-results/backbone_pretraining}"
MODEL_DEPTHS=(101 152 200)
DROPOUTS=(0.3 0.2 0.1 none)
SPLITS=(all balanced)
EPOCHS="${EPOCHS:-50}"

for split in "${SPLITS[@]}"; do
  split_file="$SPLIT_DIR/${split}_split.json"
  split_arg=()
  [[ -f "$split_file" ]] && split_arg=(--load-patient-ids "$split_file")
  for depth in "${MODEL_DEPTHS[@]}"; do
    for dropout in "${DROPOUTS[@]}"; do
      drop_arg=()
      [[ "$dropout" != "none" ]] && drop_arg=(--projection-dropout "$dropout")
      for mode in no with; do
        [[ "$mode" == no && "$RUN_NO" != true ]] && continue
        [[ "$mode" == with && "$RUN_WITH" != true ]] && continue
        pre_arg=()
        if [[ "$mode" == with ]]; then
          pre_arg=(--mri-pretrained "$PRETRAIN_ROOT/mri_depth${depth}_${split}/best_model"
                   --pet-pretrained "$PRETRAIN_ROOT/pet_depth${depth}_${split}/best_model")
        fi
        save="$RESULTS_ROOT/mdepth${depth}_drop${dropout}_${split}_${mode}_pretrain"
        echo ">>> $save"
        python -m otfusion_tpu.cli.train_ot_attn \
          --data-dir "$DATA_DIR" --save-path "$save" \
          --model-depth "$depth" --epochs "$EPOCHS" \
          "${split_arg[@]}" "${drop_arg[@]}" "${pre_arg[@]}"
      done
    done
  done
done
