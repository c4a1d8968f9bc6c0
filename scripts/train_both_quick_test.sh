#!/usr/bin/env bash
# Quick-test configuration (reference train_both_quick_test.sh): 10
# samples/class, 5 epochs, 64^3 volumes — the de-facto integration test.
set -euo pipefail

DATA_DIR="${DATA_DIR:-datasets/ADNI/MRI-PET}"
SAVE="${SAVE:-results/quick_test}"

python -m otfusion_tpu.cli.train_ot_attn \
  --data-dir "$DATA_DIR" \
  --save-path "$SAVE" \
  --max-samples-per-class 10 \
  --epochs 5 \
  --batch-size 2 \
  --lr 1e-4 \
  --target-shape 64 64 64 \
  --model-depth 50 \
  --seed 42
