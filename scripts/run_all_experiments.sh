#!/usr/bin/env bash
# Full experiment battery (reference run_all_experiments.sh): backbone
# pretraining, then OT+attention sweeps, then the no-OT baseline, then
# aggregate everything to CSV.
set -euo pipefail

bash "$(dirname "$0")/run_3d_resnet_backbones.sh"
bash "$(dirname "$0")/run_attn_experiments.sh" both
bash "$(dirname "$0")/run_mmfusion_experiments.sh"

python -m otfusion_tpu.cli.aggregate_results \
  --results-dir "${RESULTS_ROOT:-results}" \
  --output comparative_results/best_results.csv
