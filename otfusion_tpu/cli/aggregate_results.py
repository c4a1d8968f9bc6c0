"""Best-results aggregator (reference aggregate_pretraining_best_results.py):
walks run directories for results.txt files and emits the 14-column CSV."""

from __future__ import annotations

import argparse
from pathlib import Path

from otfusion_tpu.utils.reporting import (
    collect_best_results,
    write_results_csv,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--results-dir", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--default-modality", type=str, default="")
    args = parser.parse_args(argv)

    rows = collect_best_results(Path(args.results_dir),
                                args.default_modality)
    write_results_csv(rows, Path(args.output))
    print(f"Wrote {len(rows)} rows to {args.output}")


if __name__ == "__main__":
    main()
