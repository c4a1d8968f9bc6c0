"""Reporting, plotting, checkpointing, logging utilities."""

from otfusion_tpu.utils.reporting import (
    ResultsWriter,
    parse_results_file,
    parse_setup_fields,
    collect_best_results,
    write_results_csv,
    CSV_COLUMNS,
)
from otfusion_tpu.utils.plotting import (
    save_confusion_matrix_png,
    save_tsne_png,
)
from otfusion_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    restore_backbone,
    flush_checkpoints,
)

__all__ = [
    "ResultsWriter",
    "parse_results_file",
    "parse_setup_fields",
    "collect_best_results",
    "write_results_csv",
    "CSV_COLUMNS",
    "save_confusion_matrix_png",
    "save_tsne_png",
    "save_checkpoint",
    "restore_checkpoint",
    "restore_backbone",
    "flush_checkpoints",
]
