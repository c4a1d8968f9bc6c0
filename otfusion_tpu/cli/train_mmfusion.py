"""No-OT multimodal fusion baseline.

The reference's trainer for this config is missing from its tree
(run scripts/run_mmfusion_experiments.sh:16 invokes
MRI_PET_mmfusion_per_epoch.py, which does not exist); recreated per
SURVEY.md §7 to reproduce comparative_results/best_mmfusion_results.csv."""

from otfusion_tpu.cli._fusion_main import fusion_main


def main(argv=None):
    return fusion_main(
        variant="mmfusion",
        description="Train multimodal MRI-PET fusion baseline (no OT)",
        default_save_path="results/MRI_PET_mmfusion/all",
        argv=argv,
    )


if __name__ == "__main__":
    main()
