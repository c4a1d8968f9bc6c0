"""Base fusion trainer: in-batch FOT OT loss (reference MRI_PET_OT.py),
with the per-batch OT solve fused into the jitted train step."""

from otfusion_tpu.cli._fusion_main import fusion_main


def main(argv=None):
    return fusion_main(
        variant="base",
        description="Train multimodal MRI-PET model with Optimal Transport",
        default_save_path="results/MRI_PET_OT/all",
        argv=argv,
    )


if __name__ == "__main__":
    main()
