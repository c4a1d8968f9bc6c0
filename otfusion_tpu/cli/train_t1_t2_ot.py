"""MRI T1+T2 OT fusion trainer (reference MRI_T1_T2_OT.py): the flagship
architecture applied to T1/T2 pairs, class dirs 1204_{AD,CN}_MRI_T{1,2}_FIN."""

from otfusion_tpu.cli._fusion_main import fusion_main

CLASS_NAMES_T1 = {"1204_AD_MRI_T1_FIN": 0, "1204_CN_MRI_T1_FIN": 1}
CLASS_NAMES_T2 = {"1204_AD_MRI_T2_FIN": 0, "1204_CN_MRI_T2_FIN": 1}


def main(argv=None):
    return fusion_main(
        variant="per_epoch_attn",
        description="Train multimodal MRI T1-T2 model with Optimal Transport",
        default_save_path="results/MRI_T1_T2_OT/all",
        class_names_a=CLASS_NAMES_T1,
        class_names_b=CLASS_NAMES_T2,
        argv=argv,
    )


if __name__ == "__main__":
    main()
