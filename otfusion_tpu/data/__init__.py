"""Data layer: NIfTI I/O, preprocessing, cohort assembly, splits, loaders."""

from otfusion_tpu.data.nifti_io import read_nifti, write_nifti
from otfusion_tpu.data.preprocess import (
    load_volume,
    preprocess_volume,
    resize_trilinear,
    random_flips,
)
from otfusion_tpu.data.datasets import (
    CLASS_NAMES_MRI,
    CLASS_NAMES_PET,
    CLASS_NAMES_MRI_T1,
    CLASS_NAMES_MRI_T2,
    NiftiDataset,
    MultimodalNiftiDataset,
    detect_class_names,
    extract_patient_id,
)
from otfusion_tpu.data.splits import (
    stratified_split,
    load_fixed_split,
    generate_patient_split,
)
from otfusion_tpu.data.synthetic import make_synthetic_adni
from otfusion_tpu.data.loader import Loader, MultimodalLoader

__all__ = [
    "read_nifti",
    "write_nifti",
    "load_volume",
    "preprocess_volume",
    "resize_trilinear",
    "random_flips",
    "CLASS_NAMES_MRI",
    "CLASS_NAMES_PET",
    "CLASS_NAMES_MRI_T1",
    "CLASS_NAMES_MRI_T2",
    "NiftiDataset",
    "MultimodalNiftiDataset",
    "detect_class_names",
    "extract_patient_id",
    "stratified_split",
    "load_fixed_split",
    "generate_patient_split",
    "make_synthetic_adni",
    "Loader",
    "MultimodalLoader",
]
