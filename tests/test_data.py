"""Data layer tests: NIfTI I/O roundtrip, preprocessing parity, cohort
assembly, pairing, splits, loaders — all on synthetic fixtures."""

import gzip
import json

import numpy as np
import pytest

from otfusion_tpu.data import (
    MultimodalNiftiDataset,
    NiftiDataset,
    detect_class_names,
    extract_patient_id,
    generate_patient_split,
    load_fixed_split,
    load_volume,
    make_synthetic_adni,
    read_nifti,
    stratified_split,
    write_nifti,
    Loader,
    MultimodalLoader,
)
from otfusion_tpu.data.preprocess import preprocess_volume, resize_trilinear
from otfusion_tpu.data.splits import (
    indices_from_path_entries,
    remap_class_ids,
    save_path_split,
)


@pytest.fixture(scope="module")
def adni_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("adni")
    return make_synthetic_adni(root, n_per_class=4, shape=(12, 12, 12),
                               heterogeneous_shapes=True)


def test_nifti_roundtrip(tmp_path, rng):
    for name in ["a.nii", "b.nii.gz"]:
        vol = rng.normal(size=(5, 7, 9)).astype(np.float32)
        write_nifti(tmp_path / name, vol)
        back = read_nifti(tmp_path / name)
        np.testing.assert_allclose(back, vol)


def test_nifti_int_dtype_roundtrip(tmp_path, rng):
    vol = rng.integers(0, 1000, size=(4, 5, 6)).astype(np.int16)
    write_nifti(tmp_path / "i.nii", vol)
    back = read_nifti(tmp_path / "i.nii")
    np.testing.assert_array_equal(back, vol)


def test_nifti_rejects_garbage(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"not a nifti at all" * 30)
    with pytest.raises(ValueError):
        read_nifti(p)


def test_resize_matches_torch_trilinear(rng):
    """jax.image.resize(trilinear) == F.interpolate(align_corners=False)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    vol = rng.normal(size=(9, 11, 7)).astype(np.float32)
    ours = np.asarray(resize_trilinear(vol, (16, 16, 16)))
    theirs = (
        F.interpolate(
            torch.from_numpy(vol)[None, None],
            size=(16, 16, 16),
            mode="trilinear",
            align_corners=False,
        )[0, 0]
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_preprocess_zscore_and_nan(rng):
    vol = rng.normal(size=(8, 8, 8)).astype(np.float32)
    vol[0, 0, 0] = np.nan
    out = np.asarray(preprocess_volume(vol, (8, 8, 8)))
    assert out.shape == (8, 8, 8, 1)
    assert np.isfinite(out).all()
    assert abs(out.mean()) < 1e-4


def test_extract_patient_id():
    assert extract_patient_id("/x/AD_MRI_130_FIN/002_S_5018/scan/a.nii") == "002_S_5018"
    assert extract_patient_id("/x/002_S_50181_AV45.nii") == "002_S_50181"  # 5-digit
    assert extract_patient_id("/x/137_S_4672_AV45.nii") == "137_S_4672"
    assert extract_patient_id("/x/noid.nii") is None


def test_synthetic_signal_jitter_deterministic_and_per_scan(tmp_path):
    """signal_jitter perturbs each (patient, modality) scan independently
    but deterministically for a given seed (cohort regeneration across
    hosts/seeds must agree bit-for-bit)."""
    from otfusion_tpu.data.nifti_io import read_nifti

    def vols(root, jitter):
        tree = make_synthetic_adni(
            root, n_per_class=2, shape=(10, 10, 10), seed=3,
            class_gap=0.5, noise=0.0, signal_jitter=jitter)
        return {
            p.name: read_nifti(p)[0]
            for p in sorted(tree.rglob("*.nii*"))
        }

    a = vols(tmp_path / "a", 0.4)
    b = vols(tmp_path / "b", 0.4)
    plain = vols(tmp_path / "c", 0.0)
    assert a.keys() == plain.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])  # deterministic
    # jitter actually moves the volumes, and by a DIFFERENT amount for
    # the two modalities of the same patient (independent draws)
    diffs = {k: float(np.abs(a[k] - plain[k]).max()) for k in a}
    assert any(v > 1e-4 for v in diffs.values())
    mri = [k for k in diffs if k.endswith("_MR.nii.gz")]
    pet = [k for k in diffs if k.endswith("_AV45.nii")]
    assert len(mri) == len(pet) == 4
    paired = [(diffs[m], diffs[p]) for m in mri for p in pet
              if m.split("_MR")[0] == p.split("_AV45")[0]]
    assert paired and all(abs(dm - dp) > 1e-6 for dm, dp in paired)


def test_synthetic_shared_severity(tmp_path):
    """shared_severity (cohort v3) encodes a patient-shared latent in
    modality-specific geometry: PET blob position along depth separates
    the classes while shared_severity=0 reproduces the v2 generator
    bit-for-bit (existing committed study legs stay valid)."""
    from otfusion_tpu.data.nifti_io import read_nifti

    base = make_synthetic_adni(
        tmp_path / "v2", n_per_class=3, shape=(12, 12, 12), seed=5,
        signal_jitter=0.4)
    off = make_synthetic_adni(
        tmp_path / "off", n_per_class=3, shape=(12, 12, 12), seed=5,
        signal_jitter=0.4, shared_severity=0.0)
    for p in sorted(base.rglob("*.nii*")):
        q = off / p.relative_to(base)
        np.testing.assert_array_equal(read_nifti(p), read_nifti(q))

    tree = make_synthetic_adni(
        tmp_path / "v3", n_per_class=8, shape=(12, 12, 12), seed=5,
        noise=0.05, signal_jitter=0.2, shared_severity=0.3)

    def com_z(path):
        v = np.clip(np.asarray(read_nifti(path), np.float64), 0, None)
        zz = np.arange(v.shape[0])[:, None, None]
        return float((v * zz).sum() / v.sum())

    zs = {}
    for cls in ("AD", "CN"):
        pets = sorted((tree / f"{cls}_PET_{130 if cls == 'AD' else 229}"
                       "_FIN").rglob("*AV45*"))
        assert len(pets) == 8
        zs[cls] = np.mean([com_z(p) for p in pets])
    # AD (class 0) shifts toward low z, CN (class 1) toward high z
    assert zs["CN"] - zs["AD"] > 1.0, zs


def test_detect_class_names(adni_tree):
    table = detect_class_names(str(adni_tree))
    assert "AD_MRI_130_FIN" in table  # MRI preferred over PET


def test_unimodal_dataset(adni_tree):
    ds = NiftiDataset(str(adni_tree))
    # 4 patients per class x 2 classes present (AD/CN), MRI table detected
    labels = [l for _, l in ds.samples]
    assert labels.count(0) == 4 and labels.count(1) == 4
    assert len(ds.patient_ids_used["AD_MRI_130_FIN"]) == 4


def test_unimodal_dataset_balance_and_cap(adni_tree):
    ds = NiftiDataset(str(adni_tree), max_samples_per_class=2)
    labels = [l for _, l in ds.samples]
    assert labels.count(0) == 2 and labels.count(1) == 2

    ds2 = NiftiDataset(str(adni_tree), balance_to_minority=True)
    labels2 = [l for _, l in ds2.samples]
    assert labels2.count(0) == labels2.count(1)


def test_patient_filter(adni_tree):
    full = NiftiDataset(str(adni_tree))
    keep = full.patient_ids_used["AD_MRI_130_FIN"][:2]
    ds = NiftiDataset(
        str(adni_tree),
        patient_ids_filter={"AD_MRI_130_FIN": keep, "CN_MRI_229_FIN": []},
    )
    labels = [l for _, l in ds.samples]
    assert labels.count(0) == 2 and labels.count(1) == 0


def test_multimodal_pairing(adni_tree):
    ds = MultimodalNiftiDataset(str(adni_tree))
    assert len(ds) == 8  # 4 pairs per class
    for mri_path, pet_path, label in ds.samples:
        assert extract_patient_id(mri_path) == extract_patient_id(pet_path)
        assert ("AD_" in mri_path) == (label == 0)


def test_multimodal_cap(adni_tree):
    ds = MultimodalNiftiDataset(str(adni_tree), max_samples_per_class=3)
    labels = [s[2] for s in ds.samples]
    assert labels.count(0) == 3 and labels.count(1) == 3


def test_stratified_split_deterministic():
    labels = [0] * 10 + [1] * 20
    tr1, va1 = stratified_split(labels, 0.2, seed=7)
    tr2, va2 = stratified_split(labels, 0.2, seed=7)
    assert tr1 == tr2 and va1 == va2
    assert len(va1) == 2 + 4  # int(10*0.2) + int(20*0.2)
    va_labels = [labels[i] for i in va1]
    assert va_labels.count(0) == 2 and va_labels.count(1) == 4


def test_fixed_split_three_formats(tmp_path):
    class_names = {"AD_MRI_130_FIN": 0, "CN_MRI_229_FIN": 1}
    # format 1: train/val per-class ids (with PET keys needing remap)
    f1 = tmp_path / "ids.json"
    f1.write_text(json.dumps({
        "train": {"AD_PET_130_FIN": ["001_S_4000"], "CN_PET_229_FIN": []},
        "val": {"AD_PET_130_FIN": [], "CN_PET_229_FIN": ["002_S_4001"]},
    }))
    out = load_fixed_split(f1, class_names)
    assert out["mode"] == "ids"
    assert out["train"]["AD_MRI_130_FIN"] == ["001_S_4000"]
    assert out["val"]["CN_MRI_229_FIN"] == ["002_S_4001"]

    # format 2: flat per-class filter
    f2 = tmp_path / "filter.json"
    f2.write_text(json.dumps({"AD_MRI_130_FIN": ["001_S_4000"]}))
    out2 = load_fixed_split(f2, class_names)
    assert out2["mode"] == "filter"
    assert out2["filter"]["AD_MRI_130_FIN"] == ["001_S_4000"]
    assert out2["filter"]["CN_MRI_229_FIN"] == []

    # format 3: path entries
    f3 = tmp_path / "paths.json"
    f3.write_text(json.dumps({
        "train": [{"mri_path": "a.nii", "pet_path": "b.nii", "label": 0}],
        "val": [],
    }))
    out3 = load_fixed_split(f3, class_names)
    assert out3["mode"] == "paths"


def test_path_split_roundtrip(tmp_path, adni_tree):
    ds = MultimodalNiftiDataset(str(adni_tree))
    idx = [0, 3, 5]
    save_path_split(tmp_path / "train_split.json", ds.samples, idx, adni_tree)
    entries = json.loads((tmp_path / "train_split.json").read_text())
    back = indices_from_path_entries(entries, ds.samples, adni_tree)
    assert back == idx


def test_generate_patient_split():
    ids = {"AD_MRI_130_FIN": [f"00{i}_S_400{i}" for i in range(5)]}
    out = generate_patient_split(ids, val_fraction=0.2, seed=1)
    assert len(out["val"]["AD_MRI_130_FIN"]) == 1
    assert len(out["train"]["AD_MRI_130_FIN"]) == 4
    assert not set(out["val"]["AD_MRI_130_FIN"]) & set(
        out["train"]["AD_MRI_130_FIN"]
    )


def test_loader_shapes_and_final_batch(adni_tree):
    ds = NiftiDataset(str(adni_tree))
    loader = Loader(ds.samples, (8, 8, 8), batch_size=3, shuffle=True)
    batches = list(loader)
    assert len(batches) == 3  # 8 samples / bs 3
    assert batches[0][0].shape == (3, 8, 8, 8, 1)
    assert batches[-1][0].shape == (2, 8, 8, 8, 1)
    total = sum(b[1].shape[0] for b in batches)
    assert total == 8


def test_multimodal_loader(adni_tree):
    ds = MultimodalNiftiDataset(str(adni_tree))
    loader = MultimodalLoader(ds.samples, (8, 8, 8), batch_size=4)
    mri, pet, labels = next(iter(loader))
    assert mri.shape == (4, 8, 8, 8, 1)
    assert pet.shape == (4, 8, 8, 8, 1)
    # volumes are z-scored
    assert abs(float(mri[0].mean())) < 1e-3


def test_loader_augment_determinism(adni_tree):
    ds = NiftiDataset(str(adni_tree))
    l1 = Loader(ds.samples, (8, 8, 8), batch_size=8, augment=True, seed=3)
    l2 = Loader(ds.samples, (8, 8, 8), batch_size=8, augment=True, seed=3)
    b1 = next(iter(l1))[0]
    b2 = next(iter(l2))[0]
    np.testing.assert_allclose(b1, b2)


def test_loader_shuffle_immune_to_host_shard_and_augment(adni_tree):
    """Round-2 ADVICE finding 2: augmentation draws must not consume the
    shuffle RNG. Hosts with different local row counts (host_shard) must
    keep identical global shuffle orders in every later epoch."""
    ds = NiftiDataset(str(adni_tree))
    # bs=3 over 8 samples -> final batch of 2 rows over 2 "hosts" gives
    # host0 1 row, host1 1 row; with 3 hosts the remainder leaves host2
    # with zero rows in some batches -> unequal augment draw counts.
    loaders = [
        Loader(ds.samples, (8, 8, 8), batch_size=3, shuffle=True,
               augment=True, seed=7, host_shard=(p, 3))
        for p in range(3)
    ]
    full = Loader(ds.samples, (8, 8, 8), batch_size=3, shuffle=True,
                  augment=True, seed=7)
    for epoch in range(3):
        per_host = [[b[1].tolist() for b in ld] for ld in loaders]
        global_batches = [b[1].tolist() for b in full]
        # concatenating host row blocks in process order must rebuild
        # exactly the global batch, epoch after epoch
        rebuilt = [sum(rows, []) for rows in zip(*per_host)]
        assert rebuilt == global_batches, f"desync at epoch {epoch}"


def test_loader_augment_independent_of_host(adni_tree):
    """The augmentation applied to a sample must not depend on which
    host loads it (keyed on (seed, epoch, sample index))."""
    ds = NiftiDataset(str(adni_tree))
    full = Loader(ds.samples, (8, 8, 8), batch_size=4, augment=True,
                  seed=11)
    h0 = Loader(ds.samples, (8, 8, 8), batch_size=4, augment=True,
                seed=11, host_shard=(0, 2))
    b_full = [b[0] for b in full]
    b_h0 = [b[0] for b in h0]
    for fb, hb in zip(b_full, b_h0):
        np.testing.assert_allclose(fb[: hb.shape[0]], hb)


def test_loader_empty_host_block_yields_zero_rows(adni_tree):
    """Round-2 ADVICE finding 4: a host whose slice of the final partial
    batch is empty must yield correctly-shaped zero-row arrays, not
    crash on np.stack([])."""
    ds = MultimodalNiftiDataset(str(adni_tree))
    # 4 pairs, bs=3 -> final batch of 1 row; host 1 of 2 gets 0 rows.
    loader = MultimodalLoader(ds.samples[:4], (8, 8, 8), batch_size=3,
                              augment=True, host_shard=(1, 2))
    batches = list(loader)
    mri, pet, labels = batches[-1]
    assert mri.shape == (0, 8, 8, 8, 1)
    assert pet.shape == (0, 8, 8, 8, 1)
    assert labels.shape == (0,)
    assert labels.dtype == np.int32

# Quick verification profile: python -m pytest -m fast (CLAUDE.md)
pytestmark = pytest.mark.fast
