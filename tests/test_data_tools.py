"""data_tools CLI tests (sizes/verify/relocate/cleanup dry-run defaults)."""

import numpy as np
import pytest

from otfusion_tpu.cli.data_tools import main
from otfusion_tpu.data import make_synthetic_adni
from otfusion_tpu.data.nifti_io import write_nifti


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools")
    return make_synthetic_adni(root, n_per_class=3, shape=(8, 8, 8))


def test_sizes_writes_audit(tree, tmp_path, capsys):
    out = tmp_path / "sizes.txt"
    main(["sizes", "--root", str(tree), "--output", str(out)])
    text = out.read_text()
    assert text.count("(8, 8, 8)") == 12  # 3 patients x 2 classes x 2 mods
    # corrupt file is reported, not fatal
    bad = tree / "AD_MRI_130_FIN" / "bad.nii"
    bad.write_bytes(b"junk" * 100)
    main(["sizes", "--root", str(tree), "--output", str(out)])
    assert "ERROR" in out.read_text()
    bad.unlink()


def test_verify_pairing(tree, capsys):
    main(["verify", "--root", str(tree), "--pair-with", str(tree)])
    out = capsys.readouterr().out
    assert "AD_MRI_130_FIN: 3 patients, 3 scans" in out
    assert "paired: 6" in out


def test_relocate_dry_run_moves_nothing(tree, tmp_path, capsys):
    ids = tmp_path / "ids.txt"
    ids.write_text("001_S_4000\n")
    dest = tmp_path / "dest"
    main(["relocate", "--source", str(tree / "AD_MRI_130_FIN"),
          "--dest", str(dest), "--id-file", str(ids)])
    out = capsys.readouterr().out
    assert "would move" in out
    assert not dest.exists()  # dry-run default


def test_cleanup_dry_run_and_apply(tmp_path, capsys):
    root = tmp_path / "c"
    root.mkdir()
    write_nifti(root / "keep.nii", np.zeros((2, 2, 2), np.float32))
    (root / "junk.txt").write_text("x")
    main(["cleanup", "--root", str(root)])
    assert (root / "junk.txt").exists()  # dry run
    main(["cleanup", "--root", str(root), "--apply"])
    assert not (root / "junk.txt").exists()
    assert (root / "keep.nii").exists()


def test_convert_without_dcm2niix_falls_back_to_native(tmp_path, capsys):
    # Without dcm2niix on PATH, convert falls back to the native
    # pure-NumPy DICOM reader (reference convert_dcm2nii.py:35-60
    # fallback parity) instead of erroring; an empty tree converts
    # nothing. The full native conversion path is driven in
    # tests/test_dicom.py::test_convert_cli_native_fallback.
    main(["convert", "--input", str(tmp_path), "--output",
          str(tmp_path / "o")])
    out = capsys.readouterr().out
    assert "native DICOM reader" in out
    assert "Converted 0 DICOM series" in out


# ------------------------------------------------------- harvard30k prep


def test_harvard30k_merge_zips(tmp_path):
    """data_process.py:25-55 parity: zips unpack into merged split trees,
    .jpg previews dropped, nested patient dirs merged across zips."""
    import zipfile

    from otfusion_tpu.cli.harvard30k import main

    work = tmp_path / "release"
    work.mkdir()
    for zi in range(2):
        src = tmp_path / f"src{zi}"
        (src / "Training" / f"p{zi}").mkdir(parents=True)
        (src / "Training" / f"p{zi}" / "scan.npz").write_bytes(b"x")
        (src / "Training" / f"p{zi}" / "preview.jpg").write_bytes(b"x")
        (src / "test").mkdir()
        (src / "test" / f"rec{zi}.npz").write_bytes(b"y")
        with zipfile.ZipFile(work / f"part{zi}.zip", "w") as zf:
            for f in sorted(src.rglob("*")):
                zf.write(f, f.relative_to(src))
    out = tmp_path / "merged"
    assert main(["merge-zips", "--work-dir", str(work),
                 "--output-dir", str(out)]) == 0
    assert (out / "merged_training" / "p0" / "scan.npz").exists()
    assert (out / "merged_training" / "p1" / "scan.npz").exists()
    assert (out / "merged_test" / "rec0.npz").exists()
    assert (out / "merged_test" / "rec1.npz").exists()
    assert not list(out.rglob("*.jpg"))
    assert not (work / "temp").exists()


def test_harvard30k_fundus_and_oct(tmp_path):
    """data_process.py:57-118 parity: fundus PNG + label list, OCT
    volumes to zipped NIfTI (native writer round-trips)."""
    import zipfile

    import numpy as np

    from otfusion_tpu.cli.harvard30k import main
    from otfusion_tpu.data.nifti_io import read_nifti

    src = tmp_path / "Test"
    src.mkdir()
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(8, 10, 12)).astype(np.float32)
    np.savez(src / "rec_a.npz",
             slo_fundus=rng.integers(0, 255, (32, 32), dtype=np.uint8),
             dr_subtype=np.asarray("pdr"),
             oct_bscans=vol)
    np.savez(src / "rec_b.npz",
             slo_fundus=rng.integers(0, 255, (16, 24), dtype=np.uint8),
             dr_subtype=np.asarray("no.dr.diagnosis"),
             oct_bscans=rng.normal(size=(4, 6, 8)).astype(np.float32))

    fundus = tmp_path / "fundus"
    labels = tmp_path / "fundus.txt"
    assert main(["extract-fundus", "--source", str(src),
                 "--fundus-dir", str(fundus),
                 "--labels-file", str(labels), "--size", "48"]) == 0
    lines = labels.read_text().strip().split("\n")
    assert lines == ["rec_a_fundus.png 1", "rec_b_fundus.png 0"]
    from PIL import Image

    assert Image.open(fundus / "rec_a_fundus.png").size == (48, 48)

    oct_dir = tmp_path / "oct"
    assert main(["oct-to-nii", "--input", str(src),
                 "--output", str(oct_dir)]) == 0
    with zipfile.ZipFile(oct_dir / "rec_a.zip") as zf:
        zf.extract("rec_a.nii", tmp_path)
    got = read_nifti(tmp_path / "rec_a.nii")
    np.testing.assert_allclose(np.asarray(got), vol, rtol=1e-6)
    assert not (oct_dir / "rec_a.nii").exists()  # zipped then removed
