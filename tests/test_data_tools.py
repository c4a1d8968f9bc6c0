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
