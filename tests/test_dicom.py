"""Native DICOM reader (VERDICT round-1 missing #4): synthetic Part-10
files in both uncompressed LE transfer syntaxes, series assembly order,
rescale handling, and the data_tools convert fallback end-to-end."""

import struct
from pathlib import Path

import numpy as np
import pytest

from otfusion_tpu.data.dicom_io import (
    DicomParseError,
    read_dicom_series,
    read_dicom_slice,
)

_EXPLICIT = "1.2.840.10008.1.2.1"
_IMPLICIT = "1.2.840.10008.1.2"


def _element(group, elem, vr, value, explicit):
    head = struct.pack("<HH", group, elem)
    if explicit:
        if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
            return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
        return head + vr + struct.pack("<H", len(value)) + value
    return head + struct.pack("<I", len(value)) + value


def _pad(s):
    b = s.encode()
    return b + b" " if len(b) % 2 else b


def write_dicom(path, pixels, *, syntax=_EXPLICIT, instance=1,
                position=None, slope=1.0, intercept=0.0):
    """Minimal Part-10 writer: preamble + meta group + data set."""
    explicit = syntax == _EXPLICIT
    rows, cols = pixels.shape
    px = pixels.astype("<i2").tobytes()

    meta = b"".join([
        _element(0x0002, 0x0010, b"UI", _pad(syntax), True),
    ])
    body = []
    body.append(_element(0x0010, 0x0020, b"LO", _pad("123_S_4567"),
                         explicit))
    body.append(_element(0x0020, 0x0013, b"IS", _pad(str(instance)),
                         explicit))
    if position is not None:
        body.append(_element(
            0x0020, 0x0032, b"DS",
            _pad("\\".join(f"{v:.1f}" for v in position)), explicit))
    body.append(_element(0x0028, 0x0002, b"US", struct.pack("<H", 1),
                         explicit))
    body.append(_element(0x0028, 0x0010, b"US", struct.pack("<H", rows),
                         explicit))
    body.append(_element(0x0028, 0x0011, b"US", struct.pack("<H", cols),
                         explicit))
    body.append(_element(0x0028, 0x0100, b"US", struct.pack("<H", 16),
                         explicit))
    body.append(_element(0x0028, 0x0103, b"US", struct.pack("<H", 1),
                         explicit))
    body.append(_element(0x0028, 0x1052, b"DS", _pad(str(intercept)),
                         explicit))
    body.append(_element(0x0028, 0x1053, b"DS", _pad(str(slope)),
                         explicit))
    body.append(_element(0x7FE0, 0x0010, b"OW", px, explicit))
    Path(path).write_bytes(b"\x00" * 128 + b"DICM" + meta + b"".join(body))


@pytest.mark.parametrize("syntax", [_EXPLICIT, _IMPLICIT])
def test_read_slice_roundtrip(tmp_path, rng, syntax):
    pixels = rng.integers(-500, 500, size=(16, 16)).astype(np.int16)
    f = tmp_path / "a.dcm"
    write_dicom(f, pixels, syntax=syntax, slope=2.0, intercept=-10.0)
    arr, meta = read_dicom_slice(f)
    np.testing.assert_allclose(arr, pixels.astype(np.float32) * 2.0 - 10.0)
    assert meta["patient_id"] == "123_S_4567"


def test_series_orders_by_position(tmp_path, rng):
    # write slices out of filename order; z-position must win
    for name, z, fill in (("c.dcm", 0.0, 0), ("a.dcm", 10.0, 2),
                          ("b.dcm", 5.0, 1)):
        write_dicom(tmp_path / name,
                    np.full((8, 8), fill, np.int16),
                    position=(0.0, 0.0, z))
    vol = read_dicom_series(tmp_path)
    assert vol.shape == (3, 8, 8)
    np.testing.assert_array_equal(vol[:, 0, 0], [0.0, 1.0, 2.0])


def test_series_falls_back_to_instance_number(tmp_path):
    for name, inst, fill in (("x.dcm", 3, 30), ("y.dcm", 1, 10),
                             ("z.dcm", 2, 20)):
        write_dicom(tmp_path / name, np.full((4, 4), fill, np.int16),
                    instance=inst)
    vol = read_dicom_series(tmp_path)
    np.testing.assert_array_equal(vol[:, 0, 0], [10.0, 20.0, 30.0])


def test_compressed_syntax_rejected(tmp_path, rng):
    f = tmp_path / "jpeg.dcm"
    write_dicom(f, np.zeros((4, 4), np.int16),
                syntax="1.2.840.10008.1.2.4.90")
    with pytest.raises(DicomParseError, match="transfer syntax"):
        read_dicom_slice(f)


def test_convert_cli_native_fallback(tmp_path, rng):
    """End-to-end: reference DICOM tree layout -> NIfTI tree via the
    data_tools convert subcommand without dcm2niix."""
    from otfusion_tpu.cli.data_tools import main
    from otfusion_tpu.data.nifti_io import read_nifti

    leaf = tmp_path / "in" / "123_S_4567" / "MPRAGE" / "2024-01-01" / "I1"
    leaf.mkdir(parents=True)
    for i in range(4):
        write_dicom(leaf / f"s{i}.dcm",
                    np.full((6, 6), i * 100, np.int16),
                    position=(0.0, 0.0, float(i)))
    out = tmp_path / "out"
    main(["convert", "--native", "--input", str(tmp_path / "in"),
          "--output", str(out)])
    produced = list(out.rglob("*.nii.gz"))
    assert len(produced) == 1
    vol = read_nifti(produced[0])
    assert vol.shape == (4, 6, 6)
    np.testing.assert_array_equal(vol[:, 0, 0], [0, 100, 200, 300])
