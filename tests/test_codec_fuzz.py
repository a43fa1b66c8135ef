"""Randomized roundtrip + malformed-input tests for the hand-rolled codecs.

octseg carries its own TIFF/LZW, DICOM and xlsx codecs (no tifffile/pydicom/
openpyxl on the rig). Their happy paths are golden-tested elsewhere; this
file sweeps randomized shapes/contents (seeded, so deterministic) and checks
that malformed inputs fail with a clear exception instead of corrupting data
or crashing the interpreter (a truncated upload to the web app must 4xx,
not kill the worker — octseg/analyze/app.py feeds these codecs directly).
"""

import numpy as np
import pytest

from octseg.data import tiffio
from octseg.data.xlsxio import read_xlsx, write_xlsx


@pytest.mark.parametrize('seed', range(6))
def test_tiff_roundtrip_random_shapes(tmp_path, seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 97))
    w = int(rng.integers(1, 97))
    c = int(rng.choice([1, 2, 3, 4, 7]))
    comp = str(rng.choice(['lzw', 'zip', 'none']))
    arr = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    arr = arr[..., 0] if c == 1 else arr
    path = str(tmp_path / f'f{seed}.tiff')
    tiffio.write_tiff(path, arr, compression=comp)
    back = tiffio.read_tiff(path)
    np.testing.assert_array_equal(back.squeeze(), arr.squeeze())


def test_lzw_roundtrip_adversarial_payloads():
    cases = [
        b'',
        b'\x00' * 4096,                      # degenerate: one repeated symbol
        bytes(range(256)) * 16,              # no repetition
        np.random.default_rng(7).integers(0, 4, 10000,
                                          dtype=np.uint8).tobytes(),
    ]
    for data in cases:
        assert tiffio.lzw_decode(tiffio.lzw_encode(data)) == data


def test_tiff_rejects_garbage_and_truncation(tmp_path):
    p = tmp_path / 'bad.tiff'
    p.write_bytes(b'NOTATIFFFILE....')
    with pytest.raises((ValueError, NotImplementedError)):
        tiffio.read_tiff(str(p))

    good = tmp_path / 'good.tiff'
    arr = np.zeros((32, 32, 4), np.uint8)
    tiffio.write_tiff(str(good), arr)
    blob = good.read_bytes()
    trunc = tmp_path / 'trunc.tiff'
    trunc.write_bytes(blob[: len(blob) // 3])
    with pytest.raises(Exception) as ei:
        tiffio.read_tiff(str(trunc))
    assert not isinstance(ei.value, (SystemExit, MemoryError))


def test_dicom_rejects_garbage(tmp_path):
    from octseg.data import dicom

    p = tmp_path / 'bad.dcm'
    p.write_bytes(b'\x00' * 64 + b'NOPE' + b'\x00' * 64)
    with pytest.raises(Exception) as ei:
        dicom.dcmread(str(p))
    assert not isinstance(ei.value, (SystemExit, MemoryError))


def test_xlsx_roundtrip_random_tables(tmp_path):
    rng = np.random.default_rng(11)
    for t in range(4):
        n_rows = int(rng.integers(1, 12))
        n_cols = int(rng.integers(1, 8))
        header = [f'col_{i}' for i in range(n_cols)]
        rows = [header]
        for _ in range(n_rows):
            row = []
            for _ in range(n_cols):
                kind = rng.integers(0, 4)
                row.append(
                    float(rng.normal()) if kind == 0 else
                    int(rng.integers(-999, 999)) if kind == 1 else
                    ('<&"é>' + str(rng.integers(0, 99))) if kind == 2
                    else None)
            rows.append(row)
        path = str(tmp_path / f'r{t}.xlsx')
        write_xlsx(path, rows)
        got = read_xlsx(path)
        assert got[0] == header
        for orig, back in zip(rows[1:], got[1:]):
            for o, b in zip(orig, back):
                if isinstance(o, float):
                    assert b == pytest.approx(o)
                elif o is None:
                    assert b in (None, '')
                else:
                    assert b == o


def test_xlsx_rejects_garbage(tmp_path):
    p = tmp_path / 'bad.xlsx'
    p.write_bytes(b'PK\x03\x04 not really a zip')
    with pytest.raises(Exception) as ei:
        read_xlsx(str(p))
    assert not isinstance(ei.value, (SystemExit, MemoryError))
