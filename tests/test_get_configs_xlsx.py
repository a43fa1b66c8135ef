"""xlsx sweep-export ingestion: the reference's real W&B exports run
unmodified through octseg's aggregator and reproduce the reference's own
configs_all/configs_best selection (reference: src/models/get_configs.py).

The golden comparison runs against the actual exports shipped in the
reference checkout (eval/tuning/*.xlsx) when present; the codec roundtrip
tests are self-contained.
"""

import math
import os

import pytest

from octseg.data.xlsxio import (
    read_xlsx,
    read_xlsx_records,
    write_xlsx,
    write_xlsx_records,
)
from octseg.tune.get_configs import best_architectures, combine_export_files

_REF_TUNING = '/root/reference/eval/tuning'
_CLASS_EXPORTS = ['lumen.xlsx', 'fibrous_cap.xlsx', 'lipid_core.xlsx',
                  'vasa_vasorum.xlsx']


def test_xlsx_roundtrip(tmp_path):
    rows = [
        ['Name', 'Score', 'Flag', 'Note'],
        ['a & b', 1.5, True, 'x<y'],
        ['second', -3, False, None],
        [None, 2.0, None, 'tail'],
    ]
    p = str(tmp_path / 'rt.xlsx')
    write_xlsx(p, rows)
    got = read_xlsx(p)
    assert got[0] == rows[0]
    assert got[1] == ['a & b', 1.5, True, 'x<y']
    assert got[2][:3] == ['second', -3, False]
    recs = read_xlsx_records(p)
    assert recs[0]['Name'] == 'a & b' and recs[0]['Score'] == 1.5


def test_xlsx_sheet_name_needs_attribute_escaping(tmp_path):
    # '"' inside an XML attribute is only safe as &quot; — saxutils.escape
    # does not escape it by default (a workbook with a quoted sheet name
    # used to be emitted as malformed XML)
    p = str(tmp_path / 'quoted.xlsx')
    write_xlsx(p, [['A'], [1]], sheet='Q"4 <res>&')
    assert read_xlsx(p) == [['A'], [1]]


def test_xlsx_records_blank_header(tmp_path):
    # pandas names blank header cells 'Unnamed: {i}' — the W&B export index
    # column arrives that way and the aggregator renames it to ID
    p = str(tmp_path / 'u.xlsx')
    write_xlsx(p, [[None, 'col'], [0, 'v']])
    recs = read_xlsx_records(p)
    assert recs == [{'Unnamed: 0': 0, 'col': 'v'}]


def test_write_records_column_order(tmp_path):
    p = str(tmp_path / 'o.xlsx')
    write_xlsx_records(p, [{'b': 2, 'a': 1}], columns=['a', 'b'])
    assert read_xlsx(p)[0] == ['a', 'b']


def test_read_xlsx_sparse_rows(tmp_path):
    """Writers may omit blank rows entirely (valid SpreadsheetML): the 'r'
    attribute must place rows at their true indices, not shift them up."""
    import zipfile

    p = str(tmp_path / 'sparse.xlsx')
    write_xlsx(p, [['h'], ['x']])  # valid container to splice into
    with zipfile.ZipFile(p) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    ns = 'http://schemas.openxmlformats.org/spreadsheetml/2006/main'
    parts['xl/worksheets/sheet1.xml'] = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        '<row r="3"><c r="A3"><v>7</v></c></row>'
        '</sheetData></worksheet>'
    ).encode()
    with zipfile.ZipFile(p, 'w') as z:
        for n, b in parts.items():
            z.writestr(n, b)
    rows = read_xlsx(p)
    assert rows == [['h'], [None], [7]]  # row 2 exists as a blank row


def test_write_xlsx_numpy_scalars(tmp_path):
    import numpy as np

    p = str(tmp_path / 'np.xlsx')
    write_xlsx(p, [['a', 'b', 'c'],
                   [np.float64(0.5), np.int64(7), np.bool_(True)]])
    got = read_xlsx(p)[1]
    assert got == [0.5, 7, True]


needs_reference = pytest.mark.skipif(
    not os.path.isdir(_REF_TUNING), reason='reference checkout not present')


def _is_missing(v):
    # a blank cell may surface as None, '', or NaN depending on the writer
    return v is None or v == '' or (isinstance(v, float) and math.isnan(v))


def _records_equal(got, want, float_tol=1e-9):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert set(g) == set(w), (set(g) ^ set(w))
        for k in w:
            gv, wv = g[k], w[k]
            if _is_missing(wv):
                assert _is_missing(gv), (k, gv, wv)
            elif isinstance(wv, float) and isinstance(gv, (int, float)):
                assert abs(gv - wv) <= float_tol * max(1.0, abs(wv)), (k, gv, wv)
            else:
                assert gv == wv, (k, gv, wv)


@needs_reference
def test_reference_exports_reproduce_configs_all():
    paths = [os.path.join(_REF_TUNING, f) for f in _CLASS_EXPORTS]
    df = combine_export_files(paths)
    want = read_xlsx_records(os.path.join(_REF_TUNING, 'configs_all.xlsx'))
    got = df.to_dict(orient='records')
    _records_equal(got, want, float_tol=1e-6)


@needs_reference
def test_reference_exports_reproduce_configs_best():
    paths = [os.path.join(_REF_TUNING, f) for f in _CLASS_EXPORTS]
    best = best_architectures(combine_export_files(paths))
    want = read_xlsx_records(os.path.join(_REF_TUNING, 'configs_best.xlsx'))
    got = best.to_dict(orient='records')
    _records_equal(got, want, float_tol=1e-6)


@needs_reference
def test_cli_xlsx_mode(tmp_path):
    """End-to-end: the get_configs entry point in xlsx mode writes outputs
    readable by the same codec."""
    from octseg.core.config import Config
    from octseg.tune.get_configs import main

    cfg = Config(
        tuning_dir='unused', metric='val_f1', save_dir=str(tmp_path),
        tuning_file_paths=[os.path.join(_REF_TUNING, f) for f in _CLASS_EXPORTS],
    )
    main(cfg)  # entry_point accepts a prebuilt Config directly
    out_all = read_xlsx_records(str(tmp_path / 'configs_all.xlsx'))
    out_best = read_xlsx_records(str(tmp_path / 'configs_best.xlsx'))
    assert len(out_all) == 1314 and len(out_best) == 36
