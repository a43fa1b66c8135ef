"""Pins the committed deployed-shape MFU investigation (benchmarks/mfu896.json).

VERDICT r4 item 3 asked why the ensemble models collapse from 35-60% MFU at
512² to ~13% at their deployed 896² inputs (benchmarks/ensemble_deployed.json)
when FLOP/byte intensity is size-invariant. The grid separates three
hypotheses; these tests assert the committed artifact still supports the
conclusions that parked the finding:

  H1 block size  CONFIRMED — per-execution efficiency rises steeply with
                 frames/block (b8 → b64 roughly doubles MFU); the deployed
                 896² runs are memory-forced to b32/b64 while the 512²
                 headline runs at b128.
  H2 size cliff  REFUTED — at FIXED block, MFU is flat-to-slightly-rising
                 from 512² to 896² (no XLA tiling/padding cliff).
  H3 postproc    REFUTED — the sigmoid/threshold/NEAREST-1000² tail costs
                 ≤5% of block time.
"""

from __future__ import annotations

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
MFU896 = os.path.join(HERE, '..', 'benchmarks', 'mfu896.json')


@pytest.fixture(scope='module')
def rows():
    if not os.path.exists(MFU896):
        pytest.skip('mfu896.json not committed')
    with open(MFU896) as f:
        return json.load(f)['rows']


def _grid(rows):
    return {(r['model'], r['input'], r['block']): r['mfu']
            for r in rows if not r['postproc_1000']}


def test_h2_no_spatial_cliff(rows):
    """At fixed (model, block), 896² MFU is within noise of 512² MFU —
    spatial extent does not degrade XLA's tiling."""
    g = _grid(rows)
    for model in ('VV', 'FC_LC'):
        for block in (8, 16, 32):
            sizes = [g[k] for k in g if k[0] == model and k[2] == block]
            assert len(sizes) >= 3
            assert max(sizes) <= 1.5 * min(sizes), (model, block, sizes)
            # and 896 specifically is not the minimum by a cliff margin
            m896 = g.get((model, 896, block))
            m512 = g.get((model, 512, block))
            if m896 is not None and m512 is not None:
                assert m896 >= 0.8 * m512, (model, block, m512, m896)


def test_h1_block_size_dominates(rows):
    """Per-execution efficiency roughly doubles from b8 to b64 at every
    size where b64 fits — the deployed-shape MFU drop is the memory-forced
    block, not the 896² input itself."""
    g = _grid(rows)
    for model in ('VV', 'FC_LC'):
        for size in (512, 640, 768):
            assert g[(model, size, 64)] >= 1.6 * g[(model, size, 8)]


def test_h3_postproc_tail_negligible(rows):
    """forward+postproc vs forward-only at the same (model, 896, block):
    the added device-resize/threshold tail is ≤5% block time."""
    by_key = {}
    for r in rows:
        by_key[(r['model'], r['input'], r['block'], r['postproc_1000'])] = r
    found = 0
    for (model, size, block, post), r in list(by_key.items()):
        if post and (model, size, block, False) in by_key:
            base = by_key[(model, size, block, False)]
            assert r['ms_per_block'] <= 1.05 * base['ms_per_block']
            found += 1
    assert found >= 1
