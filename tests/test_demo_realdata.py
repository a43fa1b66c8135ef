"""Fold materializer of the real-imagery behavioral-parity harness.

`scripts/train_demo_realdata.py` turns the reference's committed demo
pullback (`data/app/demo`, reference src/app/app.py:85-101) into a CV-style
train/held-out fold via an interleaved-block frame split. These tests pin
the split logic on a synthetic pullback and, against the real reference
checkout, the experiment's preconditions (186 frames, every class present
on both sides of the split).
"""

import importlib.util
import json
import os
from glob import glob

import numpy as np
import pytest
from PIL import Image

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'scripts', 'train_demo_realdata.py')


def _load_script():
    spec = importlib.util.spec_from_file_location('train_demo_realdata', SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_interleaved_block_split(tmp_path, monkeypatch):
    from octseg.data.tiffio import read_tiff, write_tiff

    mod = _load_script()
    n = 20
    ref = tmp_path / 'ref'
    img_dir = ref / 'data/app/demo/img'
    mask_dir = ref / 'data/app/demo/mask'
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    rng = np.random.default_rng(11)
    for i in range(n):
        stem = f'frame_{i:03d}'
        Image.fromarray(
            rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
        ).save(img_dir / f'{stem}.png')
        mask = np.zeros((8, 8, 4), np.uint8)
        mask[:, :, i % 4] = 255  # frame i carries exactly class i%4
        write_tiff(str(mask_dir / f'{stem}.tiff'), mask)
    monkeypatch.setattr(mod, 'REFERENCE_DIR', str(ref))

    fold = tmp_path / 'fold'
    stats = mod.materialize_demo_fold(str(fold))

    # BLOCK=6, TEST_PHASE=2: frames 12..17 (block index 2) are the held-out
    # set for a 20-frame pullback; everything else trains.
    test_stems = {f'frame_{i:03d}' for i in range(12, 18)}
    got_test = {
        os.path.splitext(os.path.basename(p))[0]
        for p in glob(str(fold / 'test' / 'img' / '*.png'))}
    assert got_test == test_stems
    assert stats['train']['frames'] == n - len(test_stems)
    assert stats['test']['frames'] == len(test_stems)
    # images and masks stay paired per split
    for split in ('train', 'test'):
        imgs = {os.path.splitext(os.path.basename(p))[0]
                for p in glob(str(fold / split / 'img' / '*.png'))}
        masks = {os.path.splitext(os.path.basename(p))[0]
                 for p in glob(str(fold / split / 'mask' / '*.tiff'))}
        assert imgs == masks
    # presence stats count frames whose mask carries each class channel
    # (test frames 12..17 -> i%4 hits classes 0,1 twice and 2,3 once)
    assert stats['test']['frames_with_class'] == {
        'Lumen': 2, 'Fibrous cap': 2, 'Lipid core': 1, 'Vasa vasorum': 1}
    # masks survive the copy bit-exactly
    sample = sorted(glob(str(fold / 'test' / 'mask' / '*.tiff')))[0]
    stem = os.path.splitext(os.path.basename(sample))[0]
    np.testing.assert_array_equal(
        read_tiff(sample), read_tiff(str(mask_dir / f'{stem}.tiff')))


@pytest.mark.slow
def test_real_demo_fold_preconditions(tmp_path, reference_dir, monkeypatch):
    """The committed experiment's split invariants hold on the real pullback."""
    mod = _load_script()
    monkeypatch.setattr(mod, 'REFERENCE_DIR', reference_dir)
    stats = mod.materialize_demo_fold(str(tmp_path / 'fold'))
    assert stats['train']['frames'] == 150
    assert stats['test']['frames'] == 36
    for split in ('train', 'test'):
        for cl, count in stats[split]['frames_with_class'].items():
            assert count > 0, f'{cl} absent from {split} split'
    # committed artifact agrees with a fresh materialization
    committed = os.path.join('eval', 'demo_realdata', 'summary.json')
    if os.path.exists(committed):
        with open(committed) as f:
            recorded = json.load(f).get('fold')
        if recorded:
            assert recorded == stats
