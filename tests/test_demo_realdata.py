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


# Floors sit ~0.03-0.06 below the committed r5 numbers (summary.json:
# pretrained two-stage starts — LM 0.9762 / FC 0.6405 / LC 0.7139 /
# VV 0.8619; product-path ensemble Lumen 0.9789, FC 0.5221, LC 0.5671,
# VV 0.7717, mean 0.7099 with output_resize=prob_bilinear) so noise-level
# retrains pass but a real regression in models/engine/augmentation fails
# the parity number, not a stale doc.
SUMMARY = os.path.join(
    os.path.dirname(SCRIPT), '..', 'eval', 'demo_realdata', 'summary.json')
HELD_OUT_FLOORS = {
    'LM': {'Lumen': 0.95},
    'FC_LC': {'Lipid core': 0.65, 'Fibrous cap': 0.60},
    'VV': {'Vasa vasorum': 0.80},
}
ENSEMBLE_FLOORS = {'Lumen': 0.95, 'Fibrous cap': 0.47,
                   'Lipid core': 0.51, 'Vasa vasorum': 0.73}
ENSEMBLE_MEAN_FLOOR = 0.67


def test_committed_summary_meets_floors():
    """The committed experiment result stays above its parity floors.

    Guards the artifact itself: a regressed rerun cannot be committed over
    the r4 numbers without this test going red."""
    with open(SUMMARY) as f:
        summary = json.load(f)
    for model, floors in HELD_OUT_FLOORS.items():
        for cl, floor in floors.items():
            got = summary[model]['test_dice'][cl]
            assert got >= floor, f'{model}/{cl}: {got} < floor {floor}'
    ens = summary['ensemble']['ensemble_dice_vs_reference']
    for cl, floor in ENSEMBLE_FLOORS.items():
        assert ens[cl] >= floor, f'ensemble/{cl}: {ens[cl]} < floor {floor}'
    assert summary['ensemble']['mean_dice'] >= ENSEMBLE_MEAN_FLOOR
    assert summary['ensemble']['frames'] == 36


@pytest.mark.slow
def test_product_path_dice_floor(tmp_path, reference_dir, monkeypatch):
    """Re-run the PRODUCT path (hybrid InferenceEngine.segment at native
    750x750) over the held-out frames with the locally trained checkpoints
    and re-assert the ensemble floors — regressions in the engine, routing,
    or postprocess show up here even when summary.json is untouched.

    Needs the (uncommitted, multi-GB) weights from a completed
    scripts/train_demo_realdata.py run; skips when they are absent."""
    mod = _load_script()
    out = os.path.join(os.path.dirname(SCRIPT), '..', 'eval', 'demo_realdata')
    weights = [os.path.join(out, name, 'weights.ckpt')
               for name, *_ in mod.WINNING_CONFIGS]
    if not all(os.path.exists(w) for w in weights):
        pytest.skip('demo_realdata checkpoints not present on this machine')
    monkeypatch.setattr(mod, 'REFERENCE_DIR', reference_dir)
    fold = os.path.join(out, 'fold')
    if not os.path.isdir(os.path.join(fold, 'test')):
        mod.materialize_demo_fold(fold)
    result = mod.score_ensemble(out, fold, str(tmp_path / 'predict'))
    dice = result['ensemble_dice_vs_reference']
    for cl, floor in ENSEMBLE_FLOORS.items():
        assert dice[cl] >= floor, f'ensemble/{cl}: {dice[cl]} < floor {floor}'
    assert result['mean_dice'] >= ENSEMBLE_MEAN_FLOOR


GAP_SCRIPT = os.path.join(os.path.dirname(SCRIPT), 'gap_attribution.py')


def _load_gap():
    spec = importlib.util.spec_from_file_location('gap_attribution', GAP_SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gap_attribution_helpers_and_split_consistency():
    """The attribution harness must score the SAME held-out frames as the
    training split (same BLOCK/TEST_PHASE) and its dice helpers must match
    first-principles formulas."""
    gap = _load_gap()
    mod = _load_script()
    assert (gap.BLOCK, gap.TEST_PHASE) == (mod.BLOCK, mod.TEST_PHASE)

    rng = np.random.default_rng(5)
    p = rng.random((4, 16, 16)) > 0.5
    g = rng.random((4, 16, 16)) > 0.5
    inter = np.logical_and(p, g).sum()
    assert gap.dice_micro(p, g) == pytest.approx(
        2 * inter / (p.sum() + g.sum()))
    # per-sample: mean over frames of 2*iou/(iou+1) (the evaluate-path quirk)
    vals = []
    for pi, gi in zip(p, g):
        tp = np.logical_and(pi, gi).sum()
        iou = tp / (tp + np.logical_xor(pi, gi).sum())
        vals.append(2 * iou / (iou + 1))
    assert gap.dice_per_sample(p, g) == pytest.approx(np.mean(vals))
    # perfect prediction scores 1.0 under both
    assert gap.dice_micro(g, g) == pytest.approx(1.0)
    assert gap.dice_per_sample(g, g) == pytest.approx(1.0)


def test_gap_attribution_committed_artifact():
    """Schema + internal-consistency checks of the committed per-factor
    breakdown (VERDICT r4 item 1)."""
    path = os.path.join(os.path.dirname(SCRIPT), '..', 'eval',
                        'demo_realdata', 'gap_attribution.json')
    if not os.path.exists(path):
        pytest.skip('gap_attribution.json not yet committed')
    with open(path) as f:
        report = json.load(f)
    assert report['held_out_frames'] == 36
    s0 = report['stage0_label_roundtrip']
    for cl in ('Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'):
        r = s0[cl]
        # prob-bilinear downsize must not lose more than the NEAREST contract
        assert r['roundtrip_prob_bilinear_micro'] >= r['roundtrip_nearest_micro']
        assert r['roundtrip_nearest_micro'] > 0.9  # resize is NOT the 0.2 gap
    if 'ladder' in report:
        for cl, rungs in report['ladder'].items():
            assert set(rungs) >= {
                'A_eval_per_sample_present_modelres',
                'C_micro_all_modelres', 'D_micro_all_750_nearest',
                'Dp_micro_all_750_prob_bilinear'}
            # r5 attribution conclusions (the 0.67->0.48 "gap" of VERDICT
            # r4): the output-resize contract costs <=0.02 (C vs D) and for
            # the gap classes the dominant factor is false positives on
            # class-absent frames (B vs C), NOT any product-path step.
            assert abs(rungs['C_micro_all_modelres']
                       - rungs['D_micro_all_750_nearest']) <= 0.02
        for cl in ('Fibrous cap', 'Lipid core'):
            rungs = report['ladder'][cl]
            assert (rungs['B_micro_present_modelres']
                    - rungs['C_micro_all_modelres']) >= 0.05
    if 'product_path' in report and 'ladder' in report:
        # the real engine reproduces the ladder's model-level D' rung:
        # preprocessing/bf16/routing add <=0.02 — the product path is
        # faithful; bf16 vs fp32 agree to <=0.005
        pb = report['product_path']['prob_bilinear_bf16']
        for cl, rungs in report['ladder'].items():
            assert abs(pb[cl]
                       - rungs['Dp_micro_all_750_prob_bilinear']) <= 0.02
        pf = report['product_path'].get('prob_bilinear_fp32')
        if pf:
            for cl in pb:
                assert abs(pb[cl] - pf[cl]) <= 0.005


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
