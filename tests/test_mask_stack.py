"""Direct tests for the two data-prep modules previously covered only
incidentally: stack_images (pairing, hstack geometry, video fallback —
reference: src/data/stack_images.py:22-95) and MaskProcessor
(smooth/remove_artifacts parity vs the reference cv2 chain on golden
arrays — reference: src/data/mask_processor.py:11-37)."""

import os
from glob import glob

import cv2
import numpy as np
import pytest

from octseg.core.config import Config
from octseg.data.convert_dicoms import resize_keep_aspect
from octseg.data.mask_processor import MaskProcessor
from octseg.data.stack_images import main as stack_main, process_single_series


# ------------------------------ MaskProcessor ------------------------------

def _blob_mask(size=512, seed=4):
    """Deterministic multi-blob binary mask with ragged edges."""
    rng = np.random.default_rng(seed)
    mask = np.zeros((size, size), np.uint8)
    margin = min(size // 4, 60)
    for _ in range(6):
        c = rng.integers(margin, size - margin, 2)
        r = int(rng.integers(5, max(margin, 10)))
        cv2.circle(mask, (int(c[0]), int(c[1])), r, 1, -1)
    noise = (rng.random((size, size)) < 0.002).astype(np.uint8)
    return np.clip(mask + noise, 0, 1)


def _reference_smooth(mask):
    """The exact reference chain (src/data/mask_processor.py:11-24)."""
    mask = mask.astype(np.uint8)
    kernel_size = max(int(0.005 * min(mask.shape)), 1)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (kernel_size, kernel_size))
    mask_open = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
    mask_close = cv2.morphologyEx(mask_open, cv2.MORPH_CLOSE, kernel)
    return cv2.morphologyEx(mask_close, cv2.MORPH_DILATE, kernel)


def _reference_remove(mask):
    """The exact reference chain (src/data/mask_processor.py:26-37)."""
    mask = mask.astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    areas = [cv2.contourArea(cnt) for cnt in contours]
    keep = sorted(areas, reverse=True)[:3]
    biggest = [cnt for cnt, a in zip(contours, areas) if a in keep]
    out = np.zeros_like(mask)
    return cv2.drawContours(out, biggest, -1, 1, thickness=cv2.FILLED)


@pytest.mark.parametrize('size', [100, 512, 896])
def test_smooth_mask_reference_parity(size):
    mask = _blob_mask(size)
    got = MaskProcessor.smooth_mask(mask)
    want = _reference_smooth(mask)
    np.testing.assert_array_equal(got, want)
    assert set(np.unique(got)) <= {0, 1}


def test_smooth_mask_kernel_size_law():
    # 0.5% of the min dimension, floored, at least 1
    for size, k in ((100, 1), (512, 2), (896, 4)):
        assert max(int(0.005 * size), 1) == k  # the law the module encodes
        out = MaskProcessor.smooth_mask(_blob_mask(size))
        assert out.shape == (size, size)


def test_remove_artifacts_keeps_three_largest():
    mask = np.zeros((256, 256), np.uint8)
    radii = [40, 30, 20, 10, 5]  # distinct areas, descending
    centers = [(40, 40), (130, 60), (210, 40), (60, 200), (200, 200)]
    for r, c in zip(radii, centers):
        cv2.circle(mask, c, r, 1, -1)
    got = MaskProcessor.remove_artifacts(mask)
    np.testing.assert_array_equal(got, _reference_remove(mask))
    # only the 3 largest blobs survive
    for r, c in zip(radii, centers):
        assert got[c[1], c[0]] == (1 if r >= 20 else 0), (r, c)


def test_remove_artifacts_preserves_holes():
    # RETR_TREE keeps inner contours and the single FILLED drawContours call
    # fills with even-odd parity, so an annulus keeps its hole — the exact
    # reference behavior fold masks depend on
    mask = np.zeros((128, 128), np.uint8)
    cv2.circle(mask, (64, 64), 40, 1, -1)
    cv2.circle(mask, (64, 64), 15, 0, -1)  # hole
    got = MaskProcessor.remove_artifacts(mask)
    np.testing.assert_array_equal(got, _reference_remove(mask))
    assert got[64, 64] == 0  # hole survives (parity fill)
    assert got[64, 64 + 30] == 1  # ring body kept


def test_remove_artifacts_idempotent():
    mask = _blob_mask(256, seed=9)
    once = MaskProcessor.remove_artifacts(mask)
    twice = MaskProcessor.remove_artifacts(once)
    np.testing.assert_array_equal(once, twice)


# ------------------------------- stack_images ------------------------------

def _write_series(root, study, series, n, size, value0=10):
    d = os.path.join(root, study, series)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = np.full((size[0], size[1], 3), value0 + i, np.uint8)
        img[0, 0] = (i, 2 * i, 3 * i)  # distinguishable corner pixel
        cv2.imwrite(os.path.join(d, f'{i:03d}.png'), img)


def test_stack_images_pairing_and_geometry(tmp_path):
    """Two paired series roots -> hstacked frames named
    {study}_{series}_{idx+1:03d}.png; the mismatched-size panel is resized
    height-first with truncated aspect width (imutils.resize parity)."""
    rgb = str(tmp_path / 'rgb')
    gray = str(tmp_path / 'gray')
    out = str(tmp_path / 'out')
    _write_series(rgb, 'study1', 'ser1', 3, (64, 64), value0=50)
    # grayscale panel at a different size: 32x33 -> height 64, width int(66)
    _write_series(gray, 'study1', 'ser1', 3, (32, 33), value0=100)

    cfg = Config(data_dir_1=rgb, data_dir_2=gray, output_size=[64, 64],
                 output_type='image', fps=10, save_dir=out)
    stack_main(cfg)

    files = sorted(glob(os.path.join(out, 'study1', 'ser1', '*.png')))
    assert [os.path.basename(f) for f in files] == [
        'study1_ser1_001.png', 'study1_ser1_002.png', 'study1_ser1_003.png']
    img = cv2.imread(files[0])
    assert img.shape == (64, 64 + 66, 3)  # rgb panel + resized gray panel
    # left panel is the rgb frame verbatim
    assert (img[:, :64] == cv2.imread(
        os.path.join(rgb, 'study1', 'ser1', '000.png'))).all()
    # right panel equals the reference resize (height-driven, truncated width)
    want = resize_keep_aspect(
        cv2.imread(os.path.join(gray, 'study1', 'ser1', '000.png')), 64)
    assert want.shape[1] == 66  # int(33 * 64/32), truncation not rounding
    assert (img[:, 64:] == want).all()


def test_stack_images_video_fallback(tmp_path):
    """output_type=video writes an mp4; without ffmpeg on PATH the mp4v
    temp file is promoted to the final name (reencode_h264 fallback)."""
    rgb = str(tmp_path / 'rgb')
    gray = str(tmp_path / 'gray')
    out = str(tmp_path / 'out')
    _write_series(rgb, 's', 'a', 4, (32, 32))
    _write_series(gray, 's', 'a', 4, (32, 32))

    process_single_series(
        series_dirs=[os.path.join(rgb, 's', 'a'), os.path.join(gray, 's', 'a')],
        img_height=32, img_width=32, output_type='video', fps=5, save_dir=out,
    )
    final = os.path.join(out, 's', 's_a.mp4')
    assert os.path.exists(final) and os.path.getsize(final) > 0
    assert not os.path.exists(os.path.join(out, 's', 's_a_temp.mp4'))


def test_stack_images_mismatched_series_counts(tmp_path):
    rgb = str(tmp_path / 'rgb')
    gray = str(tmp_path / 'gray')
    _write_series(rgb, 'st', 'a', 1, (16, 16))
    _write_series(rgb, 'st', 'b', 1, (16, 16))
    _write_series(gray, 'st', 'a', 1, (16, 16))
    cfg = Config(data_dir_1=rgb, data_dir_2=gray, output_size=[16, 16],
                 output_type='image', fps=10, save_dir=str(tmp_path / 'o'))
    with pytest.raises(AssertionError, match='Mismatch'):
        stack_main(cfg)
