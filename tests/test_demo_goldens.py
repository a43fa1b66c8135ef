"""Render-chain parity against the reference's REAL committed artifacts.

The reference repo ships its demo predictions (`data/demo/output/*_{mask,
overlay}.png`, produced by its trained models + `src/models/smp/utils.py`
postprocessing). The trained weights are DVC pointers (unavailable here),
but the artifacts themselves still pin the full mask→overlay render chain:
reconstruct the binary per-class masks from the reference's own color-mask
PNG, re-render with octseg's `save_results`, and compare pixels against the
reference's overlay/mask PNGs.

This grounds the parity claim in reference-produced artifacts rather than
our own transcription of the reference code (test_infer.py's byte-parity
test). Thresholds: the committed reference PNGs have ~0.5-1% soft-edge
blend pixels (their artifacts appear rendered at the 750-px input size and
upscaled to 1000), which an exact binary reconstruction cannot reproduce —
measured identity is 99.2-99.5% (mask) / 96.6-97.5% (overlay) with mean
overlay |diff| ≤ 1.2 of 255 across all three frames.
"""

import os

import numpy as np
import pytest
from PIL import Image

CLASSES = ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum']
FRAMES = ['001_1_007', '006_1_100', '032_1_176']


@pytest.mark.parametrize('name', FRAMES)
def test_render_chain_reproduces_reference_demo_artifacts(
        name, tmp_path, reference_dir):
    from octseg.core.registry import CLASS_COLORS_RGB, CLASS_IDS
    from octseg.data.utils import save_results

    out_dir = os.path.join(reference_dir, 'data/demo/output')
    ref_mask = np.asarray(
        Image.open(os.path.join(out_dir, f'{name}_mask.png'))).astype(int)
    ref_overlay = np.asarray(
        Image.open(os.path.join(out_dir, f'{name}_overlay.png'))).astype(int)
    h, w = ref_mask.shape[:2]
    inp = Image.open(os.path.join(
        reference_dir, 'data/demo/input', f'{name}.png')).resize((w, h))

    # binary per-class masks back out of the reference's color mask
    # (nearest-color; tolerance absorbs its soft-edge blend pixels)
    masks = np.zeros((h, w, 4), np.float64)
    for cl in CLASSES:
        color = np.array(CLASS_COLORS_RGB[cl])
        masks[:, :, CLASS_IDS[cl] - 1] = (
            np.abs(ref_mask - color).sum(-1) < 60).astype(float)

    save_results([inp], [masks], [name], CLASSES, str(tmp_path))
    ours_mask = np.asarray(
        Image.open(tmp_path / f'{name}_mask.png')).astype(int)
    ours_overlay = np.asarray(
        Image.open(tmp_path / f'{name}_overlay.png')).astype(int)

    mask_ident = float((np.abs(ours_mask - ref_mask).max(-1) == 0).mean())
    ov_ident = float((np.abs(ours_overlay - ref_overlay).max(-1) == 0).mean())
    ov_mean = float(np.abs(ours_overlay - ref_overlay).mean())
    assert mask_ident >= 0.99, mask_ident
    assert ov_ident >= 0.96, ov_ident
    assert ov_mean <= 1.5, ov_mean


@pytest.mark.parametrize('stem', ['001_001', '001_093', '001_098'])
def test_colorize_mask_reproduces_reference_visualization(
        stem, reference_dir):
    """colorize_mask is byte-exact against the reference's committed
    data/visualization mask -> mask_color pairs (real annotated frames,
    produced by its own convert_int_to_cv.py:96-108 chain)."""
    from octseg.data.convert_int_to_cv import colorize_mask
    from octseg.data.tiffio import read_tiff

    mask = read_tiff(os.path.join(
        reference_dir, 'data/visualization/mask', f'{stem}.tiff'))
    ref_color = read_tiff(os.path.join(
        reference_dir, 'data/visualization/mask_color', f'{stem}.tiff'))
    np.testing.assert_array_equal(colorize_mask(mask, CLASSES), ref_color)
