"""Host-side image IO: PNG/JPG via OpenCV/PIL, N-channel mask TIFFs via tiffio.

These are the framework's equivalents of the reference's cv2.imread /
tifffile.imread|imwrite usage (reference: src/models/smp/dataset.py:109-112,
src/data/convert_int_to_cv.py:213). Container decode is host I/O, not compute;
all per-pixel work happens on device (see octseg.ops).
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from octseg.data import tiffio


def imread(path: str, bgr: bool = True) -> np.ndarray:
    """Read PNG/JPG to uint8 HWC. BGR by default (cv2.imread parity)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f'Cannot read image: {path}')
    if not bgr:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def imwrite(path: str, img: np.ndarray, bgr: bool = True) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if not bgr and img.ndim == 3 and img.shape[2] == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    if not cv2.imwrite(path, img):
        raise IOError(f'Cannot write image: {path}')


def imread_mask_tiff(path: str) -> np.ndarray:
    """Read an (H, W, C) uint8 mask TIFF (values {0, 255} per class channel)."""
    return tiffio.read_tiff(path)


def imwrite_mask_tiff(path: str, mask: np.ndarray, compression: str = 'lzw') -> None:
    """Write an (H, W, C) uint8 mask TIFF with LZW compression (ref parity)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tiffio.write_tiff(path, mask.astype(np.uint8), compression=compression)
