"""Binary mask smoothing and artifact removal (host, cv2).

Behavioral parity with the reference MaskProcessor (reference:
src/data/mask_processor.py:5-37): open→close→dilate with an elliptical kernel
sized 0.5% of the min dimension, and keep-3-largest-contours redraw. These run
once per dataset build (not in the training hot path), so they stay on host
where contour extraction is natural.
"""

from __future__ import annotations

import cv2
import numpy as np


class MaskProcessor:
    """Processing for binary masks: smoothing and artifact removal."""

    @staticmethod
    def smooth_mask(mask: np.ndarray) -> np.ndarray:
        mask = mask.astype(np.uint8)
        kernel_size = max(int(0.005 * min(mask.shape)), 1)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (kernel_size, kernel_size))
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel)
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
        return cv2.morphologyEx(mask, cv2.MORPH_DILATE, kernel)

    @staticmethod
    def remove_artifacts(mask: np.ndarray) -> np.ndarray:
        mask = mask.astype(np.uint8)
        contours, _ = cv2.findContours(mask, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
        areas = [cv2.contourArea(c) for c in contours]
        keep = sorted(areas, reverse=True)[:3]
        biggest = [c for c, a in zip(contours, areas) if a in keep]
        out = np.zeros_like(mask)
        return cv2.drawContours(out, biggest, -1, 1, thickness=cv2.FILLED)
