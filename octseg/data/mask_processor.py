"""Binary-mask refinement for the fold materializer (host path).

Behavioral contract (pinned by tests/test_mask_stack.py golden arrays): the
reference refines every decoded object mask with an elliptical
open→close→dilate chain whose kernel is 0.5% of the smaller image dimension,
then keeps the three largest contours redrawn filled (reference:
src/data/mask_processor.py:5-37). octseg reimplements the same outputs on a
different substrate:

- the morphology chain runs as composed scipy binary erosions/dilations with
  cv2's border conventions (erosion pads with foreground — cv2's +inf
  border; dilation with background). cv2's even-sized elliptical kernels are
  asymmetric AND cv2 correlates dilation with the 180°-rotated kernel, so
  dilation is computed on the point-reflected mask and reflected back —
  verified bit-exact against cv2 for kernels 1-7 including the even sizes
  the 0.5% law actually produces (512px→2, 896px→4);
- region selection ranks contour areas once and keeps everything at or
  above the third-largest value (the same multiset semantics as the
  reference's top-3 membership test, including ties), drawn in a single
  filled pass so even-odd parity preserves holes.

These run once per dataset build, never in the training hot path — host
numpy/scipy is the right place for them (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools

import cv2
import numpy as np
from scipy import ndimage


@functools.lru_cache(maxsize=None)
def _ellipse(size: int) -> tuple:
    """cv2's elliptical structuring element, as a hashable bool tuple-of-
    tuples (lru-cached; the 0.5% law yields a handful of distinct sizes)."""
    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (size, size))
    return tuple(map(tuple, se.astype(bool)))


def kernel_size_for(shape: tuple) -> int:
    """The reference's kernel law: 0.5% of the smaller dimension, >= 1."""
    return max(int(0.005 * min(shape)), 1)


def _erode(mask: np.ndarray, se: np.ndarray) -> np.ndarray:
    # cv2 erodes with a +inf constant border == all-foreground padding
    return ndimage.binary_erosion(mask, se, border_value=1)


def _dilate(mask: np.ndarray, se: np.ndarray) -> np.ndarray:
    # cv2 correlates with the 180°-rotated kernel anchored at (k//2, k//2);
    # for the asymmetric even-sized ellipses that differs from scipy's
    # placement by exactly a point reflection of the whole image
    return ndimage.binary_dilation(mask[::-1, ::-1], se,
                                   border_value=0)[::-1, ::-1]


def refine_shape(mask: np.ndarray, kernel_size: int | None = None) -> np.ndarray:
    """Open → close → dilate with the reference's elliptical kernel:
    despeckles (open), seals pinholes (close), then grows the boundary one
    kernel radius (dilate). uint8 {0,1} in and out."""
    k = kernel_size if kernel_size is not None else kernel_size_for(mask.shape)
    if k <= 1:
        return mask.astype(np.uint8)  # 1x1 ellipse: every stage is identity
    se = np.asarray(_ellipse(k), bool)
    m = mask.astype(bool)
    opened = _dilate(_erode(m, se), se)
    closed = _erode(_dilate(opened, se), se)
    return _dilate(closed, se).astype(np.uint8)


def keep_largest_regions(mask: np.ndarray, keep: int = 3) -> np.ndarray:
    """Drop everything but the ``keep`` largest contours (by cv2 polygon
    area), redrawn filled in one even-odd pass so annulus holes survive.
    Ties at the cutoff keep every contour of equal area, matching the
    reference's membership semantics."""
    mask = mask.astype(np.uint8)
    contours, _ = cv2.findContours(mask, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    out = np.zeros_like(mask)
    if not contours:
        return out
    areas = np.fromiter((cv2.contourArea(c) for c in contours), float,
                        count=len(contours))
    cutoff = np.sort(areas)[-keep] if len(areas) > keep else -np.inf
    winners = [c for c, a in zip(contours, areas) if a >= cutoff]
    return cv2.drawContours(out, winners, -1, 1, thickness=cv2.FILLED)


class MaskProcessor:
    """Reference-API shim (smooth_mask / remove_artifacts names) over the
    functions above; convert_int_to_cv and external callers use this."""

    smooth_mask = staticmethod(refine_shape)
    remove_artifacts = staticmethod(keep_largest_regions)
