"""Quantification engine: per-frame plaque-feature analytics over a pullback.

Behavioral parity with the reference analyzer (reference:
src/app/tools/analysis.py:21-250): px→unit ratio = H*150//1000; per frame ×
class with a mask: object-instance tracking by slice continuity, area =
sqrt(nonzero_px // ratio), thickness via the contour method (median/min of
contour-point distances to the contour centroid, scaled by ratio); masks
base64-PNG-embedded into a JSON-able dict. The alternative 360° ray-march
thickness (analysis.py:60-130, unused in the reference UI) is implemented
vectorized.

Improvement over the reference: inference mode is real, not a stub — a DICOM
is decoded, frames run through the hybrid ensemble (octseg.infer), and masks
are written to the work dir before analysis (reference TODO at
analysis.py:138,166).
"""

from __future__ import annotations

import base64
import logging
import os
import uuid
from glob import glob
from io import BytesIO
from typing import Any, Dict, List, Optional

import cv2
import numpy as np
from PIL import Image

from octseg.core.registry import CLASS_IDS, CLASS_IDS_REVERSED
from octseg.data.tiffio import read_tiff

log = logging.getLogger(__name__)


def calculate_thickness_contour(mask: np.ndarray) -> Dict[str, Any]:
    """Median/min/max distance from the largest contour to its centroid."""
    empty = {'median': 0, 'min': 0, 'max': 0, 'all_measurements': []}
    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return empty
    contour = max(contours, key=cv2.contourArea)
    m = cv2.moments(contour)
    if m['m00'] == 0:
        return empty
    cx = int(m['m10'] / m['m00'])
    cy = int(m['m01'] / m['m00'])
    pts = contour.reshape(-1, 2).astype(np.float64)
    distances = np.sqrt((pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2)
    return {
        'median': float(np.median(distances)),
        'min': float(np.min(distances)),
        'max': float(np.max(distances)),
        'all_measurements': distances.tolist(),
    }


def quantify_frame(channel: np.ndarray, ratio: int) -> Dict[str, float]:
    """One frame × one class quantification (the numeric core of
    :func:`get_analysis`, reference src/app/tools/analysis.py:199-213):
    area = sqrt(nonzero_px // ratio), thickness median/min of contour-point
    distances to the contour centroid, scaled by ratio. ``channel`` is a
    binary (H, W) uint8 mask."""
    thickness = calculate_thickness_contour(channel)
    return {
        'area': pow(int(np.count_nonzero(channel)) // ratio, 0.5),
        'thickness_mean': thickness['median'] / ratio,
        'thickness_min': thickness['min'] / ratio,
    }


def calculate_object_thickness(mask: np.ndarray) -> Dict[str, Any]:
    """360° ray-march from the image center: per-degree outermost contiguous
    object radius (vectorized re-expression of the reference's pixel walk)."""
    if mask.ndim > 2:
        mask = cv2.cvtColor(mask, cv2.COLOR_BGR2GRAY)
    height, width = mask.shape
    cx, cy = width // 2, height // 2
    max_radius = int(np.sqrt(width**2 + height**2)) // 2

    angles = np.deg2rad(np.arange(0, 360))[:, None]  # (360, 1)
    rs = np.arange(1, max_radius)[None, :]  # (1, R)
    xs = (cx + rs * np.cos(angles)).astype(np.int32)
    ys = (cy + rs * np.sin(angles)).astype(np.int32)
    inbounds = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)
    vals = np.where(
        inbounds, mask[np.clip(ys, 0, height - 1), np.clip(xs, 0, width - 1)], 0
    )
    on = vals == 255
    # reference semantics: walk outward, remember last object pixel, stop at
    # the first off-pixel after having been inside the object (or at border)
    radii: List[int] = []
    for row_on, row_in in zip(on, inbounds):
        current, found = 0, False
        for r_idx in range(row_on.shape[0]):
            if not row_in[r_idx]:
                break
            if row_on[r_idx]:
                current = r_idx + 1
                found = True
            elif found:
                break
        if found:
            radii.append(current)
    if not radii:
        return {'median': 0, 'min': 0, 'max': 0, 'all_measurements': []}
    return {
        'median': float(np.median(radii)),
        'min': float(np.min(radii)),
        'max': float(np.max(radii)),
        'all_measurements': radii,
    }


def _run_inference_into(work_dir: str, dcm_path: str, models_dir: str,
                        classes: List[str]) -> None:
    """Real inference mode: DICOM → frames → ensemble masks in work_dir."""
    from octseg.data import dicom
    from octseg.data.tiffio import write_tiff
    from octseg.infer.engine import InferenceEngine

    ds = dicom.dcmread(dcm_path)
    frames = ds.pixel_array
    # a grayscale DICOM stays single-channel end to end: norm (N, H, W, 1)
    # goes straight to the engine's mono path (no replicated 3-channel
    # allocation, no full-array gray re-detection scan); only the viewer
    # PNGs replicate, per frame, to keep their bytes identical to the
    # 3-channel path
    mono = frames.ndim == 3
    os.makedirs(os.path.join(work_dir, 'img'), exist_ok=True)
    os.makedirs(os.path.join(work_dir, 'mask'), exist_ok=True)
    h, w = frames.shape[1:3]
    norm = np.empty((*frames.shape[:3], 1 if mono else 3), np.uint8)
    for idx in range(frames.shape[0]):
        img = cv2.normalize(frames[idx], None, alpha=0, beta=255,
                            norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_8U)
        norm[idx] = img[..., None] if mono else img
        name = f'frame_{idx + 1:03d}'
        cv2.imwrite(os.path.join(work_dir, 'img', f'{name}.png'),
                    cv2.cvtColor(img, cv2.COLOR_GRAY2BGR) if mono
                    else cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    # streaming device-preprocess path (engine.iter_pullback): on-device
    # BGR swap/resize instead of a per-frame host cv2 loop, single-channel
    # upload for grayscale DICOMs, host memory bounded by one block of
    # masks however long the uploaded pullback is
    engine = InferenceEngine(models_dir=models_dir, classes=classes)
    for start, block in engine.iter_pullback(norm, output_size=[h, w]):
        for j in range(block.shape[0]):
            write_tiff(
                os.path.join(work_dir, 'mask',
                             f'frame_{start + j + 1:03d}.tiff'),
                (block[j] * 255).astype(np.uint8),
            )


def frame_contours(
    data: Dict[str, Any], img_num: int, classes: Optional[List[str]] = None
) -> Dict[str, Any]:
    """Per-object contour polygons + hover fields for one frame.

    The JSON payload behind the interactive viewer — the octseg equivalent of
    the reference's plotly filled scatter traces with hover tooltips
    (reference: src/app/tools/img_viewer.py:13-97: find_contours at 0.5,
    per-class fill, hover shows area / mean / min thickness). Rendering is
    client-side SVG; this returns geometry + the same hover fields.
    """
    from octseg.core.registry import CLASS_COLORS_RGB

    classes = classes or list(CLASS_IDS)
    mask_paths = sorted(glob(f"{data['work_dir']}/mask/*.tiff"))
    out: Dict[str, Any] = {'width': 0, 'height': 0, 'objects': []}
    if img_num < 0 or img_num >= len(mask_paths):
        return out
    mask = read_tiff(mask_paths[img_num])
    if mask.ndim == 2:
        mask = mask[:, :, None]
    out['height'], out['width'] = mask.shape[:2]
    for class_name in classes:
        class_id = CLASS_IDS.get(class_name)
        if class_id is None or class_id - 1 >= mask.shape[2]:
            continue
        channel = mask[:, :, class_id - 1]
        if not np.any(channel):
            continue
        # hover fields for this frame from the analysis traces
        obj = data['objects'][class_name]
        area = thickness_mean = thickness_min = 0.0
        if img_num in obj['slice']:
            pos = obj['slice'].index(img_num)
            area = obj['area'][pos]
            thickness_mean = obj['thickness_mean'][pos]
            thickness_min = obj['thickness_min'][pos]
        contours, _ = cv2.findContours(
            channel, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        polygons = []
        for contour in contours:
            approx = cv2.approxPolyDP(contour, 0.7, True).reshape(-1, 2)
            if approx.shape[0] >= 3:
                polygons.append(approx.tolist())
        if polygons:
            out['objects'].append({
                'class': class_name,
                'color': list(CLASS_COLORS_RGB[class_name]),
                'area': round(float(area), 2),
                'thickness_mean': round(float(thickness_mean), 2),
                'thickness_min': round(float(thickness_min), 2),
                'polygons': polygons,
            })
    return out


def get_analysis(
    file: Optional[str],
    inference_type: str = 'demo',
    demo_dir: str = 'data/app/demo',
    models_dir: str = 'models',
    classes: Optional[List[str]] = None,
    temp_root: str = 'data/app/temp',
) -> Dict[str, Any]:
    """Analyze a pullback; returns the JSON-able analytics dict (the reference
    `data` payload: ratio, per-class object traces, images list) plus the
    work dir under key 'work_dir'."""
    classes = classes or list(CLASS_IDS)
    if inference_type == 'demo':
        work_dir = demo_dir
        if file:
            from octseg.data import dicom

            slices_h = dicom.dcmread(file).pixel_array.shape[1]
        else:
            sample = sorted(glob(f'{work_dir}/mask/*.tiff'))
            slices_h = read_tiff(sample[0]).shape[0] if sample else 1000
    else:
        work_dir = os.path.join(temp_root, str(uuid.uuid4()))
        _run_inference_into(work_dir, file, models_dir, classes)
        from octseg.data import dicom

        slices_h = dicom.dcmread(file).pixel_array.shape[1]

    ratio = int(slices_h * 150 // 1000)
    objects: Dict[str, Dict[str, List[Any]]] = {
        class_name: {
            'area': [], 'thickness_mean': [], 'thickness_min': [], 'slice': [],
            'object_id': [], 'masks': [], 'img_name': [],
        }
        for class_name in CLASS_IDS
    }
    data: Dict[str, Any] = {'ratio': ratio, 'objects': objects, 'images': [],
                            'work_dir': work_dir}

    for idx, mask_path in enumerate(sorted(glob(f'{work_dir}/mask/*.tiff'))):
        mask = read_tiff(mask_path)
        if mask.ndim == 2:
            mask = mask[:, :, None]
        for class_id, class_name in CLASS_IDS_REVERSED.items():
            if class_id - 1 >= mask.shape[2]:
                continue
            channel = mask[:, :, class_id - 1]
            if np.unique(channel).shape[0] != 2:
                continue
            obj = objects[class_name]
            # instance tracking by slice continuity (ref analysis.py:190-197)
            if not obj['object_id']:
                obj['object_id'].append(0)
            elif idx == obj['slice'][-1] + 1:
                obj['object_id'].append(obj['object_id'][-1])
            else:
                obj['object_id'].append(obj['object_id'][-1] + 1)
            obj['slice'].append(idx)
            q = quantify_frame(channel, ratio)
            obj['area'].append(q['area'])
            obj['thickness_mean'].append(q['thickness_mean'])
            obj['thickness_min'].append(q['thickness_min'])
            buff = BytesIO()
            Image.fromarray(channel).save(buff, format='png')
            obj['masks'].append(base64.b64encode(buff.getvalue()).decode('utf-8'))
            obj['img_name'].append(os.path.basename(mask_path).split('.')[0])
        data['images'].append(os.path.basename(mask_path).split('.')[0])
    return data
