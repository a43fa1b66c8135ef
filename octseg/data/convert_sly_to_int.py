"""Supervisely video project → interim dataset (frames + metadata.csv).

Framework equivalent of the reference converter (reference:
src/data/convert_sly_to_int.py:24-286) without the supervisely SDK: the
project layout (<project>/<dataset>/{ann,video}/) and annotation JSON schema
(frames/figures/objects, polygon exterior points, bitmap origin+base64) are
parsed directly. Per-figure outputs match the reference metadata.csv schema:
img_path, img_name, study, series, slice, img sizes, geometry type, class
id/name, bbox, center, box sizes, contour area, encoded (cropped) mask.

Video frames are ripped to cropped PNGs; when a series has an image directory
instead of an mp4 (or cv2 lacks the codec), frames are read from there.

Config: configs/convert_sly_to_int.yaml. Usage:
python -m octseg.data.convert_sly_to_int [key=value ...]
"""

from __future__ import annotations

import json
import logging
import os
import re
from concurrent.futures import ThreadPoolExecutor
from glob import glob
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
import pandas as pd

from octseg.core.config import Config, entry_point
from octseg.core.registry import CLASS_IDS
from octseg.data.utils import convert_base64_to_numpy, convert_numpy_to_base64

log = logging.getLogger(__name__)

META_COLUMNS = [
    'img_path', 'img_name', 'study', 'series', 'slice', 'img_width',
    'img_height', 'type', 'class_id', 'class_name', 'x1', 'y1', 'x2', 'y2',
    'xc', 'yc', 'box_width', 'box_height', 'area', 'encoded_mask',
]


def polygon_to_mask(polygon: List[List[int]]) -> Tuple[int, int, np.ndarray]:
    """Rasterize polygon exterior into a tight local mask; returns origin.

    Deliberate reference parity (convert_sly_to_int.py:24-43): the mask is
    sized (y_max-y_min, x_max-x_min) WITHOUT +1, so fillPoly's pixels on the
    polygon's max row/column are clipped. The published dataset/folds were
    built with this rasterization — changing it would shift every polygon
    label's right/bottom edge relative to the reference's trained models."""
    xs = [v[0] for v in polygon]
    ys = [v[1] for v in polygon]
    x_min, x_max = min(xs), max(xs)
    y_min, y_max = min(ys), max(ys)
    pts = np.array(polygon, dtype=np.int32) - (x_min, y_min)
    mask = np.zeros((y_max - y_min, x_max - x_min), dtype=np.uint8)
    if mask.size:  # degenerate (axis-aligned line) polygons crash fillPoly
        cv2.fillPoly(mask, pts=[pts], color=1)
    return x_min, y_min, mask


def figure_to_mask_properties(
    figure: dict,
    frame_size: Tuple[int, int],
    crop: List[List[int]],
) -> Optional[Tuple[str, int, List[List[int]]]]:
    """Full-frame paste + crop → (encoded mask, contour area, bbox) or None."""
    geom = figure['geometryType']
    if geom == 'polygon':
        x_min, y_min, obj = polygon_to_mask(figure['geometry']['points']['exterior'])
    elif geom == 'bitmap':
        x_min, y_min = figure['geometry']['bitmap']['origin']
        obj = convert_base64_to_numpy(figure['geometry']['bitmap']['data']).astype(np.uint8)
    else:
        return None
    mask = np.zeros(frame_size, dtype=np.uint8)
    mask[y_min:y_min + obj.shape[0], x_min:x_min + obj.shape[1]] = obj
    mask = mask[crop[0][1]:crop[1][1], crop[0][0]:crop[1][0]]

    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    contour = max(contours, key=cv2.contourArea)
    pts = contour.reshape(-1, 2)  # (x, y)
    bbox = [[int(pts[:, 0].min()), int(pts[:, 1].min())],
            [int(pts[:, 0].max()), int(pts[:, 1].max())]]
    encoded = convert_numpy_to_base64(mask.astype(bool))
    return encoded, int(cv2.contourArea(contour)), bbox


def get_series_id(filename: str) -> int:
    match = re.search(r'_(\d+)\.mp4', filename)
    if not match:
        raise ValueError('No match found')
    return int(match.group(1))


def _dataset_videos(dataset_dir: str) -> List[str]:
    """Video item names of a dataset, derived from its annotation files
    (ann/<video_name>.json — present whether or not the mp4 itself is)."""
    return sorted(
        os.path.basename(p)[: -len('.json')]
        for p in glob(os.path.join(dataset_dir, 'ann', '*.mp4.json'))
    )


def process_single_annotation(
    dataset_dir: str,
    img_dir: str,
    class_ids: Dict[str, int],
    crop: List[List[int]],
) -> pd.DataFrame:
    study = os.path.basename(dataset_dir.rstrip('/'))
    rows: List[dict] = []
    for video_name in _dataset_videos(dataset_dir):
        series = get_series_id(video_name)
        with open(os.path.join(dataset_dir, 'ann', f'{video_name}.json')) as f:
            ann = json.load(f)
        objects = {o['key']: o for o in ann.get('objects', [])}
        frames = {fr['index']: fr for fr in ann.get('frames', [])}
        for idx in range(ann['framesCount']):
            slice_str = f'{idx + 1:03d}'
            img_name = f'{study}_{series}_{slice_str}.png'
            base = {
                'img_path': os.path.join(img_dir, img_name),
                'img_name': img_name,
                'study': study,
                'series': series,
                'slice': slice_str,
                'img_width': crop[1][0] - crop[0][0],
                'img_height': crop[1][1] - crop[0][1],
                'type': None, 'class_id': None, 'class_name': None,
                'x1': None, 'y1': None, 'x2': None, 'y2': None,
                'xc': None, 'yc': None, 'box_width': None, 'box_height': None,
                'area': None, 'encoded_mask': None,
            }
            frame = frames.get(idx)
            if not frame or not frame.get('figures'):
                rows.append(base)
                continue
            n_before = len(rows)
            for figure in frame['figures']:
                props = figure_to_mask_properties(
                    figure,
                    (ann['size']['height'], ann['size']['width']),
                    crop,
                )
                if props is None:
                    # unsupported geometry / fully outside the crop: skip
                    # THIS figure only. (The reference `break`s here,
                    # convert_sly_to_int.py:173-174, silently dropping every
                    # remaining annotated object of the frame — documented
                    # strictly-better deviation.)
                    continue
                encoded, area, bbox = props
                class_name = objects[figure['objectKey']]['classTitle']
                row = dict(base)
                row.update(
                    type=figure['geometryType'],
                    class_id=class_ids[class_name],
                    class_name=class_name,
                    x1=bbox[0][0], y1=bbox[0][1], x2=bbox[1][0], y2=bbox[1][1],
                    xc=int(np.mean([bbox[0][0], bbox[1][0]])),
                    yc=int(np.mean([bbox[0][1], bbox[1][1]])),
                    box_width=bbox[1][0] - bbox[0][0] + 1,
                    box_height=bbox[1][1] - bbox[0][1] + 1,
                    area=area,
                    encoded_mask=encoded,
                )
                rows.append(row)
            if len(rows) == n_before:  # every figure skipped: keep the
                rows.append(base)      # one-empty-row-per-frame contract
    return pd.DataFrame(rows, columns=META_COLUMNS)


def process_single_video(
    dataset_dir: str,
    img_dir: str,
    crop: List[List[int]],
) -> None:
    study = os.path.basename(dataset_dir.rstrip('/'))
    for video_name in _dataset_videos(dataset_dir):
        series = get_series_id(video_name)
        video_path = os.path.join(dataset_dir, 'video', video_name)
        frames_dir = os.path.join(dataset_dir, 'frames', video_name)

        def save(img: np.ndarray, idx: int) -> None:
            img = img[crop[0][1]:crop[1][1], crop[0][0]:crop[1][0], :]
            cv2.imwrite(os.path.join(img_dir, f'{study}_{series}_{idx:03d}.png'), img)

        vid = cv2.VideoCapture(video_path)
        idx = 1
        while vid.isOpened():
            ok, img = vid.read()
            if not ok:
                break
            save(img, idx)
            idx += 1
        vid.release()
        if idx == 1 and os.path.isdir(frames_dir):  # codec-free fallback
            for i, p in enumerate(sorted(glob(os.path.join(frames_dir, '*.png'))), 1):
                save(cv2.imread(p), i)


@entry_point('convert_sly_to_int')
def main(cfg: Config) -> None:
    import octseg

    data_dir = cfg.data_dir if os.path.isabs(cfg.data_dir) else os.path.join(
        octseg.PROJECT_DIR, cfg.data_dir
    )
    save_dir = cfg.save_dir if os.path.isabs(cfg.save_dir) else os.path.join(
        octseg.PROJECT_DIR, cfg.save_dir
    )
    img_dir = os.path.join(save_dir, 'img')
    os.makedirs(img_dir, exist_ok=True)
    crop = [list(c) for c in cfg.crop]

    # dataset dirs = subdirectories holding ann/ (+ video/ or frames/)
    datasets = sorted(
        d for d in glob(os.path.join(data_dir, '*/'))
        if os.path.isdir(os.path.join(d, 'ann'))
    )
    with ThreadPoolExecutor(max(os.cpu_count() or 2, 2)) as pool:
        list(pool.map(lambda d: process_single_video(d, img_dir, crop), datasets))
        dfs = list(
            pool.map(
                lambda d: process_single_annotation(d, img_dir, CLASS_IDS, crop), datasets
            )
        )
    df = pd.concat(dfs) if dfs else pd.DataFrame(columns=META_COLUMNS)
    df.sort_values(['img_path', 'class_id'], inplace=True)
    df['img_path'] = df['img_path'].apply(
        lambda x: os.path.relpath(x, octseg.PROJECT_DIR)
    )
    df.reset_index(drop=True, inplace=True)
    df.index += 1
    df.to_csv(os.path.join(save_dir, 'metadata.csv'), index_label='id')
    log.info('Complete')


if __name__ == '__main__':
    main()
