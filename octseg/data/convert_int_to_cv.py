"""Interim dataset → 5-fold cross-validation dataset materializer.

Framework equivalent of the reference fold builder (reference:
src/data/convert_int_to_cv.py:24-323): class filtering, study-level KFold
(n=5, shuffle, seed=11), per-image multi-channel {0,255} masks from encoded
object masks with optional smoothing/artifact removal, colorized masks,
elliptical crop ([[125,0],[875,750]] by default), LZW mask TIFFs (octseg's
own codec), and the merged per-fold metadata.csv.

Config: configs/convert_int_to_cv.yaml. Usage:
python -m octseg.data.convert_int_to_cv [key=value ...]
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Tuple, Union

import cv2
import numpy as np
import pandas as pd
from sklearn.model_selection import KFold

from octseg.core.config import Config, entry_point
from octseg.core.registry import CLASS_COLORS_RGB, CLASS_IDS
from octseg.data.mask_processor import MaskProcessor
from octseg.data.tiffio import write_tiff
from octseg.data.utils import convert_base64_to_numpy

log = logging.getLogger(__name__)


def create_data_directories(num_folds: int, save_dir: str, save_color_mask: bool = True
                            ) -> None:
    dir_types = ['img', 'mask', 'mask_color'] if save_color_mask else ['img', 'mask']
    for fold_idx in range(1, num_folds + 1):
        for subset in ('train', 'test'):
            for dir_type in dir_types:
                (Path(save_dir) / f'fold_{fold_idx}' / subset / dir_type).mkdir(
                    parents=True, exist_ok=True
                )


def process_metadata(df: pd.DataFrame, classes: Optional[List[str]] = None) -> pd.DataFrame:
    if classes is not None:
        df = df[df['class_name'].isin(classes)]
    df = df.dropna(subset=['class_name'])
    if df.empty:
        raise ValueError('class/exclude filters left no rows in the metadata')
    return df


def cross_validation_split(
    df: pd.DataFrame, split_column: str, num_folds: int, seed: int
) -> List[Tuple[pd.DataFrame, pd.DataFrame]]:
    """Study-level KFold: every frame of a study lands in the same split."""
    ids = df[split_column].unique()
    kf = KFold(n_splits=num_folds, shuffle=True, random_state=seed)
    splits = []
    for train_idx, test_idx in kf.split(ids):
        splits.append(
            (
                df[df[split_column].isin(ids[train_idx])],
                df[df[split_column].isin(ids[test_idx])],
            )
        )
    return splits


def update_metadata(df_train: pd.DataFrame, df_test: pd.DataFrame, fold_idx: int
                    ) -> pd.DataFrame:
    df_train = df_train.copy()
    df_test = df_test.copy()
    df_train['split'] = 'train'
    df_test['split'] = 'test'
    df_train['fold'] = fold_idx
    df_test['fold'] = fold_idx
    df = pd.concat([df_train, df_test], ignore_index=True)
    df.drop(columns=['id', 'encoded_mask', 'type'], inplace=True, errors='ignore')
    df.sort_values(['img_name', 'class_id'], inplace=True)
    df.reset_index(drop=True, inplace=True)
    df.index += 1
    return df


def colorize_mask(
    mask: np.ndarray,
    classes: List[str],
    background: Tuple[int, int, int] = (128, 128, 128),
) -> np.ndarray:
    mask_color = np.zeros((mask.shape[0], mask.shape[1], 3), dtype=np.uint8)
    mask_color[:] = background
    for class_name in classes:
        channel_id = CLASS_IDS[class_name] - 1
        mask_color[mask[:, :, channel_id] == 255] = CLASS_COLORS_RGB[class_name]
    return mask_color


def apply_circle_crop(
    img: np.ndarray,
    crop: List[List[int]],
    background: Union[Tuple[int, ...], int] = 0,
) -> np.ndarray:
    """Elliptical crop: zero (or fill) everything outside the ellipse
    inscribed in the crop rect, then crop to the rect."""
    (x1, y1), (x2, y2) = crop
    center = ((x1 + x2) // 2, (y1 + y2) // 2)
    radii = (abs(x2 - x1) // 2, abs(y2 - y1) // 2)
    ellipse = np.zeros(img.shape[:2], dtype=np.uint8)
    cv2.ellipse(ellipse, center, radii, 0, 0, 360, 255, -1)
    inside = ellipse > 0
    if isinstance(background, int):
        background = (background,) * img.shape[2]
    out = np.empty_like(img)
    for ch in range(img.shape[2]):
        out[:, :, ch] = np.where(inside, img[:, :, ch], background[ch])
    return out[y1:y2, x1:x2]


def process_pair(
    df: pd.DataFrame,
    save_dir: str,
    crop: Optional[List[List[int]]],
    classes: List[str],
    smooth_mask: bool = True,
    save_color_mask: bool = True,
) -> None:
    if len(df) == 0:
        return
    img_path = df.iloc[0].img_path
    img = cv2.imread(img_path)
    h, w = img.shape[:2]
    # channels are indexed by GLOBAL class id (channel = class_id - 1, the
    # registry contract consumed by OCTDataset), so the mask needs max-id
    # channels. The reference allocates len(classes) and indexes globally
    # (convert_int_to_cv.py:188-199) — identical for the default all-4
    # config, an IndexError for any subset whose ids exceed its length.
    n_ch = max(CLASS_IDS[c] for c in classes)
    mask = np.zeros((h, w, n_ch), dtype=np.uint8)
    processor = MaskProcessor() if smooth_mask else None

    for obj in df.itertuples(index=False):
        obj_mask = convert_base64_to_numpy(obj.encoded_mask).astype(np.uint8)
        if smooth_mask:
            obj_mask = processor.smooth_mask(obj_mask)
            obj_mask = processor.remove_artifacts(obj_mask)
        channel_id = CLASS_IDS[obj.class_name] - 1
        mask[:, :, channel_id][obj_mask == 1] = 255

    mask_color = colorize_mask(mask, classes)
    if crop is not None:
        img = apply_circle_crop(img, crop, background=0)
        mask = apply_circle_crop(mask, crop, background=0)
        mask_color = apply_circle_crop(mask_color, crop, background=128)

    basename = Path(img_path).stem
    cv2.imwrite(os.path.join(save_dir, 'img', f'{basename}.png'), img)
    write_tiff(os.path.join(save_dir, 'mask', f'{basename}.tiff'), mask, compression='lzw')
    if save_color_mask:
        write_tiff(
            os.path.join(save_dir, 'mask_color', f'{basename}.tiff'),
            mask_color, compression='lzw',
        )


@entry_point('convert_int_to_cv')
def main(cfg: Config) -> None:
    import octseg

    data_dir = cfg.data_dir if os.path.isabs(cfg.data_dir) else os.path.join(
        octseg.PROJECT_DIR, cfg.data_dir
    )
    save_dir = cfg.save_dir if os.path.isabs(cfg.save_dir) else os.path.join(
        octseg.PROJECT_DIR, cfg.save_dir
    )
    classes = list(cfg.classes)
    crop = [list(c) for c in cfg.crop] if cfg.get('crop') is not None else None

    create_data_directories(cfg.num_folds, save_dir, cfg.get('save_color_mask', True))
    df = pd.read_csv(os.path.join(data_dir, 'metadata.csv'))
    # resolve relative img paths against the repo root (sly converter contract)
    df['img_path'] = df['img_path'].apply(
        lambda p: p if os.path.isabs(p) else os.path.join(octseg.PROJECT_DIR, p)
    )
    df_filtered = process_metadata(df, classes)
    splits = cross_validation_split(
        df_filtered, cfg.get('split_column', 'study'), cfg.num_folds, cfg.get('seed', 11)
    )

    dfs = []
    for fold_idx, (df_train, df_test) in enumerate(splits, start=1):
        dfs.append(update_metadata(df_train, df_test, fold_idx))
        log.info(
            'Fold %d - train studies/images: %d/%d, test: %d/%d',
            fold_idx,
            df_train['study'].nunique(), df_train['img_path'].nunique(),
            df_test['study'].nunique(), df_test['img_path'].nunique(),
        )
        with ThreadPoolExecutor(max(os.cpu_count() or 2, 2)) as pool:
            for subset, part in (('train', df_train), ('test', df_test)):
                groups = [g for _, g in part.groupby('img_path')]
                list(
                    pool.map(
                        lambda g, s=subset: process_pair(
                            df=g,
                            smooth_mask=cfg.get('smooth_mask', True),
                            save_color_mask=cfg.get('save_color_mask', True),
                            crop=crop,
                            classes=classes,
                            save_dir=f'{save_dir}/fold_{fold_idx}/{s}',
                        ),
                        groups,
                    )
                )

    merged = pd.concat(dfs).reset_index(drop=True)
    merged.index += 1
    merged.to_csv(os.path.join(save_dir, 'metadata.csv'), index_label='id')
    log.info('Complete')


if __name__ == '__main__':
    main()
