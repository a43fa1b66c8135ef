"""Side-by-side stacker: pair RGB + grayscale series → hstacked PNGs or mp4.

Framework equivalent of the reference stacker (reference:
src/data/stack_images.py:22-144); these stacked videos are what annotators
received in Supervisely. h264 re-encode uses ffmpeg when present, else the
native intra-only encoder (octseg/native/h264enc.cc).

Config: configs/stack_images.yaml. Usage:
python -m octseg.data.stack_images [key=value ...]
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from glob import glob
from pathlib import Path
from typing import List

import cv2
import numpy as np

from octseg.core.config import Config, entry_point
from octseg.data.convert_dicoms import reencode_h264, resize_keep_aspect
from octseg.data.utils import get_dir_list, get_file_list

log = logging.getLogger(__name__)


def process_single_series(
    series_dirs: List[str],
    img_height: int,
    img_width: int,
    output_type: str,
    fps: int,
    save_dir: str,
) -> None:
    series_name = Path(series_dirs[0]).parts[-1]
    study_name = Path(series_dirs[0]).parts[-2]
    if output_type == 'video':
        save_dir_video = os.path.join(save_dir, study_name)
        os.makedirs(save_dir_video, exist_ok=True)
        video_path_temp = os.path.join(
            save_dir_video, f'{study_name}_{series_name}_temp.mp4'
        )
        video = cv2.VideoWriter(
            video_path_temp, cv2.VideoWriter_fourcc(*'mp4v'), fps,
            (len(series_dirs) * img_width, img_height),
        )
    elif output_type == 'image':
        save_dir_img = os.path.join(save_dir, study_name, series_name)
        os.makedirs(save_dir_img, exist_ok=True)
    else:
        raise ValueError(f'Unknown output_type value: {output_type}')

    img_lists = [get_file_list(src_dirs=d, ext_list='.png') for d in series_dirs]

    for idx, img_paths in enumerate(zip(*img_lists)):
        panels = []
        for img_path in img_paths:
            img = cv2.imread(img_path)
            if img.shape[0] != img_height or img.shape[1] != img_width:
                img = resize_keep_aspect(img, height=img_height)
            panels.append(img)
        img_out = np.hstack(panels)
        if output_type == 'image':
            name = f'{study_name}_{series_name}_{idx + 1:03d}.png'
            cv2.imwrite(os.path.join(save_dir_img, name), img_out)
        else:
            video.write(img_out)

    if output_type == 'video':
        video.release()
        video_path = os.path.join(save_dir_video, f'{study_name}_{series_name}.mp4')
        if reencode_h264(video_path_temp, video_path):
            os.remove(video_path_temp)
        else:
            os.replace(video_path_temp, video_path)
        log.info('Series %s/%s saved to %s', study_name, series_name, video_path)
    else:
        log.info('Series %s/%s saved to %s', study_name, series_name, save_dir_img)


def _all_series(data_dir: str, include, exclude) -> List[str]:
    studies = get_dir_list(data_dir, include, exclude)
    return sum((sorted(glob(s + '*/')) for s in studies), [])


@entry_point('stack_images')
def main(cfg: Config) -> None:
    series_rgb = _all_series(cfg.data_dir_1, cfg.get('include_dirs'), cfg.get('exclude_dirs'))
    series_gray = _all_series(cfg.data_dir_2, cfg.get('include_dirs'), cfg.get('exclude_dirs'))
    assert len(series_rgb) == len(series_gray), 'Mismatch number of series'
    pairs = list(zip(series_rgb, series_gray))
    with ThreadPoolExecutor(max(os.cpu_count() or 2, 2)) as pool:
        list(
            pool.map(
                lambda p: process_single_series(
                    series_dirs=list(p),
                    img_height=cfg.output_size[0],
                    img_width=cfg.output_size[1],
                    output_type=cfg.output_type,
                    fps=int(cfg.fps),
                    save_dir=cfg.save_dir,
                ),
                pairs,
            )
        )
    log.info('Complete')


if __name__ == '__main__':
    main()
