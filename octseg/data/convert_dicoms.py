"""DICOM → per-slice PNGs or annotation videos.

Framework equivalent of the reference converter (reference:
src/data/convert_dicoms.py:27-143): per slice min-max normalize to uint8,
BGR→RGB swap, optional grayscale equalization, aspect-preserving resize to
output height, PNG per slice or mp4 per series. H.264 re-encode uses the
ffmpeg binary when present, else the native intra-only encoder
(octseg/native/h264enc.cc). Studies fan out over a thread pool.

Config: configs/convert_dicoms.yaml. Usage:
python -m octseg.data.convert_dicoms [key=value ...]
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import Tuple

import cv2
import numpy as np

from octseg.core.config import Config, entry_point
from octseg.data import dicom
from octseg.data.utils import (
    convert_to_grayscale,
    get_dir_list,
    get_file_list,
    get_series_name,
    get_study_name,
)

log = logging.getLogger(__name__)


def resize_keep_aspect(img: np.ndarray, height: int) -> np.ndarray:
    """Aspect-preserving resize to a target height (imutils.resize parity:
    the width is truncated, int(w * height/h), not rounded)."""
    h, w = img.shape[:2]
    if h == height:
        return img
    width = int(w * (height / float(h)))
    return cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)


def normalize_slice(img: np.ndarray) -> np.ndarray:
    """Per-slice min-max normalize to uint8 (cv2.normalize NORM_MINMAX parity)."""
    return cv2.normalize(img, None, alpha=0, beta=255, norm_type=cv2.NORM_MINMAX,
                         dtype=cv2.CV_8U)


def reencode_h264(src: str, dst: str, bitrate: str = '10M') -> bool:
    """Re-encode to H.264 (reference src/data/convert_dicoms.py:100-105).

    Prefers an ffmpeg binary (inter-frame libx264 — smallest files); without
    one falls back to the native intra-only encoder
    (octseg/native/h264enc.cc via octseg.data.h264) so the outputs are real
    H.264/avc1 streams in any environment."""
    ffmpeg = shutil.which('ffmpeg')
    if ffmpeg is not None:
        subprocess.run(
            [ffmpeg, '-y', '-i', src, '-c:v', 'libx264', '-b:v', bitrate, dst],
            check=True, capture_output=True,
        )
        return True
    from octseg.data import h264

    return h264.reencode_mp4(src, dst)


def convert_single_study(
    data_dir: str,
    output_type: str,
    output_size: Tuple[int, int],
    to_gray: bool,
    fps: int,
    save_dir: str,
) -> None:
    for dcm_path in get_file_list(src_dirs=data_dir, ext_list='', filename_template='IMG'):
        ds = dicom.dcmread(dcm_path)
        frames = ds.pixel_array
        if frames.ndim == 3:
            frames = frames[..., None].repeat(3, axis=-1)
        study_name = get_study_name(dcm_path)
        series_name = get_series_name(dcm_path)

        if output_type == 'video':
            save_dir_video = os.path.join(save_dir, study_name)
            os.makedirs(save_dir_video, exist_ok=True)
            video_path_temp = os.path.join(
                save_dir_video, f'{study_name}_{series_name}_temp.mp4'
            )
            # opened lazily with the FIRST frame's real size: the aspect-
            # preserving resize targets height only, and cv2.VideoWriter
            # silently drops every frame whose size differs from the one the
            # writer was opened with (the reference opens it with output_size
            # unconditionally, convert_dicoms.py:61-67 — a 0-frame mp4 for
            # any non-square source)
            video = None
        elif output_type == 'image':
            save_dir_img = os.path.join(save_dir, study_name, series_name)
            os.makedirs(save_dir_img, exist_ok=True)
        else:
            raise ValueError(f'Unknown output_type value: {output_type}')

        for idx in range(frames.shape[0]):
            img = normalize_slice(frames[idx])
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if to_gray:
                img = convert_to_grayscale(img, min_limit=40, max_limit=220)
            if img.shape[:2] != tuple(output_size):
                img = resize_keep_aspect(img, height=output_size[0])
            if output_type == 'image':
                name = f'{study_name}_{series_name}_{idx + 1:03d}.png'
                cv2.imwrite(os.path.join(save_dir_img, name), img)
            else:
                if video is None:
                    video = cv2.VideoWriter(
                        video_path_temp, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                        (img.shape[1], img.shape[0]),
                    )
                video.write(img)

        if output_type == 'video' and video is not None:
            video.release()
            video_path = os.path.join(save_dir_video, f'{study_name}_{series_name}.mp4')
            if reencode_h264(video_path_temp, video_path):
                os.remove(video_path_temp)
            else:
                os.replace(video_path_temp, video_path)
            log.info('DICOM %s converted and saved to %s', dcm_path, video_path)
        else:
            log.info('DICOM %s converted and saved to %s', dcm_path, save_dir_img)


@entry_point('convert_dicoms')
def main(cfg: Config) -> None:
    import octseg

    data_dir = cfg.data_dir if os.path.isabs(cfg.data_dir) else os.path.join(
        octseg.PROJECT_DIR, cfg.data_dir
    )
    save_dir = cfg.save_dir if os.path.isabs(cfg.save_dir) else os.path.join(
        octseg.PROJECT_DIR, cfg.save_dir
    )
    study_list = get_dir_list(
        data_dir, list(cfg.get('include_dirs') or []), list(cfg.get('exclude_dirs') or [])
    )
    with ThreadPoolExecutor(max(os.cpu_count() or 2, 2)) as pool:
        list(
            pool.map(
                lambda study_dir: convert_single_study(
                    data_dir=study_dir,
                    output_type=cfg.output_type,
                    output_size=tuple(cfg.output_size),
                    to_gray=bool(cfg.to_gray),
                    fps=int(cfg.fps),
                    save_dir=save_dir,
                ),
                study_list,
            )
        )
    log.info('Complete')


if __name__ == '__main__':
    main()
