"""Hybrid ensemble prediction entry point (the product path).

Framework equivalent of the reference predictor (reference: src/predict.py:
104-149): load a directory of frames, run the hybrid per-feature ensemble
(LM / FC_LC / VV routing via MODELS_META), write overlay + color-mask PNGs.
The device path is whole-pullback batched with frame-axis sharding instead of
the reference's per-frame loop (§3.1 of SURVEY.md).

Beyond the reference: ``data_dir`` may also point at a DICOM pullback file —
it streams through ``engine.iter_pullback`` (device preprocessing, mono
upload for grayscale, bounded host memory) and writes the same per-frame
overlay/mask PNGs, so one command serves a whole pullback without a frame
extraction step.

Config: configs/predict.yaml (same keys as the reference predict.yaml).
Usage: python -m octseg.infer.predict [key=value ...]
"""

from __future__ import annotations

import logging
import os
import time

from octseg.core.config import Config, entry_point
from octseg.data.utils import data_processing, save_results
from octseg.infer.engine import InferenceEngine

log = logging.getLogger(__name__)


def _is_dicom(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    with open(path, 'rb') as f:
        head = f.read(132)
    return len(head) >= 132 and head[128:132] == b'DICM'


def load_pullback_frames(dcm_path: str):
    """DICOM pullback → (N, H, W, C) uint8 frames ready for the engine
    (C = 1 mono / 3 RGB). Non-uint8 data is per-slice min-max normalized —
    the same transform the data-prep chain applied to every training frame
    (octseg.data.convert_dicoms, reference src/data/convert_dicoms.py:73-80)
    — so model inputs match the trained distribution."""
    import numpy as np

    from octseg.data import dicom

    frames = dicom.dcmread(dcm_path).pixel_array
    if frames.dtype != np.uint8:
        from octseg.data.convert_dicoms import normalize_slice

        frames = np.stack([normalize_slice(f) for f in frames])
    if frames.ndim == 3:  # grayscale: engine mono path, (N, H, W, 1)
        frames = frames[..., None]
    return frames


def render_mask_block(frames, block_masks, start: int, out_size, classes,
                      save_dir: str, base: str, width: int) -> None:
    """Write the predict PNG contract (``{base}_{i}_overlay.png`` +
    ``_mask.png``) for one streamed block of masks — the ONE render recipe
    shared by the local DICOM path and the remote client
    (octseg.infer.client), so their outputs stay byte-identical."""
    from PIL import Image

    out_h, out_w = int(out_size[0]), int(out_size[1])
    images, names = [], []
    for j in range(block_masks.shape[0]):
        arr = frames[start + j]
        arr = arr[..., 0] if (arr.ndim == 3 and arr.shape[-1] == 1) else arr
        # same resize semantics as the image-dir path (data_processing)
        images.append(Image.fromarray(arr).convert('RGB')
                      .resize((out_w, out_h)))
        names.append(f'{base}_{start + j + 1:0{width}d}')
    save_results(images=images, masks=list(block_masks),
                 images_name=names, classes=list(classes),
                 save_dir=save_dir)


def _predict_dicom(cfg: Config, dcm_path: str, engine: InferenceEngine,
                   save_dir: str) -> int:
    """Stream a DICOM pullback through the engine block by block; write the
    reference-contract overlay/mask PNGs per frame. Returns frame count."""
    frames = load_pullback_frames(dcm_path)
    base = os.path.splitext(os.path.basename(dcm_path))[0]
    width = len(str(frames.shape[0]))
    for start, block_masks in engine.iter_pullback(frames, cfg.output_size):
        render_mask_block(frames, block_masks, start, cfg.output_size,
                          cfg.classes, save_dir, base, width)
    return int(frames.shape[0])


@entry_point('predict')
def main(cfg: Config) -> None:
    import octseg

    data_dir = os.path.join(octseg.PROJECT_DIR, cfg.data_dir) \
        if not os.path.isabs(cfg.data_dir) else cfg.data_dir
    models_dir = os.path.join(octseg.PROJECT_DIR, cfg.models_dir) \
        if not os.path.isabs(cfg.models_dir) else cfg.models_dir
    save_dir = os.path.join(octseg.PROJECT_DIR, cfg.save_dir) \
        if not os.path.isabs(cfg.save_dir) else cfg.save_dir

    start = time.time()
    engine = InferenceEngine(
        models_dir=models_dir, classes=list(cfg.classes),
        block_size=int(cfg.get('block_size', 128)),
        bf16=bool(cfg.get('bf16', False)), int8=bool(cfg.get('int8', False)),
        # 'nearest' reproduces the reference's binary-mask NEAREST resize
        # (src/predict.py:92-100); the default resizes probabilities
        output_resize=str(cfg.get('output_resize', 'prob_bilinear')),
    )

    if _is_dicom(data_dir):
        os.makedirs(save_dir, exist_ok=True)
        n = _predict_dicom(cfg, data_dir, engine, save_dir)
        log.info('Pullback frames: %d', n)
        log.info('Overall computation time: %.1f s', time.time() - start)
        log.info('Complete')
        return

    images, masks, images_name = data_processing(
        data_path=data_dir, save_dir=save_dir, output_size=cfg.output_size
    )
    log.info('Number of images: %d', len(images_name))

    start_inference = time.time()
    masks = engine.segment(images=images, masks=masks, output_size=cfg.output_size)
    log.info('Prediction time: %.1f s', time.time() - start_inference)

    save_results(
        images=images,
        masks=masks,
        images_name=images_name,
        classes=list(cfg.classes),
        save_dir=save_dir,
    )
    log.info('Overall computation time: %.1f s', time.time() - start)
    log.info('Complete')


if __name__ == '__main__':
    main()
