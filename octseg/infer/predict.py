"""Hybrid ensemble prediction entry point (the product path).

Framework equivalent of the reference predictor (reference: src/predict.py:
104-149): load a directory of frames, run the hybrid per-feature ensemble
(LM / FC_LC / VV routing via MODELS_META), write overlay + color-mask PNGs.
The device path is whole-pullback batched with frame-axis sharding instead of
the reference's per-frame loop (§3.1 of SURVEY.md).

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
    images, masks, images_name = data_processing(
        data_path=data_dir, save_dir=save_dir, output_size=cfg.output_size
    )
    log.info('Number of images: %d', len(images_name))

    start_inference = time.time()
    engine = InferenceEngine(
        models_dir=models_dir, classes=list(cfg.classes),
        bf16=bool(cfg.get('bf16', False)), int8=bool(cfg.get('int8', False)),
    )
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
