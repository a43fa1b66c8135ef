"""Batch CAM driver: per image × class heatmaps, overlays, and CAM-vs-GT scores.

Framework equivalent of the reference driver (reference:
src/models/visualize_activation_maps.py:75-207): load one model bundle, for
each image × selected class predict the mask, extract the activation map,
overlay it, binarize at map_threshold and score against the ground-truth mask
with micro dice/IoU/precision/recall; save per-pair PNGs (source, ground
truth, prediction, CAM heatmap, CAM overlay) and a metrics CSV. Driven over
all 9 methods by octseg/explain/visualize_activation_maps.sh.

Config: configs/visualize_activation_maps.yaml.
Usage: python -m octseg.explain.visualize_activation_maps [key=value ...]
"""

from __future__ import annotations

import csv
import logging
import os
from glob import glob
from pathlib import Path

import cv2
import numpy as np

from octseg.core.config import Config, entry_point
from octseg.core.registry import CLASS_IDS
from octseg.data.tiffio import read_tiff
from octseg.explain.cam import CAMProcessor
from octseg.infer.engine import load_model_bundle

log = logging.getLogger(__name__)


def micro_scores(pred: np.ndarray, gt: np.ndarray) -> dict:
    pred = pred.astype(bool).ravel()
    gt = gt.astype(bool).ravel()
    tp = float(np.sum(pred & gt))
    fp = float(np.sum(pred & ~gt))
    fn = float(np.sum(~pred & gt))
    eps = 1e-7
    return {
        'dice': 2 * tp / max(2 * tp + fp + fn, eps),
        'iou': tp / max(tp + fp + fn, eps),
        'precision': tp / max(tp + fp, eps),
        'recall': tp / max(tp + fn, eps),
    }


@entry_point('visualize_activation_maps')
def main(cfg: Config) -> None:
    import jax
    import jax.numpy as jnp

    model, variables, model_cfg = load_model_bundle(cfg.model_dir)
    classes = list(cfg.get('classes') or model_cfg['classes'])
    input_size = model_cfg['input_size']
    method = cfg.get('cam_method', 'GradCAM')
    threshold = float(cfg.get('map_threshold', 0.5))
    save_dir = os.path.join(cfg.save_dir, method)
    os.makedirs(save_dir, exist_ok=True)

    level = cfg.get('feature_level')
    processor = CAMProcessor(
        model, variables, method=method,
        feature_level=int(level) if level is not None else None,
    )
    forward = jax.jit(lambda v, x: model.apply(v, x, train=False))
    # octseg-trained manifests declare normalize=true (training applies
    # ImageNet mean/std, train.py); converted reference checkpoints lack the
    # key and expect raw BGR floats (the predict() quirk) — match the
    # inference engine's handling (octseg/infer/engine.py)
    normalize = bool(model_cfg.get('normalize', False))

    rows = []
    img_paths = sorted(glob(os.path.join(cfg.data_dir, 'img', '*.[pj][np]g')))
    for img_path in img_paths:
        stem = Path(img_path).stem
        img_bgr = cv2.resize(cv2.imread(img_path), (input_size, input_size))
        gt = read_tiff(os.path.join(cfg.data_dir, 'mask', f'{stem}.tiff'))
        gt = cv2.resize(gt, (input_size, input_size), interpolation=cv2.INTER_NEAREST)
        if gt.ndim == 2:
            gt = gt[:, :, None]
        x = img_bgr.astype(np.float32)
        if normalize:
            from octseg.ops.normalize import normalize_imagenet

            x = np.asarray(normalize_imagenet(jnp.asarray(x)))
        logits = np.asarray(forward(variables, x[None]))[0]
        pred = (1 / (1 + np.exp(-logits)) > 0.5).astype(np.float32)

        for ch, class_name in enumerate(model_cfg['classes']):
            if class_name not in classes:
                continue
            # GT channel: registry contract is channel = class_id - 1, but a
            # mask may hold only the model's own channels
            cid = CLASS_IDS[class_name] - 1
            if gt.shape[2] <= cid:
                if gt.shape[2] == len(model_cfg['classes']):
                    cid = ch
                else:
                    raise ValueError(
                        f'{stem}: GT mask has {gt.shape[2]} channels — cannot '
                        f'locate class {class_name!r} (id {cid + 1})')
            gt_mask = (gt[:, :, cid] > 0).astype(np.float32)
            pred_mask = pred[:, :, ch]
            cam = processor.extract_activation_map(x, category=ch, mask=pred_mask)
            overlay = processor.overlay_activation_map(
                cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB), cam
            )
            cam_bin = (cam >= threshold).astype(np.float32)
            scores = micro_scores(cam_bin, gt_mask)
            rows.append({'image': stem, 'class': class_name, 'method': method,
                         **{k: round(v, 4) for k, v in scores.items()}})

            tag = f'{stem}_{class_name.replace(" ", "_")}'
            cv2.imwrite(f'{save_dir}/{tag}_source.png', img_bgr)
            cv2.imwrite(f'{save_dir}/{tag}_gt.png', (gt_mask * 255).astype(np.uint8))
            cv2.imwrite(f'{save_dir}/{tag}_pred.png', (pred_mask * 255).astype(np.uint8))
            cv2.imwrite(f'{save_dir}/{tag}_map.png', (cam * 255).astype(np.uint8))
            cv2.imwrite(
                f'{save_dir}/{tag}_overlay.png', cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR)
            )
        log.info('Processed %s', stem)

    if rows:
        with open(os.path.join(save_dir, 'metrics.csv'), 'w', newline='') as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    log.info('Complete')


if __name__ == '__main__':
    main()
