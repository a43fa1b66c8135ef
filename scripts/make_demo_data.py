"""Generate a self-contained demo environment (no external data needed).

Creates, under --root (default 'data'):
  app/demo/source/IMG001   synthetic OCT-like pullback DICOM
  app/demo/img/*.png       extracted frames
  app/demo/mask/*.tiff     ensemble masks from randomly-initialized models
  demo/input/*.png         3 frames for the predict entry point
  ../models/{LM,FC_LC,VV}  random-weight model dirs (reference layout)

With these in place the web app demo mode, the predict entry point and the
analysis engine all run out of the box (replace the random weights with real
checkpoints after training).

Usage: python scripts/make_demo_data.py [--root data] [--frames 24] [--size 512]
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: repo-root import without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import cv2
import numpy as np


def synth_pullback(n_frames: int, size: int, seed: int = 11) -> np.ndarray:
    """OCT-ish frames: speckle + a bright vessel-wall annulus around a dark
    lumen whose radius drifts along the pullback."""
    rng = np.random.default_rng(seed)
    frames = np.zeros((n_frames, size, size, 3), np.uint8)
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    cy = cx = size / 2
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    for i in range(n_frames):
        lumen_r = size * (0.12 + 0.05 * np.sin(i / 6.0))
        wall = np.exp(-((r - lumen_r * 1.6) ** 2) / (2 * (size * 0.05) ** 2))
        speckle = rng.gamma(2.0, 0.5, (size, size)).clip(0, 4) / 4
        intensity = (wall * 160 + speckle * 60 * (r > lumen_r)) \
            * (1 - np.exp(-(r / (size * 0.45)) ** 2) * 0.2)
        img = np.clip(intensity, 0, 255).astype(np.uint8)
        frames[i] = np.stack([img, (img * 0.8).astype(np.uint8),
                              (img * 0.6).astype(np.uint8)], axis=-1)
    return frames


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--root', default='data')
    parser.add_argument('--models-dir', default='models')
    parser.add_argument('--frames', type=int, default=24)
    parser.add_argument('--size', type=int, default=512)
    parser.add_argument('--input-size', type=int, default=256)
    args = parser.parse_args()

    from octseg.data import dicom
    from octseg.data.tiffio import write_tiff
    from octseg.infer.engine import InferenceEngine
    from octseg.train.checkpoint import initialize_model_dir

    frames = synth_pullback(args.frames, args.size)
    demo = os.path.join(args.root, 'app', 'demo')
    os.makedirs(os.path.join(demo, 'source'), exist_ok=True)
    dicom.dcmwrite(os.path.join(demo, 'source', 'IMG001'), frames)

    for name, classes, arch, enc in (
        ('LM', ['Lumen'], 'Unet', 'resnet18'),
        ('FC_LC', ['Lipid core', 'Fibrous cap'], 'Unet', 'resnet18'),
        ('VV', ['Vasa vasorum'], 'Unet', 'resnet18'),
    ):
        d = os.path.join(args.models_dir, name)
        if not os.path.exists(os.path.join(d, 'weights.ckpt')):
            initialize_model_dir(d, classes, arch=arch, encoder=enc,
                                 input_size=args.input_size)

    os.makedirs(os.path.join(demo, 'img'), exist_ok=True)
    os.makedirs(os.path.join(demo, 'mask'), exist_ok=True)
    engine = InferenceEngine(args.models_dir, classes=[
        'Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum',
    ], block_size=8)
    masks = engine.segment_pullback(frames, output_size=[args.size, args.size])
    for i in range(args.frames):
        stem = f'001_1_{i + 1:03d}'
        cv2.imwrite(os.path.join(demo, 'img', f'{stem}.png'),
                    cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR))
        write_tiff(os.path.join(demo, 'mask', f'{stem}.tiff'),
                   (masks[i] * 255).astype(np.uint8))

    pred_in = os.path.join(args.root, 'demo', 'input')
    os.makedirs(pred_in, exist_ok=True)
    for i in range(3):
        cv2.imwrite(os.path.join(pred_in, f'001_1_{i + 1:03d}.png'),
                    cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR))
    print(f'demo data ready under {args.root}/ and {args.models_dir}/')


if __name__ == '__main__':
    main()
