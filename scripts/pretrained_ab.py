"""Pretrained-encoder training start, proven end-to-end (VERDICT r3 #8).

The reference's published winning recipe assumes ImageNet-pretrained
encoders (reference src/models/smp/model.py:38-44 — smp downloads them when
encoder_weights='imagenet'). This environment has zero egress, so no
ImageNet weights exist; octseg ships the torch→Flax converter and the
`encoder_weights=<torch ckpt>` training hook (octseg/train/train.py:207-216)
with forward-parity unit tests, but round 3 committed no end-to-end
convert→fine-tune→evaluate demonstration.

This script closes that: it is the SAME mechanism the reference uses —
a torch checkpoint whose encoder carries useful features, converted
weight-for-weight into the Flax model at train start — with the torch
weights produced by actually training the name-faithful torch SMP mirror
(tests/torch_smp_mirror.py) on CPU, since that is the only way to obtain
non-random torch weights here.

Phases:
  pretrain  — train the torch mirror (Unet/resnet18, Lumen) on the
              demo-realdata fold's train split at 128px on CPU; save the
              full state_dict (encoder.* keys) to
              eval/demo_realdata/pretrain/torch_unet_r18.pt
  ab        — train octseg Unet/resnet18 @256 on the same fold twice for
              --epochs epochs (identical seed/config, one with
              encoder_weights=<the .pt>, one from scratch), evaluate both,
              write eval/demo_realdata/pretrain/ab.json with the per-epoch
              val-dice curves and final test dice.

Usage: python scripts/pretrained_ab.py pretrain [--epochs 6]
       python scripts/pretrained_ab.py ab [--epochs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FOLD = 'eval/demo_realdata/fold'
OUT = 'eval/demo_realdata/pretrain'
PT_PATH = os.path.join(OUT, 'torch_unet_r18.pt')


def _load_split(split: str, size: int):
    """(N,3,H,W) images normalized EXACTLY like the fine-tune path + masks.

    The fine-tune encoder sees BGR HWC [0,255] floats pushed through
    normalize_imagenet with input_scale=1 (octseg/train/train.py:51, the
    reference's 0..255 quirk). The torch pretrain must present the encoder
    with the same input statistics or the learned BN running stats are
    miscalibrated at transfer time — the round-4 first A/B fed raw [0,255]
    RGB and the "pretrained" start was WORSE than scratch for exactly this
    reason (eval/demo_realdata/pretrain/ab.json history).
    """
    from glob import glob

    import numpy as np
    from PIL import Image

    from octseg.data.tiffio import read_tiff
    from octseg.ops.normalize import IMAGENET_MEAN, IMAGENET_STD

    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    imgs, masks = [], []
    for p in sorted(glob(os.path.join(FOLD, split, 'img', '*.png'))):
        stem = os.path.splitext(os.path.basename(p))[0]
        img = Image.open(p).convert('RGB').resize((size, size))
        m = read_tiff(os.path.join(FOLD, split, 'mask', f'{stem}.tiff'))
        m = np.asarray(
            Image.fromarray(m[:, :, 0]).resize((size, size), Image.NEAREST))
        bgr = np.asarray(img, np.float32)[:, :, ::-1].transpose(2, 0, 1)
        imgs.append((bgr - mean) / std)
        masks.append((m > 0).astype(np.float32)[None])
    return np.stack(imgs), np.stack(masks)


def pretrain(epochs: int, size: int = 128) -> None:
    import numpy as np
    import torch

    from tests.torch_smp_mirror import SMPModel

    torch.manual_seed(0)
    model = SMPModel('Unet', 'resnet18', classes=1)
    imgs, masks = _load_split('train', size)
    print(f'torch pretrain: {len(imgs)} imgs @{size}px, {epochs} epochs',
          flush=True)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    model.train()
    rng = np.random.default_rng(0)
    batch = 8
    for epoch in range(epochs):
        order = rng.permutation(len(imgs))
        total, nb = 0.0, 0
        for i in range(0, len(order) - batch + 1, batch):
            idx = order[i:i + batch]
            x = torch.from_numpy(imgs[idx])
            y = torch.from_numpy(masks[idx])
            logits = model(x)
            # soft dice from logits (the reference's loss family)
            p = torch.sigmoid(logits)
            inter = (p * y).sum((2, 3))
            dice = (2 * inter + 1) / (p.sum((2, 3)) + y.sum((2, 3)) + 1)
            loss = 1 - dice.mean()
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += float(loss)
            nb += 1
        print(f'epoch {epoch + 1}: loss {total / nb:.4f}', flush=True)
    os.makedirs(OUT, exist_ok=True)
    model.eval()
    torch.save(model.state_dict(), PT_PATH)
    print(f'saved {PT_PATH}', flush=True)


def _val_dice_curve(model_dir: str):
    """Per-epoch test-split Dice for the Lumen row of metrics.csv."""
    import csv

    curve = []
    with open(os.path.join(model_dir, 'metrics.csv')) as f:
        for row in csv.DictReader(f):
            if row['Split'] == 'test' and row['Class'] == 'Lumen':
                curve.append(round(float(row['Dice']), 4))
    return curve


def ab(epochs: int) -> None:
    from octseg.core.compilecache import enable_compilation_cache
    from octseg.core.config import Config
    from octseg.train.evaluate import evaluate_model
    from octseg.train.train import train_model

    enable_compilation_cache()
    if not os.path.exists(PT_PATH):
        raise FileNotFoundError(f'{PT_PATH} missing — run the pretrain phase')
    results = {}
    for tag, enc_weights in (('pretrained', os.path.abspath(PT_PATH)),
                             ('scratch', None)):
        model_dir = os.path.join(OUT, tag)
        cfg = Config({
            'data_dir': FOLD, 'classes': ['Lumen'],
            'architecture': 'Unet', 'encoder': 'resnet18',
            'input_size': 256, 'batch_size': 8, 'optimizer': 'Adam',
            'lr': 1e-4, 'epochs': epochs, 'use_augmentation': True,
            'bf16': True, 'seed': 11, 'native_loader': False,
            'encoder_weights': enc_weights,
            'model_name': f'pretrain_ab_{tag}', 'save_dir': OUT,
        })
        print(f'=== {tag} ({epochs} epochs) ===', flush=True)
        train_model(cfg, model_dir=model_dir)
        results[tag] = {
            'val_dice_curve': _val_dice_curve(model_dir),
            'test': {c: round(v['dice'], 4) for c, v in evaluate_model(
                model_dir, FOLD, split='test').items()},
        }
        print(json.dumps(results[tag]), flush=True)
    summary = _summarize(results, epochs)
    with open(os.path.join(OUT, 'ab.json'), 'w') as f:
        json.dump(summary, f, indent=2)
    print('AB DONE:', json.dumps(summary), flush=True)


def _summarize(results: dict, epochs: int) -> dict:
    p, s = results['pretrained'], results['scratch']
    return {
        'protocol': (f'Unet/resnet18 @256 Lumen on {FOLD}, {epochs} epochs, '
                     f'identical config/seed; pretrained initializes the '
                     f'encoder from {PT_PATH} (torch mirror trained on the '
                     f'same fold at 128px with the fine-tune pipeline\'s '
                     f'exact input normalization — BGR, 0..255 ImageNet '
                     f'quirk) via '
                     f'octseg.models.convert_torch.load_pretrained_encoder'),
        **results,
        'epoch1_dice_advantage': round(
            p['val_dice_curve'][0] - s['val_dice_curve'][0], 4),
        'final_test_dice_advantage': round(
            p['test']['Mean'] - s['test']['Mean'], 4),
        'pretrained_beats_scratch': (
            p['val_dice_curve'][0] > s['val_dice_curve'][0]
            and p['test']['Mean'] > s['test']['Mean']),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('phase', choices=['pretrain', 'ab'])
    parser.add_argument('--epochs', type=int, default=None)
    args = parser.parse_args()
    if args.phase == 'pretrain':
        pretrain(args.epochs or 6)
    else:
        ab(args.epochs or 4)


if __name__ == '__main__':
    main()
