"""Train the winning configs on the reference's REAL demo pullback.

The 103-patient dataset itself is unreachable (DVC pointers to a Google
Drive remote, zero egress), but the reference repo commits one full REAL
OCT pullback: 186 frames of real imagery (`data/app/demo/img/*.png`,
750x750 — exactly the post-elliptical-crop geometry of its CV training
data) together with the masks its actual trained ensemble predicted for
them (`data/app/demo/mask/*.tiff`, (750,750,4) uint8 {0,255}; reference
app demo path, src/app/app.py:85-101).

That makes a real-imagery behavioral-parity experiment possible without
the dataset: train the reference's three winning configurations from
scratch on real OCT frames with the reference ensemble's own predictions
as labels, and score how well the framework reproduces the deployed
reference behavior on held-out frames. This exercises the full
train->checkpoint->evaluate->hybrid-ensemble-predict contract on REAL
data (the synthetic proofs in eval/synth_fullscale cover exact-GT
convergence; this covers real image statistics).

Honest scope notes (also in eval/demo_realdata/README.md):
- labels are reference-model predictions, not cardiologist annotations,
  so this measures behavioral parity with the deployed reference, not
  clinical DSC;
- all 186 frames come from ONE pullback, so the held-out split
  (interleaved frame blocks) shares the study with training — unlike the
  reference's study-level 5-fold CV. Adjacent-slice correlation is
  mitigated (block split, not random frames) but not eliminated;
- encoders start from scratch (no ImageNet downloads in this
  environment), so learning rates follow eval/synth's documented
  adjustments rather than the published pretrained-encoder recipe.

Usage: python scripts/train_demo_realdata.py [--epochs 60]
           [--out eval/demo_realdata] [--models LM FC_LC VV] [--score-only]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import shutil
import time
from glob import glob

REFERENCE_DIR = os.environ.get('OCTSEG_REFERENCE_DIR', '/root/reference')

# (model dir, classes, arch, encoder, optimizer, lr, input_size, batch, remat)
# Architectures/encoders/input sizes are the reference's winning configs
# (reference eval/training/{class}/fold_1/config.json); optimizer/lr carry
# the from-scratch adjustments documented in eval/synth/README.md (the
# published RMSprop 1e-5 assumes ImageNet-pretrained encoders).
WINNING_CONFIGS = [
    ('LM', ['Lumen'], 'UnetPlusPlus', 'resnet101', 'RMSprop', 1e-4,
     512, 16, False),
    ('FC_LC', ['Lipid core', 'Fibrous cap'], 'LinkNet', 'efficientnet-b7',
     'Adam', 1e-3, 896, 4, True),
    ('VV', ['Vasa vasorum'], 'Unet', 'timm-regnetx_064', 'RAdam', 1e-3,
     896, 4, True),
]

# Pretrained-start stage (the reference always starts from ImageNet encoders,
# src/models/smp/model.py:38-44; no download path exists here, so the donor
# is self-made): train the SAME architecture on the SAME train split at half
# resolution (4x fewer pixels per step), then warm-start the full-resolution
# run from it via cfg.init_weights. Half-res batch keeps per-step pixel
# count at/below the full-res config's proven memory envelope (896 b2 fits
# un-rematerialized => 448 b8 does; 512 b16 => 256 b64).
# (model dir -> (pretrain input_size, pretrain batch))
PRETRAIN_STAGE = {
    'LM': (256, 64),
    'FC_LC': (448, 8),
    'VV': (448, 8),
}

BLOCK = 6          # frames per split block
TEST_PHASE = 2     # block index % 5 == TEST_PHASE -> test (~20%, interior)


def materialize_demo_fold(fold_dir: str) -> dict:
    """Copy the reference demo pullback into the CV fold layout
    ({train,test}/{img,mask}) with an interleaved-block frame split."""
    import numpy as np

    from octseg.data.tiffio import read_tiff

    img_dir = os.path.join(REFERENCE_DIR, 'data/app/demo/img')
    mask_dir = os.path.join(REFERENCE_DIR, 'data/app/demo/mask')
    masks = sorted(glob(os.path.join(mask_dir, '*.tiff')))
    if not masks:
        raise FileNotFoundError(f'no demo masks under {mask_dir}')

    presence = {'train': np.zeros(4, int), 'test': np.zeros(4, int)}
    counts = {'train': 0, 'test': 0}
    for split in ('train', 'test'):
        os.makedirs(os.path.join(fold_dir, split, 'img'), exist_ok=True)
        os.makedirs(os.path.join(fold_dir, split, 'mask'), exist_ok=True)
    for i, mask_path in enumerate(masks):
        stem = os.path.splitext(os.path.basename(mask_path))[0]
        img_path = os.path.join(img_dir, f'{stem}.png')
        split = 'test' if (i // BLOCK) % 5 == TEST_PHASE else 'train'
        shutil.copy(img_path, os.path.join(fold_dir, split, 'img'))
        shutil.copy(mask_path, os.path.join(fold_dir, split, 'mask'))
        presence[split] += (read_tiff(mask_path) > 0).any((0, 1))
        counts[split] += 1
    stats = {
        split: {
            'frames': counts[split],
            'frames_with_class': dict(zip(
                ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum'],
                presence[split].tolist())),
        }
        for split in ('train', 'test')
    }
    print('fold stats:', json.dumps(stats), flush=True)
    return stats


def score_ensemble(models_dir: str, fold_dir: str, save_dir: str) -> dict:
    """Run the PRODUCT path (hybrid ensemble, data_processing->engine.segment
    ->save_results) on held-out frames and micro-Dice each class against the
    reference ensemble's committed masks."""
    import numpy as np

    from octseg.core.registry import CLASS_IDS
    from octseg.data.tiffio import read_tiff
    from octseg.data.utils import data_processing, save_results
    from octseg.infer.engine import InferenceEngine

    classes = ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum']
    test_img = os.path.join(fold_dir, 'test', 'img')
    out_size = (750, 750)  # native demo-frame geometry: compare pixel-for-pixel
    images, masks, names = data_processing(
        data_path=test_img, save_dir=save_dir, output_size=out_size)
    engine = InferenceEngine(models_dir=models_dir, classes=classes, bf16=True)
    t0 = time.time()
    masks = engine.segment(images=images, masks=masks, output_size=out_size)
    elapsed = time.time() - t0
    save_results(images=images, masks=masks, images_name=names,
                 classes=classes, save_dir=save_dir)

    inter = np.zeros(4)
    total = np.zeros(4)
    for name, pred in zip(names, masks):
        ref = read_tiff(os.path.join(
            REFERENCE_DIR, 'data/app/demo/mask', f'{name}.tiff')) > 0
        p = pred > 0.5
        inter += 2.0 * np.logical_and(p, ref).sum((0, 1))
        total += p.sum((0, 1)) + ref.sum((0, 1))
    dice = {
        cl: round(float(inter[CLASS_IDS[cl] - 1]
                        / max(total[CLASS_IDS[cl] - 1], 1)), 4)
        for cl in classes
    }
    return {'frames': len(names), 'seconds': round(elapsed, 1),
            'ensemble_dice_vs_reference': dice,
            'mean_dice': round(float(np.mean(list(dice.values()))), 4)}


def _epochs_done(model_dir: str) -> int:
    path = os.path.join(model_dir, 'metrics.csv')
    if not (os.path.exists(path)
            and os.path.exists(os.path.join(model_dir, 'weights.ckpt'))):
        return 0
    last = 0
    with open(path) as f:
        next(f, None)
        for line in f:
            last = max(last, int(line.split(',', 1)[0]))
    return last


def _reset_stale_logs(model_dir: str) -> None:
    """A fresh run (no resumable state) must not append to a previous run's
    metrics.csv/scalars.jsonl — epoch numbering would interleave."""
    if os.path.exists(os.path.join(model_dir, 'resume.ckpt')):
        return
    for name in ('metrics.csv', 'scalars.jsonl'):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            os.remove(path)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--epochs', type=int, default=60)
    parser.add_argument('--pretrain-epochs', type=int, default=40,
                        help='half-resolution warm-start stage; 0 = from scratch')
    parser.add_argument('--out', default='eval/demo_realdata')
    parser.add_argument('--models', nargs='*', default=None)
    parser.add_argument('--score-only', action='store_true',
                        help='skip training; run the ensemble scoring pass')
    args = parser.parse_args()

    from octseg.core.compilecache import enable_compilation_cache
    from octseg.core.config import Config
    from octseg.train.evaluate import evaluate_model
    from octseg.train.train import train_model

    # This driver calls train_model programmatically (no CLI decorator), so
    # opt into the persistent XLA cache explicitly: the 896px remat compiles
    # cost minutes and this experiment is restart-prone on a shared chip.
    enable_compilation_cache()

    fold = os.path.join(args.out, 'fold')
    summary_path = os.path.join(args.out, 'summary.json')
    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            summary = json.load(f)
    if not os.path.isdir(os.path.join(fold, 'train')):
        summary['fold'] = materialize_demo_fold(fold)

    if not args.score_only:
        for (name, classes, arch, encoder, optimizer, lr, input_size,
             batch, remat) in WINNING_CONFIGS:
            if args.models and name not in args.models:
                continue
            model_dir = os.path.join(args.out, name)

            init_weights = None
            pretrain_info = None
            if args.pretrain_epochs > 0:
                pre_size, pre_batch = PRETRAIN_STAGE[name]
                pre_dir = os.path.join(args.out, 'pretrain', name)
                pre_cfg = Config({
                    'data_dir': fold,
                    'classes': classes,
                    'architecture': arch,
                    'encoder': encoder,
                    'input_size': pre_size,
                    'batch_size': pre_batch,
                    'optimizer': optimizer,
                    'lr': lr,
                    'epochs': args.pretrain_epochs,
                    'use_augmentation': True,
                    'bf16': True,
                    'remat': False,
                    'native_loader': False,
                    'resume_interval': 10,
                    'resume': True,
                    'seed': 11,
                    'model_name': name,
                    'save_dir': os.path.join(args.out, 'pretrain'),
                })
                t0 = time.time()
                if _epochs_done(pre_dir) >= args.pretrain_epochs:
                    print(f'{name}: pretrain already at '
                          f'{args.pretrain_epochs} epochs', flush=True)
                    pre_elapsed = summary.get(name, {}).get(
                        'pretrain', {}).get('seconds', 0.0)
                else:
                    print(f'=== {name}: pretrain {arch}/{encoder} '
                          f'@{pre_size} b{pre_batch} ===', flush=True)
                    _reset_stale_logs(pre_dir)
                    train_model(pre_cfg, model_dir=pre_dir)
                    pre_elapsed = time.time() - t0
                init_weights = os.path.join(pre_dir, 'weights.ckpt')
                pretrain_info = {
                    'input_size': pre_size, 'batch_size': pre_batch,
                    'epochs': args.pretrain_epochs,
                    'seconds': round(pre_elapsed, 1),
                }

            cfg = Config({
                'data_dir': fold,
                'classes': classes,
                'architecture': arch,
                'encoder': encoder,
                'input_size': input_size,
                'batch_size': batch,
                'optimizer': optimizer,
                'lr': lr,
                'epochs': args.epochs,
                'use_augmentation': True,
                'bf16': True,
                'remat': remat,
                'native_loader': False,
                'resume_interval': 10,
                'resume': True,
                'seed': 11,
                'model_name': name,
                'save_dir': args.out,
                'init_weights': init_weights,
            })
            t0 = time.time()
            print(f'=== {name}: {arch}/{encoder} @{input_size} ===', flush=True)
            skipped = _epochs_done(model_dir) >= args.epochs
            if skipped:
                print(f'{name}: already at {args.epochs} epochs', flush=True)
            else:
                _reset_stale_logs(model_dir)
                train_model(cfg, model_dir=model_dir)
            elapsed = time.time() - t0
            if skipped:
                elapsed = summary.get(name, {}).get('train_seconds', elapsed)
            scores = {}
            for split in ('train', 'test'):
                r = evaluate_model(model_dir, fold, split=split)
                scores[split] = r
                with open(os.path.join(model_dir, f'eval_{split}.json'),
                          'w') as f:
                    json.dump(r, f, indent=2)
            summary[name] = {
                'architecture': arch, 'encoder': encoder,
                'input_size': input_size,
                'train_dice': {c: round(scores['train'][c]['dice'], 4)
                               for c in classes},
                'test_dice': {c: round(scores['test'][c]['dice'], 4)
                              for c in classes},
                'train_seconds': round(elapsed, 1),
            }
            if pretrain_info is not None:
                summary[name]['pretrain'] = pretrain_info
            print(json.dumps(summary[name]), flush=True)
            with open(summary_path, 'w') as f:
                json.dump(summary, f, indent=2)

    if all(os.path.exists(os.path.join(args.out, n, 'weights.ckpt'))
           for n, *_ in WINNING_CONFIGS):
        summary['ensemble'] = score_ensemble(
            args.out, fold, os.path.join(args.out, 'predict_test'))
        print('ensemble:', json.dumps(summary['ensemble']), flush=True)
    with open(summary_path, 'w') as f:
        json.dump(summary, f, indent=2)
    print('ALL DONE:', json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()
