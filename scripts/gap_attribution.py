"""Attribute the evaluate-path vs product-path Dice gap, factor by factor.

Round-4 finding (VERDICT r4, "what's weak" #1): on the real-imagery
behavioral-parity experiment the same checkpoints score FC 0.674 / LC 0.632
via ``octseg.train.evaluate`` but only FC 0.475 / LC 0.436 via the full
product path (``InferenceEngine.segment`` at native 750², micro-Diced against
the reference ensemble's committed masks). The two paths differ in FOUR
separable ways; this harness measures each in isolation on the 36 held-out
demo frames:

  stage0  Label resize round-trip ceiling (model-free): native 750² mask →
          NEAREST upsize to the model's input size (the training-label
          transform, octseg/train/data.py:86 == reference dataset.py:108-127)
          → downsize back to 750² (the product output transform, reference
          src/predict.py:92-100). A model that reproduces its training labels
          PERFECTLY cannot beat this on the product path with the NEAREST
          output contract; the bilinear-probability variant shows what the
          octseg default output mode recovers.

  ladder  Per model (same forward probabilities reused for every rung):
          A  per-present-sample dice at model resolution — the evaluate-path
             number (OCTDataset keeps only frames where the class is present,
             octseg/train/data.py:62-73; scores average per frame then over
             frames).
          B  micro-dice at model resolution over the SAME present frames —
             isolates micro vs per-sample aggregation.
          C  micro-dice at model resolution over ALL 36 held-out frames —
             adds false positives on class-absent frames (18/36 frames lack
             FC/LC, 27/36 lack VV).
          D  micro-dice at native 750² after NEAREST downsize of the binary
             prediction — adds the reference output-resize contract; this is
             the product-path score up to engine implementation details.
          D' micro-dice at native 750² after BILINEAR downsize of the sigmoid
             probabilities (threshold after) — the octseg default
             (InferenceEngine output_resize='prob_bilinear').
          E  the actual product path: InferenceEngine.segment, both output
             modes, bf16 and fp32 — pins preprocessing/bf16 residuals.

Writes eval/demo_realdata/gap_attribution.json. Stage 0 runs anywhere
(pass --stage0-only on a CPU rig); the ladder needs the trained checkpoints
from scripts/train_demo_realdata.py and a chip.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
from glob import glob

import cv2
import numpy as np

REFERENCE_DIR = os.environ.get('OCTSEG_REFERENCE_DIR', '/root/reference')
# class -> (model dir, model output channel, tiff channel = class_id-1)
ROUTES = {
    'Lumen': ('LM', 0, 0, 512),
    'Fibrous cap': ('FC_LC', 1, 1, 896),
    'Lipid core': ('FC_LC', 0, 2, 896),
    'Vasa vasorum': ('VV', 0, 3, 896),
}
BLOCK, TEST_PHASE = 6, 2  # must match scripts/train_demo_realdata.py


def held_out_stems() -> list:
    masks = sorted(glob(os.path.join(REFERENCE_DIR, 'data/app/demo/mask/*.tiff')))
    return [os.path.splitext(os.path.basename(p))[0]
            for i, p in enumerate(masks) if (i // BLOCK) % 5 == TEST_PHASE]


def load_native_masks(stems):
    from octseg.data.tiffio import read_tiff

    return np.stack([
        read_tiff(os.path.join(REFERENCE_DIR, 'data/app/demo/mask', f'{s}.tiff'))
        for s in stems
    ]) > 0  # (N, 750, 750, 4) bool


def dice_micro(pred, gt) -> float:
    inter = float(np.logical_and(pred, gt).sum())
    total = float(pred.sum() + gt.sum())
    return 2.0 * inter / max(total, 1.0)


def dice_per_sample(pred, gt) -> float:
    """Mean over frames of per-frame dice (evaluate-path aggregation,
    octseg/train/metrics.py: dice = 2*iou/(iou+1), zero_division=eps)."""
    vals = []
    for p, g in zip(pred, gt):
        tp = float(np.logical_and(p, g).sum())
        denom = tp + float(np.logical_xor(p, g).sum())  # tp+fp+fn
        iou = tp / denom if denom else 1e-7
        vals.append(2 * iou / (iou + 1))
    return float(np.mean(vals))


def stage0(native, stems) -> dict:
    """Model-free resize round-trip ceilings per class."""
    out = {}
    for cl, (_m, _ch, tch, size) in ROUTES.items():
        gt = native[:, :, :, tch]  # (N, 750, 750)
        present = gt.any((1, 2))
        up = np.stack([
            cv2.resize(g.astype(np.uint8), (size, size),
                       interpolation=cv2.INTER_NEAREST) for g in gt])
        down_nn = np.stack([
            cv2.resize(u, (750, 750), interpolation=cv2.INTER_NEAREST)
            for u in up]).astype(bool)
        down_bl = np.stack([
            cv2.resize(u.astype(np.float32), (750, 750),
                       interpolation=cv2.INTER_LINEAR) for u in up]) > 0.5
        out[cl] = {
            'input_size': size,
            'present_frames': int(present.sum()),
            'frames': int(len(stems)),
            'roundtrip_nearest_micro': round(dice_micro(down_nn, gt), 4),
            'roundtrip_nearest_per_sample': round(
                dice_per_sample(down_nn[present], gt[present]), 4),
            'roundtrip_prob_bilinear_micro': round(dice_micro(down_bl, gt), 4),
            'roundtrip_prob_bilinear_per_sample': round(
                dice_per_sample(down_bl[present], gt[present]), 4),
        }
    return out


def model_probs(model_dir: str, stems, batch: int = 4):
    """Evaluate-path forward over ALL held-out frames (no presence filter):
    returns (N, S, S, C) float32 sigmoid probabilities at model resolution."""
    import jax
    import jax.numpy as jnp

    from octseg.infer.engine import load_model_bundle
    from octseg.ops.normalize import normalize_imagenet

    model, variables, model_cfg = load_model_bundle(model_dir)
    size = model_cfg['input_size']
    normalize = bool(model_cfg.get('normalize', True))

    def _forward(variables, x):
        if normalize:
            x = normalize_imagenet(x)
        return jax.nn.sigmoid(model.apply(variables, x, train=False))

    forward = jax.jit(_forward)
    variables = jax.device_put(variables)
    img_dir = os.path.join(REFERENCE_DIR, 'data/app/demo/img')
    imgs = np.stack([
        cv2.resize(cv2.imread(os.path.join(img_dir, f'{s}.png')), (size, size))
        for s in stems
    ]).astype(np.float32)  # BGR, INTER_LINEAR — octseg/train/data.py:81-82
    outs = []
    for i in range(0, len(imgs), batch):
        chunk = imgs[i:i + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), np.float32)])
        outs.append(np.asarray(forward(variables, jnp.asarray(chunk)))[:batch - pad])
    return np.concatenate(outs), model_cfg


def ladder(models_root: str, native, stems) -> dict:
    out = {}
    probs_cache = {}
    for cl, (mdir, ch, tch, _size) in ROUTES.items():
        if mdir not in probs_cache:
            probs_cache[mdir] = model_probs(os.path.join(models_root, mdir), stems)
        probs_all, model_cfg = probs_cache[mdir]
        size = model_cfg['input_size']
        probs = probs_all[:, :, :, ch]
        gt750 = native[:, :, :, tch]
        present = gt750.any((1, 2))
        gt_up = np.stack([
            cv2.resize(g.astype(np.uint8), (size, size),
                       interpolation=cv2.INTER_NEAREST) for g in gt750
        ]).astype(bool)
        pred = probs > 0.5
        down_nn = np.stack([
            cv2.resize(p.astype(np.uint8), (750, 750),
                       interpolation=cv2.INTER_NEAREST) for p in pred
        ]).astype(bool)
        down_bl = np.stack([
            cv2.resize(p, (750, 750), interpolation=cv2.INTER_LINEAR)
            for p in probs
        ]) > 0.5
        out[cl] = {
            'A_eval_per_sample_present_modelres': round(
                dice_per_sample(pred[present], gt_up[present]), 4),
            'B_micro_present_modelres': round(
                dice_micro(pred[present], gt_up[present]), 4),
            'C_micro_all_modelres': round(dice_micro(pred, gt_up), 4),
            'D_micro_all_750_nearest': round(dice_micro(down_nn, gt750), 4),
            'Dp_micro_all_750_prob_bilinear': round(
                dice_micro(down_bl, gt750), 4),
            'D_per_sample_present_750_nearest': round(
                dice_per_sample(down_nn[present], gt750[present]), 4),
            'Dp_per_sample_present_750_prob_bilinear': round(
                dice_per_sample(down_bl[present], gt750[present]), 4),
        }
    return out


def product_path(models_root: str, native, stems) -> dict:
    """Rung E: the real engine, both output modes, bf16 and fp32."""
    from octseg.core.registry import CLASS_IDS
    from octseg.data.utils import data_processing
    from octseg.infer.engine import InferenceEngine

    classes = list(ROUTES)
    img_dir = os.path.join(REFERENCE_DIR, 'data/app/demo/img')
    import tempfile

    results = {}
    for mode in ('nearest', 'prob_bilinear'):
        for bf16 in (True, False):
            with tempfile.TemporaryDirectory() as td:
                images, masks, names = data_processing(
                    data_path=img_dir, save_dir=td, output_size=(750, 750))
            keep = [i for i, n in enumerate(names) if n in set(stems)]
            images = [images[i] for i in keep]
            masks = [masks[i] for i in keep]
            names = [names[i] for i in keep]
            engine = InferenceEngine(models_dir=models_root, classes=classes,
                                     bf16=bf16, output_resize=mode)
            masks = engine.segment(images=images, masks=masks,
                                   output_size=(750, 750))
            pred = np.stack(masks) > 0.5  # (N, 750, 750, 4)
            order = {n: i for i, n in enumerate(stems)}
            gt = native[[order[n] for n in names]]
            per_class = {
                cl: round(dice_micro(pred[:, :, :, CLASS_IDS[cl] - 1],
                                     gt[:, :, :, CLASS_IDS[cl] - 1]), 4)
                for cl in classes
            }
            per_class['mean'] = round(float(np.mean(list(per_class.values()))), 4)
            results[f"{mode}_{'bf16' if bf16 else 'fp32'}"] = per_class
    return results


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--models', default='eval/demo_realdata')
    parser.add_argument('--out', default='eval/demo_realdata/gap_attribution.json')
    parser.add_argument('--stage0-only', action='store_true')
    args = parser.parse_args()

    stems = held_out_stems()
    native = load_native_masks(stems)
    report = {'held_out_frames': len(stems), 'stage0_label_roundtrip': stage0(native, stems)}
    if not args.stage0_only:
        report['ladder'] = ladder(args.models, native, stems)
        report['product_path'] = product_path(args.models, native, stems)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    main()
