"""Multilabel segmentation metrics + the reference metrics.csv contract.

Device part: per-sample-per-class tp/fp/fn/tn stats and derived scores with
the exact semantics of smp.metrics as invoked by the reference
(reference: src/models/smp/utils.py:13-36) — reduction=None, zero_division=eps,
and the reference's dice quirk: dice = 2*iou/(iou+1).

Host part: epoch aggregation + append-only CSV with the fixed schema
(Epoch,Loss,IoU,Dice,Precision,Recall,F1,Split,Class) that the vis layer
consumes (reference: src/models/smp/utils.py:39-166).
"""

from __future__ import annotations

import os
from csv import DictWriter
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

EPS = 1e-7


def multilabel_stats(pred: jnp.ndarray, target: jnp.ndarray):
    """tp/fp/fn/tn per (sample, class) for binary {0,1} NHWC masks."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    tp = jnp.sum(pred * target, axis=(1, 2))
    fp = jnp.sum(pred * (1 - target), axis=(1, 2))
    fn = jnp.sum((1 - pred) * target, axis=(1, 2))
    tn = jnp.sum((1 - pred) * (1 - target), axis=(1, 2))
    return tp, fp, fn, tn


def _safe_div(num, den, zero_division=EPS):
    return jnp.where(den == 0, zero_division, num / jnp.where(den == 0, 1.0, den))


def compute_metrics(pred: jnp.ndarray, target: jnp.ndarray, loss: jnp.ndarray
                    ) -> Dict[str, jnp.ndarray]:
    """Batch metrics dict matching the reference get_metrics keys/shapes:
    each entry (N, C) except loss (scalar)."""
    tp, fp, fn, tn = multilabel_stats(pred, target)
    iou = _safe_div(tp, tp + fp + fn)
    dice = 2 * iou / (iou + 1)  # reference quirk (utils.py:25)
    f1 = _safe_div(2 * tp, 2 * tp + fp + fn)
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    return {
        'loss': loss,
        'iou': iou,
        'dice': dice,
        'recall': recall,
        'precision': precision,
        'f1': f1,
    }


def aggregate_epoch(metrics_epoch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Aggregate per-batch metric dicts the way the reference does
    (running pairwise mean over batches after a per-batch sample mean,
    utils.py:52-73). For equal batch sizes this equals the plain mean; we keep
    a plain mean over batches of per-batch sample means, which is the same
    contract the CSV consumers assume."""
    out: Dict[str, np.ndarray] = {}
    for name in metrics_epoch[0].keys():
        per_batch = []
        for batch in metrics_epoch:
            v = np.asarray(batch[name])
            per_batch.append(v if v.size == 1 else v.mean(axis=0))
        out[name] = np.mean(np.stack([np.squeeze(b) for b in per_batch]), axis=0) \
            if per_batch[0].size == 1 else np.mean(np.stack(per_batch, axis=0), axis=0)
    return out


CSV_FIELDS = ['Epoch', 'Loss', 'IoU', 'Dice', 'Precision', 'Recall', 'F1', 'Split', 'Class']


def save_metrics_on_epoch(
    metrics_epoch: List[Dict[str, np.ndarray]],
    split: str,
    model_dir: str,
    classes: List[str],
    epoch: int,
    best_metrics: Optional[dict] = None,
    logger=None,
) -> Optional[dict]:
    """Append per-class + Mean rows to {model_dir}/metrics.csv (exact reference
    schema) and track best metrics. Returns the updated best_metrics."""
    metrics = aggregate_epoch(metrics_epoch)
    csv_path = os.path.join(model_dir, 'metrics.csv')
    write_header = not os.path.exists(csv_path)
    os.makedirs(model_dir, exist_ok=True)

    metrics_log = {
        f'{split}/loss': float(np.asarray(metrics['loss'])),
        f'{split}/iou': float(np.asarray(metrics['iou']).mean()),
        f'{split}/dice': float(np.asarray(metrics['dice']).mean()),
        f'{split}/precision': float(np.asarray(metrics['precision']).mean()),
        f'{split}/recall': float(np.asarray(metrics['recall']).mean()),
        f'{split}/f1': float(np.asarray(metrics['f1']).mean()),
    }
    if best_metrics is not None:
        for name in ['iou', 'dice', 'precision', 'recall']:
            value = metrics_log[f'{split}/{name}']
            if name not in best_metrics or value > best_metrics[name]['value']:
                best_metrics[name] = {'value': value, 'epoch': epoch}
    if logger is not None:
        logger.log_scalars(metrics_log, step=epoch)

    def _per_class(name: str, idx: int) -> float:
        v = np.asarray(metrics[name])
        return float(v[idx]) if v.ndim else float(v)

    with open(csv_path, 'a', newline='') as f:
        writer = DictWriter(f, fieldnames=CSV_FIELDS)
        if write_header:
            writer.writeheader()
        for num, cl in enumerate(classes):
            writer.writerow(
                {
                    'Epoch': epoch,
                    'Loss': float(np.asarray(metrics['loss'])),
                    'IoU': _per_class('iou', num),
                    'Dice': _per_class('dice', num),
                    'Precision': _per_class('precision', num),
                    'Recall': _per_class('recall', num),
                    'F1': _per_class('f1', num),
                    'Split': split,
                    'Class': cl,
                }
            )
        writer.writerow(
            {
                'Epoch': epoch,
                'Loss': float(np.asarray(metrics['loss'])),
                'IoU': float(np.asarray(metrics['iou']).mean()),
                'Dice': float(np.asarray(metrics['dice']).mean()),
                'Precision': float(np.asarray(metrics['precision']).mean()),
                'Recall': float(np.asarray(metrics['recall']).mean()),
                'F1': float(np.asarray(metrics['f1']).mean()),
                'Split': split,
                'Class': 'Mean',
            }
        )
    return best_metrics
