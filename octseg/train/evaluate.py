"""Evaluation / DSC-parity harness: score a trained model dir on a fold.

The reference publishes 5-fold-mean per-feature DSC/IoU/Precision/Recall/F1
(BASELINE.md; reference README.md:70-75). This harness produces the same
numbers for an octseg model dir so parity can be checked directly: it loads
weights.ckpt + config.json, runs the fold's test split batched on device, and
writes/prints per-class rows with the reference's metric semantics
(per-sample stats averaged over the split, dice = 2*iou/(iou+1)).

Usage: python -m octseg.train.evaluate model_dir=models/LM data_dir=data/cv/fold_1
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from octseg.core.config import Config, entry_point
from octseg.infer.engine import load_model_bundle
from octseg.ops.normalize import normalize_imagenet, sigmoid_threshold
from octseg.train.data import OCTDataset, PrefetchLoader
from octseg.train.metrics import compute_metrics

log = logging.getLogger(__name__)


def evaluate_model(model_dir: str, data_dir: str, batch_size: int = 8,
                   split: str = 'test', int8: bool = False,
                   ) -> Dict[str, Dict[str, float]]:
    """Per-class metrics dict {class: {dice, iou, precision, recall, f1}}.
    int8=True scores the quantized inference path (octseg/ops/quantize.py)
    so its accuracy delta vs the exact path is measurable."""
    model, variables, model_cfg = load_model_bundle(model_dir)
    classes: List[str] = model_cfg['classes']
    dataset = OCTDataset(
        os.path.join(data_dir, split), classes, model_cfg['input_size']
    )
    loader = PrefetchLoader(dataset, batch_size, shuffle=False, drop_last=False)

    # Training-parity semantics: the reference's published metrics come from
    # forward(), which applies mean/std normalization (src/models/smp/
    # model.py:65-71) — unlike its predict() path. Manifest can opt out.
    normalize = bool(model_cfg.get('normalize', True))

    def _forward(variables, x):
        # variables as an ARGUMENT, not a closure: a closed-over tree is
        # baked into the program as constants — a multi-hundred-MB compile
        # payload that relay-attached compile services reject outright
        if normalize:
            x = normalize_imagenet(x)
        if int8:
            from octseg.ops.quantize import apply_int8

            return apply_int8(model, variables, x, train=False)
        return model.apply(variables, x, train=False)

    forward = jax.jit(_forward)
    variables = jax.device_put(variables)
    per_class = {name: [] for name in ('iou', 'dice', 'precision', 'recall', 'f1')}
    for imgs, masks in loader:
        logits = forward(variables, jnp.asarray(imgs))
        pred = sigmoid_threshold(logits)
        m = compute_metrics(pred, jnp.asarray(masks), jnp.float32(0.0))
        for name in per_class:
            per_class[name].append(np.asarray(m[name]))  # (N, C)

    stacked = {k: np.concatenate(v, axis=0) for k, v in per_class.items()}
    out: Dict[str, Dict[str, float]] = {}
    for ci, cl in enumerate(classes):
        out[cl] = {
            k: float(stacked[k][:, ci].mean()) for k in per_class
        }
    out['Mean'] = {
        k: float(np.mean([out[cl][k] for cl in classes])) for k in per_class
    }
    return out


@entry_point('evaluate')
def main(cfg: Config) -> None:
    results = evaluate_model(
        cfg.model_dir, cfg.data_dir, int(cfg.get('batch_size', 8)),
        cfg.get('split', 'test'), int8=bool(cfg.get('int8', False)),
    )
    for cl, metrics in results.items():
        log.info(
            '%-14s DSC %.4f  IoU %.4f  Precision %.4f  Recall %.4f  F1 %.4f',
            cl, metrics['dice'], metrics['iou'], metrics['precision'],
            metrics['recall'], metrics['f1'],
        )
    save_path = os.path.join(cfg.model_dir, f"eval_{cfg.get('split', 'test')}.json")
    with open(save_path, 'w') as f:
        json.dump(results, f, indent=2)
    log.info('Saved %s', save_path)


if __name__ == '__main__':
    main()
