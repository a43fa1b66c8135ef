"""5-fold cross-validation training driver.

The reference trains each fold by manually re-running train.py with
data_dir=data/cv/fold_k (its eval/training/{class}/fold_k layout); this
driver automates the loop: one config, all folds, per-fold model dirs
{save_dir}/{run_name}/fold_{k} each with the standard model-dir contract
(weights.ckpt, config.json, metrics.csv, resume.ckpt), plus a fold summary
CSV.

Folds are independent (SURVEY.md §2.7): ``concurrent_folds: k`` partitions
the device mesh into k disjoint submeshes and trains k folds simultaneously
(the same dispatch pattern as the tuner's concurrent trials) — the natural
layout on a pod slice, where fold-parallelism rides DCN-free submeshes.

Config: configs/train.yaml + folds/cv_dir/concurrent_folds keys.
Usage: python -m octseg.train.folds [key=value ...]
"""

from __future__ import annotations

import csv
import logging
import os
import time
import queue
from concurrent.futures import ThreadPoolExecutor
from typing import List

from octseg.core.config import Config, entry_point
from octseg.train.train import train_model

log = logging.getLogger(__name__)


def train_folds(cfg: Config) -> List[dict]:
    import jax

    cv_dir = cfg.get('cv_dir', 'data/cv')
    folds = list(cfg.get('folds') or range(1, int(cfg.get('num_folds', 5)) + 1))
    run_name = cfg.get('model_name') or f"{cfg.architecture}_{cfg.encoder}"
    save_root = os.path.join(cfg.get('save_dir', 'models'), run_name)
    os.makedirs(save_root, exist_ok=True)

    device_pool = jax.devices()
    k = max(1, min(int(cfg.get('concurrent_folds', 1)), len(device_pool), len(folds)))
    # free-submesh queue (same pattern as the tuner): a finished fold returns
    # its group before the next fold claims one — binding groups by fold
    # index would let two folds land on the same submesh when they finish
    # out of order
    free_groups: 'queue.Queue' = queue.Queue()
    for i in range(k):
        free_groups.put(device_pool[i::k])

    def run_one(fold):
        fold_cfg = Config(dict(cfg))
        fold_cfg['data_dir'] = os.path.join(cv_dir, f'fold_{fold}')
        fold_cfg['model_name'] = f'{run_name}/fold_{fold}'
        t0 = time.time()
        group = free_groups.get()
        try:
            log.info('=== fold %s (on %d device(s)) ===', fold, len(group))
            summary = train_model(
                fold_cfg,
                model_dir=os.path.join(save_root, f'fold_{fold}'),
                devices=group if k > 1 else None,
            )
        finally:
            free_groups.put(group)
        summary['fold'] = fold
        summary['duration_s'] = round(time.time() - t0, 1)
        return summary

    if k > 1:
        with ThreadPoolExecutor(max_workers=k) as pool:
            results = list(pool.map(run_one, folds))
    else:
        results = [run_one(f) for f in folds]

    with open(os.path.join(save_root, 'folds_summary.csv'), 'w', newline='') as f:
        fields = ['fold', 'best_val_loss', 'last_val_f1', 'epochs_done', 'duration_s']
        writer = csv.DictWriter(f, fieldnames=fields, extrasaction='ignore')
        writer.writeheader()
        writer.writerows(results)
    return results


@entry_point('train')
def main(cfg: Config) -> None:
    results = train_folds(cfg)
    log.info('Folds complete: %s', [(r['fold'], round(r['last_val_f1'], 4)) for r in results])


if __name__ == '__main__':
    main()
