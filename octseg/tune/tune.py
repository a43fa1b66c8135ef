"""Hyperparameter tuning entry point (local Bayesian + HyperBand).

Framework equivalent of the reference sweep driver (reference:
src/models/smp/tune.py:67-134): per trial, build a fresh data module + model,
train, report val/f1 to the scheduler — but the scheduler runs in-process
(octseg.tune.search) instead of on the W&B server, trial results append to
{save_dir}/tuning_results.csv, and failures are isolated per trial
(reference's try/except + cache cleanup, tune.py:102-111 — here a failed
trial records metric 0 and the loop continues).

Config: configs/tune.yaml (same keys as the reference tune.yaml).
Usage: python -m octseg.tune.tune [key=value ...]
"""

from __future__ import annotations

import csv
import logging
import os
import time
import traceback

from octseg.core.config import Config, entry_point
from octseg.train.train import train_model
from octseg.tune.search import BayesianSearch, HyperBand, SearchSpace

log = logging.getLogger(__name__)

RESULT_FIELDS = [
    'trial', 'architecture', 'encoder', 'optimizer', 'lr', 'input_size',
    'val_f1', 'val_loss', 'epochs_done', 'duration_s', 'status',
]


def run_sweep(cfg: Config) -> dict:
    space = SearchSpace.from_config(cfg)
    search = BayesianSearch(space, seed=cfg.get('seed', 11))
    save_dir = cfg.get('save_dir', 'models/tuning')
    os.makedirs(save_dir, exist_ok=True)
    results_path = os.path.join(save_dir, 'tuning_results.csv')
    write_header = not os.path.exists(results_path)

    best = {'val_f1': -1.0, 'params': None}
    n_trials = int(cfg.num_trials)
    for trial in range(n_trials):
        params = search.suggest()
        hyperband = HyperBand(
            min_iter=int(cfg.get('hyperband_min_iter', 25)),
            eta=int(cfg.get('hyperband_eta', 2)),
            max_iter=int(cfg.epochs),
            s=int(cfg.get('hyperband_s', 2)),
        )
        trial_cfg = Config(dict(cfg))
        trial_cfg.update(params)
        trial_cfg['epochs'] = cfg.epochs
        trial_cfg['model_name'] = f'trial_{trial:04d}'
        trial_cfg['use_augmentation'] = cfg.get('use_augmentation', True)
        model_dir = os.path.join(save_dir, f'trial_{trial:04d}')

        log.info('trial %d/%d: %s', trial + 1, n_trials, params)
        t0 = time.time()
        status = 'ok'
        try:
            summary = train_model(
                trial_cfg,
                model_dir=model_dir,
                on_epoch_end=lambda epoch, s: hyperband.should_stop(
                    epoch, s['last_val_f1']
                ),
            )
            val_f1 = summary['last_val_f1']
            val_loss = summary['best_val_loss']
            epochs_done = summary['epochs_done']
        except Exception:
            # trial isolation: log, record a failed row, keep sweeping
            log.error('trial %d failed:\n%s', trial, traceback.format_exc())
            status, val_f1, val_loss, epochs_done = 'failed', 0.0, float('inf'), 0
        search.observe(params, val_f1)
        if val_f1 > best['val_f1']:
            best = {'val_f1': val_f1, 'params': params, 'trial': trial}

        with open(results_path, 'a', newline='') as f:
            writer = csv.DictWriter(f, fieldnames=RESULT_FIELDS)
            if write_header:
                writer.writeheader()
                write_header = False
            writer.writerow(
                {
                    'trial': trial,
                    **{k: params[k] for k in
                       ('architecture', 'encoder', 'optimizer', 'lr', 'input_size')},
                    'val_f1': val_f1,
                    'val_loss': val_loss,
                    'epochs_done': epochs_done,
                    'duration_s': round(time.time() - t0, 1),
                    'status': status,
                }
            )
    log.info('Best trial: %s', best)
    return best


@entry_point('tune')
def main(cfg: Config) -> None:
    run_sweep(cfg)
    log.info('Complete')


if __name__ == '__main__':
    main()
