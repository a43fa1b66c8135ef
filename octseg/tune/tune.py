"""Hyperparameter tuning entry point (local Bayesian + HyperBand).

Framework equivalent of the reference sweep driver (reference:
src/models/smp/tune.py:67-134): per trial, build a fresh data module + model,
train, report val/f1 to the scheduler — but the scheduler runs in-process
(octseg.tune.search) instead of on the W&B server, trial results append to
{save_dir}/tuning_results.csv, and failures are isolated per trial
(reference's try/except + cache cleanup, tune.py:102-111 — here a failed
trial records metric 0 and the loop continues).

Beyond the reference:
- concurrent trials: ``concurrent_trials: k`` partitions the device mesh into
  k disjoint submeshes and trains k trials simultaneously (the reference
  sweeps 350 trials strictly sequentially on one GPU, tune.yaml);
- resumable sweeps: completed trials are recovered from tuning_results.csv on
  restart — their observations re-seed the Bayesian search and the sweep
  continues at the next trial index;
- HyperBand rung history is shared across the whole sweep (one scheduler per
  sweep), matching the W&B server-side semantics of early_terminate.

Config: configs/tune.yaml (same keys as the reference tune.yaml).
Usage: python -m octseg.tune.tune [key=value ...]
"""

from __future__ import annotations

import csv
import logging
import os
import threading
import time
import traceback
from concurrent.futures import ThreadPoolExecutor

import jax

from octseg.core.config import Config, entry_point
from octseg.train.train import train_model
from octseg.tune.search import BayesianSearch, HyperBand, SearchSpace

log = logging.getLogger(__name__)

RESULT_FIELDS = [
    'trial', 'architecture', 'encoder', 'optimizer', 'lr', 'input_size',
    'val_f1', 'val_loss', 'epochs_done', 'duration_s', 'status',
]

_PARAM_FIELDS = ('architecture', 'encoder', 'optimizer', 'lr', 'input_size')


def _load_completed(results_path: str):
    """Rows of a previous sweep run (for resume):
    [(trial, params, val_f1, status)]."""
    if not os.path.exists(results_path):
        return []
    out = []
    with open(results_path, newline='') as f:
        for row in csv.DictReader(f):
            try:
                params = {
                    'architecture': row['architecture'],
                    'encoder': row['encoder'],
                    'optimizer': row['optimizer'],
                    'lr': float(row['lr']),
                    'input_size': int(row['input_size']),
                }
                out.append((int(row['trial']), params, float(row['val_f1']),
                            row.get('status', 'ok'),
                            int(float(row.get('epochs_done', 0) or 0))))
            except (KeyError, ValueError):
                continue
    return out


def run_sweep(cfg: Config, devices=None) -> dict:
    space = SearchSpace.from_config(cfg)
    # n_random: initial pure-exploration trials before GP-EI takes over;
    # n_random >= num_trials degenerates to random search (the baseline arm
    # of eval/tuning's GP-vs-random comparison)
    search = BayesianSearch(space, seed=cfg.get('seed', 11),
                            n_random=int(cfg.get('n_random', 10)))
    save_dir = cfg.get('save_dir', 'models/tuning')
    os.makedirs(save_dir, exist_ok=True)
    results_path = os.path.join(save_dir, 'tuning_results.csv')

    # one scheduler per sweep: rungs accumulate across trials (W&B hyperband
    # semantics); per-trial instances would never terminate anything
    hyperband = HyperBand(
        min_iter=int(cfg.get('hyperband_min_iter', 25)),
        eta=int(cfg.get('hyperband_eta', 2)),
        max_iter=int(cfg.epochs),
        s=int(cfg.get('hyperband_s', 2)),
    )

    best = {'val_f1': -1.0, 'params': None}
    start_trial = 0
    for trial, params, val_f1, status, epochs_done in _load_completed(results_path):
        # failed trials keep their index (not retried, W&B semantics) but do
        # NOT feed the Bayesian model — their 0.0 is a crash artifact, not a
        # measurement, and would permanently bias the GP against the region
        if status == 'ok':
            search.observe(params, val_f1)
            # early-termination thresholds must survive the restart too
            hyperband.seed(epochs_done, val_f1)
            if val_f1 > best['val_f1']:
                best = {'val_f1': val_f1, 'params': params, 'trial': trial}
        start_trial = max(start_trial, trial + 1)
    if start_trial:
        log.info('resuming sweep at trial %d (best so far %.4f)',
                 start_trial, best['val_f1'])

    # warm_start: seed the Bayesian model with observations from ANOTHER
    # sweep's results file (e.g. the aggregated exports of
    # octseg.tune.get_configs) without advancing this sweep's trial indices
    # — a new sweep starts informed instead of cold
    warm = cfg.get('warm_start')
    if warm:
        # GP observations only — another sweep's trials are not part of THIS
        # sweep's HyperBand population
        rows = [r for r in _load_completed(str(warm)) if r[3] == 'ok']
        for _trial, params, val_f1, _status, _epochs in rows:
            search.observe(params, val_f1)
        log.info('warm-started from %s (%d observations)', warm, len(rows))

    lock = threading.Lock()
    write_header = not os.path.exists(results_path)

    device_pool = list(devices) if devices is not None else jax.devices()
    k = max(1, min(int(cfg.get('concurrent_trials', 1)), len(device_pool)))
    groups = [device_pool[i::k] for i in range(k)]

    def run_trial(trial: int, params: dict, group) -> None:
        nonlocal best, write_header
        trial_cfg = Config(dict(cfg))
        trial_cfg.update(params)
        trial_cfg['epochs'] = cfg.epochs
        trial_cfg['model_name'] = f'trial_{trial:04d}'
        trial_cfg['use_augmentation'] = cfg.get('use_augmentation', True)
        model_dir = os.path.join(save_dir, f'trial_{trial:04d}')

        log.info('trial %d: %s (on %d device(s))', trial, params, len(group))
        t0 = time.time()
        status = 'ok'
        try:
            summary = train_model(
                trial_cfg,
                model_dir=model_dir,
                on_epoch_end=lambda epoch, s: hyperband.should_stop(
                    epoch, s['last_val_f1']
                ),
                devices=group,
            )
            val_f1 = summary['last_val_f1']
            val_loss = summary['best_val_loss']
            epochs_done = summary['epochs_done']
        except Exception:
            # trial isolation: log, record a failed row, keep sweeping
            log.error('trial %d failed:\n%s', trial, traceback.format_exc())
            status, val_f1, val_loss, epochs_done = 'failed', 0.0, float('inf'), 0

        with lock:
            if status == 'ok':  # a crash is not a measurement (see resume)
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
                        **{key: params[key] for key in _PARAM_FIELDS},
                        'val_f1': val_f1,
                        'val_loss': val_loss,
                        'epochs_done': epochs_done,
                        'duration_s': round(time.time() - t0, 1),
                        'status': status,
                    }
                )

    n_trials = int(cfg.num_trials)
    if k == 1:
        for trial in range(start_trial, n_trials):
            with lock:
                params = search.suggest()
            run_trial(trial, params, groups[0])
    else:
        # async Bayesian dispatch: a semaphore admits one pending trial per
        # free submesh; suggest() happens lazily so each suggestion sees every
        # observation completed so far (in-flight trials are simply not yet
        # observed — standard async BO)
        import queue as _queue

        free_groups: '_queue.Queue' = _queue.Queue()
        for g in groups:
            free_groups.put(g)
        slots = threading.Semaphore(k)

        def run_trial_on_free_group(trial: int, params: dict) -> None:
            group = free_groups.get()
            try:
                run_trial(trial, params, group)
            finally:
                free_groups.put(group)
                slots.release()

        with ThreadPoolExecutor(k) as pool:
            futures = []
            for trial in range(start_trial, n_trials):
                slots.acquire()
                with lock:
                    params = search.suggest()
                futures.append(pool.submit(run_trial_on_free_group, trial, params))
            for f in futures:
                f.result()
    log.info('Best trial: %s', best)
    return best


@entry_point('tune')
def main(cfg: Config) -> None:
    run_sweep(cfg)
    log.info('Complete')


if __name__ == '__main__':
    main()
