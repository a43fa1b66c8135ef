"""Accuracy validation for the int8 inference mode (VERDICT r2 item 1).

Scores the three trained eval/synth_fullscale model dirs (the winning
reference configs at their real input sizes) with exact and int8 inference
and records the per-class Dice deltas. Acceptance gate: |delta| < 0.005.

Usage (real chip): python scripts/validate_int8.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from octseg.train.evaluate import evaluate_model  # noqa: E402

MODELS = ['LM', 'FC_LC', 'VV']


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--base', default='eval/synth_fullscale')
    ap.add_argument('--out', default='eval/synth_fullscale/int8_accuracy.json')
    ap.add_argument('--batch', type=int, default=4)
    args = ap.parse_args()

    fold = os.path.join(args.base, 'fold')
    report = {}
    worst = 0.0
    for name in MODELS:
        model_dir = os.path.join(args.base, name)
        exact = evaluate_model(model_dir, fold, args.batch, 'test')
        quant = evaluate_model(model_dir, fold, args.batch, 'test', int8=True)
        deltas = {
            cl: round(quant[cl]['dice'] - exact[cl]['dice'], 6)
            for cl in exact if cl != 'Mean'
        }
        worst = max(worst, max(abs(d) for d in deltas.values()))
        report[name] = {
            'exact_dice': {cl: round(exact[cl]['dice'], 4)
                           for cl in exact if cl != 'Mean'},
            'int8_dice': {cl: round(quant[cl]['dice'], 4)
                          for cl in quant if cl != 'Mean'},
            'dice_delta': deltas,
        }
        print(name, report[name], flush=True)

    report['max_abs_dice_delta'] = round(worst, 6)
    report['pass'] = worst < 0.005
    with open(args.out, 'w') as f:
        json.dump(report, f, indent=2)
    print(json.dumps({'max_abs_dice_delta': worst, 'pass': worst < 0.005}))


if __name__ == '__main__':
    main()
