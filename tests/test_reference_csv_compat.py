"""Golden-file compatibility: octseg's vis layer consumes the REFERENCE's
actual per-fold metrics CSVs (eval/training/{class}/fold_*/metrics.csv) —
proof that the metrics.csv schema contract is byte-compatible both ways."""

import os

import numpy as np
import pandas as pd
import pytest

from octseg.core.config import Config


@pytest.fixture
def ref_eval(reference_dir):
    d = f'{reference_dir}/eval/training'
    if not os.path.isdir(f'{d}/Lumen/fold_1'):
        pytest.skip('reference eval CSVs not available')
    return d


def test_draw_loss_plot_on_reference_csvs(ref_eval, tmp_path):
    from octseg.vis.draw_loss_plot import main

    main(Config(class_dir=f'{ref_eval}/Lumen', save_dir=str(tmp_path),
                train_metric='Loss', test_metric='Dice', dpi=72))
    assert (tmp_path / 'Loss_Dice_Lumen.png').exists()


def test_draw_boxplots_on_reference_csvs(ref_eval, tmp_path):
    from octseg.vis.draw_boxplots import main

    class_dirs = [f'{ref_eval}/{c}' for c in
                  ('Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum')]
    main(Config(class_dirs=class_dirs, split='test', metric='Dice',
                save_dir=str(tmp_path), dpi=72))
    best = pd.read_csv(tmp_path / 'best_metrics.csv')
    # best-epoch DSC means across folds should reproduce the published
    # 5-fold numbers (README.md:70-75 / BASELINE.md) to rounding
    published = {
        'Lumen': 0.987, 'Fibrous cap': 0.736, 'Lipid core': 0.751,
        'Vasa vasorum': 0.610,
    }
    for cls, expected in published.items():
        got = best[best['Class'] == cls]['Dice'].mean()
        assert abs(got - expected) < 0.02, (cls, got, expected)
    # stronger: the selection is ROW-EXACT against the reference's own
    # committed eval/training/best_metrics.csv (same best epochs per
    # fold x class, same metric values)
    ref_best = pd.read_csv(os.path.join(ref_eval, 'best_metrics.csv'))
    ref_best = ref_best[ref_best['Split'] == 'test']
    merged = best.merge(ref_best, on=['Class', 'Fold'],
                        suffixes=('_ours', '_ref'))
    assert len(merged) == len(ref_best) == 20
    for col in ('Epoch', 'Loss', 'IoU', 'Dice', 'Precision', 'Recall', 'F1'):
        assert (abs(merged[f'{col}_ours'] - merged[f'{col}_ref'])
                < 1e-6).all(), col


def test_our_csv_schema_matches_reference(ref_eval, tmp_path):
    from octseg.train.metrics import save_metrics_on_epoch

    ref = pd.read_csv(f'{ref_eval}/Lumen/fold_1/metrics.csv')
    metrics = [{
        'loss': np.float32(0.1),
        'iou': np.full((2, 1), 0.9, np.float32),
        'dice': np.full((2, 1), 0.9, np.float32),
        'precision': np.full((2, 1), 0.9, np.float32),
        'recall': np.full((2, 1), 0.9, np.float32),
        'f1': np.full((2, 1), 0.9, np.float32),
    }]
    save_metrics_on_epoch(metrics, 'test', str(tmp_path), ['Lumen'], epoch=1)
    ours = pd.read_csv(tmp_path / 'metrics.csv')
    assert list(ours.columns) == list(ref.columns)
    assert set(ours['Class']) <= set(ref['Class']) | {'Mean'}


def test_epoch_aggregation_divergence_vs_reference_is_pinned():
    """Quantify the one documented metric deviation (PARITY.md): octseg
    aggregates an epoch as the PLAIN mean of per-batch means; the reference
    folds each batch into a running accumulator as acc=(batch+acc)/2
    (src/models/smp/utils.py:52-73), which weights batch i of n by
    2^-(n-i) (the first by 2^-(n-1)) — a recency-weighted mean, NOT a
    batch-count question. This pins (a) exact agreement through 2 batches,
    (b) the closed-form weights of the reference scheme, and (c) the
    realistic divergence magnitude for a converged epoch, so the PARITY
    claim is a measured number instead of prose."""
    from octseg.train.metrics import aggregate_epoch

    def reference_agg(batch_means):
        acc = batch_means[0]
        for b in batch_means[1:]:
            acc = np.mean((b, acc))
        return acc

    def batches(values):
        return [{'dice': np.full((1, 1), v, np.float32)} for v in values]

    # (a) identical through two batches
    for vals in ([0.7], [0.2, 0.9]):
        ours = float(np.asarray(aggregate_epoch(batches(vals))['dice']))
        assert abs(ours - reference_agg(vals)) < 1e-7

    # (b) the reference scheme's weights are exponential in recency:
    # for n=4, weights are (1/8, 1/8, 1/4, 1/2)
    vals = [1.0, 0.0, 0.0, 0.0]
    assert abs(reference_agg(vals) - 1 / 8) < 1e-7
    assert abs(reference_agg(vals[::-1]) - 1 / 2) < 1e-7
    ours = float(np.asarray(aggregate_epoch(batches(vals))['dice']))
    assert abs(ours - 1 / 4) < 1e-7  # plain mean, order-independent

    # (c) realistic magnitude: a converged epoch whose per-batch Dice
    # fluctuates with spread sigma diverges by O(sigma), NOT O(1) — the
    # adversarial bound (~0.5 for metric range [0,1]) needs a monotone
    # drift across the epoch that converged validation batches don't have.
    rng = np.random.default_rng(11)
    worst = 0.0
    for _ in range(200):
        vals = np.clip(rng.normal(0.9, 0.02, rng.integers(3, 20)), 0, 1)
        ours = float(np.asarray(aggregate_epoch(batches(list(vals)))['dice']))
        worst = max(worst, abs(ours - reference_agg(list(vals))))
    # measured ceiling ~1.5*sigma over 200 epochs (sigma=0.02 -> 0.025);
    # fails if either scheme drifts
    assert 0.0 < worst < 0.03, worst
