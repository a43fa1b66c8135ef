"""Sweep-result aggregator: merge per-class tuning exports → best configs.

Framework equivalent of the reference aggregator (reference:
src/models/get_configs.py:15-139, which merges W&B xlsx exports). Here the
inputs are the tuner's own tuning_results.csv files (one per class sweep,
named or organized by class directory); outputs are configs_all.csv and a
per-(class, architecture) best-by-F1 configs_best.csv.

Config: configs/get_configs.yaml.
Usage: python -m octseg.tune.get_configs [key=value ...]
"""

from __future__ import annotations

import logging
import os
from glob import glob
from pathlib import Path

import pandas as pd

from octseg.core.config import Config, entry_point

log = logging.getLogger(__name__)


def load_class_results(tuning_dir: str) -> pd.DataFrame:
    """Read <tuning_dir>/<class_name>/tuning_results.csv files; the directory
    name is the class label."""
    dfs = []
    for csv_path in sorted(glob(os.path.join(tuning_dir, '*', 'tuning_results.csv'))):
        df = pd.read_csv(csv_path)
        df['class'] = Path(csv_path).parent.name
        dfs.append(df)
    # flat layout fallback: a single tuning_results.csv
    flat = os.path.join(tuning_dir, 'tuning_results.csv')
    if not dfs and os.path.exists(flat):
        df = pd.read_csv(flat)
        df['class'] = 'all'
        dfs.append(df)
    if not dfs:
        raise FileNotFoundError(f'No tuning_results.csv under {tuning_dir}')
    return pd.concat(dfs, ignore_index=True)


def best_configs(df: pd.DataFrame, metric: str = 'val_f1') -> pd.DataFrame:
    """Max-metric row per (class, architecture) — the reference's per
    (Class, Architecture) max-DSC table (get_configs.py:27-112)."""
    ok = df[df.get('status', 'ok') == 'ok'] if 'status' in df else df
    rows = []
    for (_cls, _arch), group in ok.groupby(['class', 'architecture']):
        rows.append(group.loc[group[metric].idxmax()])
    out = pd.DataFrame(rows).reset_index(drop=True)
    return out.sort_values(['class', metric], ascending=[True, False]).reset_index(drop=True)


@entry_point('get_configs')
def main(cfg: Config) -> None:
    df = load_class_results(cfg.tuning_dir)
    os.makedirs(cfg.save_dir, exist_ok=True)
    df.to_csv(os.path.join(cfg.save_dir, 'configs_all.csv'), index=False)
    best = best_configs(df, metric=cfg.get('metric', 'val_f1'))
    best.to_csv(os.path.join(cfg.save_dir, 'configs_best.csv'), index=False)
    log.info('Merged %d trials; %d best configs', len(df), len(best))
    log.info('Complete')


if __name__ == '__main__':
    main()
