"""Per-class best-epoch boxplots across CV folds + best_metrics.csv.

Framework equivalent of the reference plotter (reference:
src/vis/draw_boxplots.py:18-134): per fold × class pick the best-epoch row by
the chosen metric, save best_metrics.csv, draw a seaborn boxplot over folds
by class in the canonical class order.

Config: configs/draw_boxplots.yaml.
Usage: python -m octseg.vis.draw_boxplots [key=value ...]
"""

from __future__ import annotations

import logging
import os
import re
from typing import List, Optional

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402
import seaborn as sns  # noqa: E402

from octseg.core.config import Config, entry_point  # noqa: E402
from octseg.data.utils import get_file_list  # noqa: E402

log = logging.getLogger(__name__)

CLASS_ORDER = ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum']


def get_fold_id(path: str) -> Optional[int]:
    match = re.search(r'fold_(\d+)', path)
    return int(match.group(1)) if match else None


def read_model_metrics(csv_paths: List[str]) -> pd.DataFrame:
    dfs = []
    for p in csv_paths:
        df = pd.read_csv(p)
        fold = get_fold_id(p)
        if fold is None:
            # a NaN fold would silently vanish from get_best_epoch's
            # equality filter (NaN != NaN) — keep the rows under fold 0
            log.warning('%s: no fold_N in path, grouping under fold 0', p)
            fold = 0
        df['Fold'] = fold
        dfs.append(df)
    return pd.concat(dfs, ignore_index=True)


def get_best_epoch(df: pd.DataFrame, metric: str = 'Dice') -> pd.DataFrame:
    best_rows = []
    for fold in df['Fold'].unique():
        for cls in df['Class'].unique():
            subset = df[(df['Fold'] == fold) & (df['Class'] == cls)]
            if not subset.empty:
                best_rows.append(subset.loc[subset[metric].idxmax()])
    return pd.DataFrame(best_rows)


@entry_point('draw_boxplots')
def main(cfg: Config) -> None:
    save_dir = cfg.save_dir
    os.makedirs(save_dir, exist_ok=True)
    csv_paths = get_file_list(list(cfg.class_dirs), '.csv', filename_template='metrics')
    df = read_model_metrics(csv_paths)
    df = df[df['Split'] == cfg.split]
    df_best = get_best_epoch(df, metric=cfg.metric)
    df_best.reset_index(drop=True, inplace=True)
    df_best.to_csv(os.path.join(save_dir, 'best_metrics.csv'), index=False)

    sns.set_theme(style='whitegrid')
    plt.figure(figsize=(12, 12))
    order = [c for c in CLASS_ORDER if c in set(df_best['Class'])]
    ax = sns.boxplot(
        x='Class', y=cfg.metric, data=df_best, palette=sns.color_palette('muted'),
        hue='Class', legend=False, showfliers=False, order=order, linewidth=2.0,
    )
    metric_name = 'DSC' if cfg.metric == 'Dice' else cfg.metric
    plt.xticks(rotation=90, fontsize=30)
    plt.yticks(fontsize=30)
    ax.set_xlabel('')
    ax.set_ylabel(metric_name, fontsize=36)
    ax.set_ylim(0.5, 1)
    sns.despine()
    plt.tight_layout()
    plt.savefig(
        os.path.join(save_dir, f'Boxplot_{cfg.metric}_{cfg.split}.png'),
        dpi=int(cfg.get('dpi', 600)), bbox_inches='tight',
    )
    plt.close()
    log.info('Complete')


if __name__ == '__main__':
    main()
