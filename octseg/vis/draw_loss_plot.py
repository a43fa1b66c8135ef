"""Training-curve figure: train Loss vs test Dice with 95% CI across folds.

Framework equivalent of the reference plotter (reference:
src/vis/draw_loss_plot.py:27-104): merges per-fold metrics.csv files for one
class directory, draws seaborn lineplots with confidence bands, saves a
high-dpi PNG. Consumes the metrics.csv schema written by octseg.train.

Config: configs/draw_loss_plot.yaml.
Usage: python -m octseg.vis.draw_loss_plot [key=value ...]
"""

from __future__ import annotations

import logging
import os
from typing import List

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import seaborn as sns  # noqa: E402

from octseg.core.config import Config, entry_point  # noqa: E402
from octseg.data.utils import get_file_list  # noqa: E402

log = logging.getLogger(__name__)


def merge_metric_dataframes(csv_paths: List[str]) -> pd.DataFrame:
    return pd.concat([pd.read_csv(p) for p in csv_paths], ignore_index=True)


@entry_point('draw_loss_plot')
def main(cfg: Config) -> None:
    class_dir = cfg.class_dir
    save_dir = cfg.save_dir
    os.makedirs(save_dir, exist_ok=True)

    csv_paths = get_file_list(class_dir, '.csv', filename_template='metrics')
    df = merge_metric_dataframes(csv_paths)
    class_name = os.path.basename(class_dir.rstrip('/'))
    df = df[df['Class'] == class_name]

    sns.set_theme(style='whitegrid')
    plt.figure(figsize=(12, 10))
    palette = sns.color_palette('bright', 2)
    train_label = 'DSC' if cfg.train_metric == 'Dice' else cfg.train_metric
    test_label = 'DSC' if cfg.test_metric == 'Dice' else cfg.test_metric
    sns.lineplot(
        data=df[df['Split'] == 'train'], x='Epoch', y=cfg.train_metric,
        color=palette[0], linewidth=3.0, label=f'{train_label} (Train)',
        err_style='band', errorbar=('ci', 95),
    )
    sns.lineplot(
        data=df[df['Split'] == 'test'], x='Epoch', y=cfg.test_metric,
        color=palette[1], linewidth=3.0, label=f'{test_label} (Test)',
        err_style='band', errorbar=('ci', 95),
    )
    plt.xlabel('Epoch', fontsize=36)
    plt.ylabel('Metric Value', fontsize=36)
    plt.xticks(np.arange(0, 176, 25), fontsize=30)
    plt.yticks(np.arange(0, 1.2, 0.2), fontsize=30)
    plt.legend(fontsize=26, loc='upper right')
    plt.grid(True)
    plt.ylim(0, 1)
    plt.xlim(0, 125)
    plt.tight_layout(pad=0.9)

    save_path = os.path.join(
        save_dir,
        f'{cfg.train_metric}_{cfg.test_metric}_{class_name.replace(" ", "_")}.png',
    )
    plt.savefig(save_path, dpi=int(cfg.get('dpi', 600)))
    plt.close()
    log.info('%s plot saved', class_name)
    log.info('Complete')


if __name__ == '__main__':
    main()
