"""Sweep-result aggregator: merge per-class tuning exports → best configs.

Framework equivalent of the reference aggregator (reference:
src/models/get_configs.py:15-139). Two input modes:

- **xlsx mode** (``tuning_file_paths`` config key, the reference's
  configs/get_configs.yaml contract): consumes the reference's W&B xlsx
  exports unmodified via octseg's own xlsx codec (octseg.data.xlsxio — no
  openpyxl on this rig) and reproduces the reference pipeline exactly:
  common-column intersection, metric-column drop, renames, column order,
  1-based ID, then the per-(Class, Architecture) max-DSC table
  (get_configs.py:16-25,28-112). Outputs configs_all.xlsx and
  configs_best.xlsx, byte-compatible in content with the reference's own
  eval/tuning outputs (tests/test_get_configs_xlsx.py proves it on the
  actual reference exports).
- **CSV mode** (``tuning_dir``): merges octseg's own tuner outputs
  (tuning_results.csv per class) into configs_all.csv / configs_best.csv.

Config: configs/get_configs.yaml.
Usage: python -m octseg.tune.get_configs [key=value ...]
"""

from __future__ import annotations

import logging
import os
from glob import glob
from pathlib import Path
from typing import List

import pandas as pd

from octseg.core.config import Config, entry_point

log = logging.getLogger(__name__)

# columns the reference drops from the combined export (get_configs.py:51-69)
_DROP_COLUMNS = [
    'train/f1', 'train/precision', 'train/recall', 'train/iou', 'train/dice',
    'train/loss', 'test/f1', 'test/precision', 'test/recall', 'test/iou',
    'test/dice', 'test/loss', 'best_precision_epoch', 'best_recall_epoch',
    'best_iou_epoch',
]

# reference renames (get_configs.py:72-88) and final order (91-107)
_RENAME = {
    'Unnamed: 0': 'ID',
    'classes': 'Class',
    'architecture': 'Architecture',
    'encoder': 'Encoder',
    'input_size': 'Input size',
    'optimizer': 'Optimizer',
    'lr': 'LR',
    'best_dice': 'DSC',
    'best_iou': 'IoU',
    'best_precision': 'Precision',
    'best_recall': 'Recall',
    'best_dice_epoch': 'Epoch',
}
_COLUMN_ORDER = [
    'ID', 'Name', 'State', 'Runtime', 'Class', 'Architecture', 'Encoder',
    'Input size', 'Optimizer', 'LR', 'DSC', 'IoU', 'Precision', 'Recall',
    'Epoch',
]


def _read_export(path: str) -> pd.DataFrame:
    if path.endswith('.csv'):
        return pd.read_csv(path)
    from octseg.data.xlsxio import read_xlsx_records

    return pd.DataFrame(read_xlsx_records(path))


def combine_export_files(paths: List[str]) -> pd.DataFrame:
    """Reference combine_excel_files: intersect columns, concat, drop metric
    columns, rename, reorder, 1-based ID (get_configs.py:28-112)."""
    frames = [_read_export(p) for p in paths]
    common = set(frames[0].columns)
    for df in frames[1:]:
        common &= set(df.columns)
    frames = [df[[c for c in df.columns if c in common]] for df in frames]
    df = pd.concat(frames, ignore_index=True)
    df = df.drop(columns=[c for c in _DROP_COLUMNS if c in df.columns])
    df = df.rename(columns=_RENAME)
    df = df[_COLUMN_ORDER]
    df['ID'] = df['ID'].apply(lambda x: x + 1)
    return df


def best_architectures(df: pd.DataFrame) -> pd.DataFrame:
    """Reference get_best_architectures: max-DSC row per (Class,
    Architecture), groups in sorted key order (get_configs.py:16-25)."""
    best = df.loc[df.groupby(['Class', 'Architecture'])['DSC'].idxmax()]
    return best.reset_index(drop=True)


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
    """Max-metric row per (class, architecture) — the CSV-mode analog of
    best_architectures over the octseg tuner's own results."""
    ok = df[df.get('status', 'ok') == 'ok'] if 'status' in df else df
    rows = []
    for (_cls, _arch), group in ok.groupby(['class', 'architecture']):
        rows.append(group.loc[group[metric].idxmax()])
    out = pd.DataFrame(rows).reset_index(drop=True)
    return out.sort_values(['class', metric], ascending=[True, False]).reset_index(drop=True)


def _to_xlsx(df: pd.DataFrame, path: str) -> None:
    from octseg.data.xlsxio import write_xlsx_records

    write_xlsx_records(path, df.to_dict(orient='records'),
                       columns=list(df.columns))


@entry_point('get_configs')
def main(cfg: Config) -> None:
    os.makedirs(cfg.save_dir, exist_ok=True)
    paths = list(cfg.get('tuning_file_paths', []) or [])
    if paths:  # reference xlsx-export mode
        df = combine_export_files(paths)
        _to_xlsx(df, os.path.join(cfg.save_dir, 'configs_all.xlsx'))
        best = best_architectures(df)
        _to_xlsx(best, os.path.join(cfg.save_dir, 'configs_best.xlsx'))
    else:  # octseg tuner CSV mode
        df = load_class_results(cfg.tuning_dir)
        df.to_csv(os.path.join(cfg.save_dir, 'configs_all.csv'), index=False)
        best = best_configs(df, metric=cfg.get('metric', 'val_f1'))
        best.to_csv(os.path.join(cfg.save_dir, 'configs_best.csv'), index=False)
    log.info('Merged %d trials; %d best configs', len(df), len(best))
    log.info('Complete')


if __name__ == '__main__':
    main()
