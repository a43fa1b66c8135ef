"""Config system: per-entry-point YAML with composition and dotted CLI overrides.

Reimplements the config semantics the reference gets from Hydra/OmegaConf
(reference: configs/main.yaml hydra block; decorator usage e.g.
src/predict.py:104-108; CLI overrides as used by dvc.yaml:19-20) without the
Hydra dependency:

- each entry point loads ``configs/<name>.yaml``;
- a ``defaults: [main, _self_]`` list composes parent configs (later wins);
- CLI arguments of the form ``key=value`` / ``a.b.c=value`` override;
- values are YAML-parsed, so ``classes=[Lumen,'Fibrous cap']`` works;
- attribute-style access (``cfg.data_dir``) like DictConfig.
"""

from __future__ import annotations

import copy
import functools
import logging
import os
import sys
import time
from typing import Any, Dict, Iterator, List, Optional

import yaml

import octseg


class Config(dict):
    """Dict with attribute access and recursive wrapping (DictConfig-alike)."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getitem__(self, key: str) -> Any:
        value = super().__getitem__(key)
        if isinstance(value, dict) and not isinstance(value, Config):
            value = Config(value)
            super().__setitem__(key, value)
        return value

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k in self:
            v = self[k]
            out[k] = v.to_dict() if isinstance(v, Config) else copy.deepcopy(v)
        return out

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def _deep_merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_composed(config_dir: str, name: str, _stack: Optional[set] = None) -> Dict[str, Any]:
    _stack = _stack or set()
    if name in _stack:
        raise ValueError(f'Config composition cycle at {name!r}')
    path = os.path.join(config_dir, f'{name}.yaml')
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    defaults: List[str] = raw.pop('defaults', [])
    merged: Dict[str, Any] = {}
    self_seen = False
    for d in defaults:
        if d == '_self_':
            merged = _deep_merge(merged, raw)
            self_seen = True
        else:
            merged = _deep_merge(merged, _load_yaml_composed(config_dir, d, _stack | {name}))
    if not self_seen:
        merged = _deep_merge(merged, raw)
    return merged


def _set_dotted(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split('.')
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def parse_overrides(argv: List[str]) -> Dict[str, Any]:
    """Parse ``key=value`` CLI overrides; values go through YAML for typing."""
    out: Dict[str, Any] = {}
    for arg in argv:
        if '=' not in arg:
            raise ValueError(f'Override {arg!r} is not of the form key=value')
        key, _, raw = arg.partition('=')
        key = key.lstrip('+')  # tolerate hydra-style +key=value appends
        try:
            value = yaml.safe_load(raw)
        except yaml.YAMLError:
            value = raw
        out[key] = _coerce_numbers(value)
    return out


def _coerce_numbers(value: Any) -> Any:
    """YAML 1.1 reads '1e-5' as a string (no dot before the exponent); users
    write lr=1e-5 and learning_rate=[1e-3,1e-4] constantly, so coerce
    numeric-looking strings — recursively through lists."""
    if isinstance(value, list):
        return [_coerce_numbers(v) for v in value]
    if isinstance(value, str):
        try:
            return float(value)
        except ValueError:
            return value
    return value


def load_config(
    name: str,
    overrides: Optional[List[str]] = None,
    config_dir: Optional[str] = None,
) -> Config:
    config_dir = config_dir or os.path.join(octseg.PROJECT_DIR, 'configs')
    merged = _load_yaml_composed(config_dir, name)
    for key, value in parse_overrides(overrides or []).items():
        _set_dotted(merged, key, value)
    return Config(merged)


def setup_logging(job_name: str, log_dir: Optional[str] = None) -> None:
    """Console + file logging, format matching the reference's main.yaml."""
    log_dir = log_dir or os.path.join(octseg.PROJECT_DIR, 'logs', job_name)
    os.makedirs(log_dir, exist_ok=True)
    fmt = logging.Formatter(
        '[%(asctime)s][%(levelname)s] - %(message)s',
        datefmt='%d-%m-%Y %H:%M:%S',
    )
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    # Reset handlers so repeated entry-point calls (tests) don't duplicate.
    for h in list(root.handlers):
        root.removeHandler(h)
    console = logging.StreamHandler(sys.stdout)
    console.setFormatter(fmt)
    root.addHandler(console)
    ts = time.strftime('%d-%m-%Y_%H-%M-%S')
    fileh = logging.FileHandler(os.path.join(log_dir, f'{ts}.log'))
    fileh.setFormatter(fmt)
    root.addHandler(fileh)


def entry_point(config_name: str, setup_logs: bool = True):
    """Decorator turning ``main(cfg)`` into a CLI entry point.

    Equivalent role to ``@hydra.main(config_path=..., config_name=...)`` in the
    reference. When the wrapped function is called with no arguments, CLI
    ``key=value`` overrides are read from ``sys.argv[1:]``; it can also be
    called directly with a prebuilt :class:`Config` (used by tests).
    """

    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(cfg: Optional[Config] = None, overrides: Optional[List[str]] = None):
            if cfg is None:
                cfg = load_config(config_name, overrides=overrides or sys.argv[1:])
                # CLI runs are fresh processes: pay each big XLA compile
                # once per machine, not once per invocation. Programmatic
                # calls (a prebuilt cfg, e.g. tests) stay hermetic.
                from octseg.core.compilecache import enable_compilation_cache

                enable_compilation_cache()
            if setup_logs:
                setup_logging(config_name)
            return fn(cfg)

        wrapper.config_name = config_name
        return wrapper

    return decorator


def iter_config_files(config_dir: Optional[str] = None) -> Iterator[str]:
    config_dir = config_dir or os.path.join(octseg.PROJECT_DIR, 'configs')
    for fname in sorted(os.listdir(config_dir)):
        if fname.endswith('.yaml'):
            yield os.path.join(config_dir, fname)
