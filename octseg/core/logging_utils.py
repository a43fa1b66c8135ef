"""Pluggable scalar logging + profiling utilities.

Replaces the reference's W&B scalar sinks (reference: src/models/smp/
model.py:85,119,127, utils.py:92-105 — scalars, summaries) with local sinks:
stdout and an append-only JSONL file per run. Profiling helpers wrap
jax.profiler traces and a reliable device timer (host-fetch sync — see
bench.py: block_until_ready only acks enqueue on tunneled devices), replacing
the reference's wall-clock prints (src/predict.py:129-148) and ptflops.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

log = logging.getLogger(__name__)


class ScalarLogger:
    """Scalar sink: stdout (via logging) + JSONL file; keeps best-value
    summaries like wandb.run.summary."""

    def __init__(self, run_dir: Optional[str] = None, stdout: bool = True):
        self.stdout = stdout
        self.jsonl_path = None
        self.summary: Dict[str, float] = {}
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)
            self.jsonl_path = os.path.join(run_dir, 'scalars.jsonl')

    def log_scalars(self, scalars: Dict[str, float], step: int) -> None:
        record = {'step': step, **{k: float(v) for k, v in scalars.items()}}
        if self.stdout:
            parts = '  '.join(f'{k} {v:.4f}' for k, v in record.items() if k != 'step')
            log.info('step %d  %s', step, parts)
        if self.jsonl_path:
            with open(self.jsonl_path, 'a') as f:
                f.write(json.dumps(record) + '\n')

    def update_summary(self, key: str, value: float, maximize: bool = True) -> bool:
        """Track a best value; returns True if it improved."""
        best = self.summary.get(key)
        improved = best is None or (value > best if maximize else value < best)
        if improved:
            self.summary[key] = float(value)
        return improved


@contextlib.contextmanager
def device_timer(name: str = 'span', sync_value=None):
    """Wall-clock span with an optional device-sync probe fetched at exit."""
    t0 = time.perf_counter()
    yield
    if sync_value is not None:
        import jax
        import numpy as np

        np.asarray(jax.device_get(sync_value))
    log.info('%s: %.3f s', name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str = 'logs/profile'):
    """jax.profiler trace span (view with tensorboard/xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def check_finite(tree, name: str = 'tree') -> None:
    """Raise if any leaf contains NaN/Inf (training sanitizer; the jit-free
    counterpart of jax.debug nan checks)."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(f'Non-finite values in {name}{jax.tree_util.keystr(path)}')
