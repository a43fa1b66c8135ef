"""Persistent XLA compilation cache for cold-start latency.

Every octseg entry point jit-compiles large conv programs (the ensemble
engine alone carries three multi-minute XLA compiles at 512-896 px block
sizes; the reference has no analog — torch loads cuDNN kernels ready-made).
JAX's persistent compilation cache serializes compiled executables to disk
keyed by (HLO, compiler version, platform), so every process after the
first skips the XLA-compile phase — measured on the tunneled v5e relay:
1.43 s -> 0.08 s for a single conv program; ensemble cold start 60.5 s ->
27.1 s, 2.2x (benchmarks/compile_cache.json; the warm remainder is flax
tracing + StableHLO lowering, which the cache cannot skip). Enabled from
the CLI entry-point wrapper (octseg.core.config) and bench.py.

Env contract:
  OCTSEG_COMPILE_CACHE=0      disable
  OCTSEG_COMPILE_CACHE=<dir>  cache directory (default
                              $XDG_CACHE_HOME/octseg/xla or ~/.cache/octseg/xla)
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_enabled_dir: str | None = None


def default_cache_dir() -> str:
    base = os.environ.get('XDG_CACHE_HOME', os.path.expanduser('~/.cache'))
    return os.path.join(base, 'octseg', 'xla')


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent cache; returns the dir (None if
    disabled via OCTSEG_COMPILE_CACHE=0 or if this jax lacks support)."""
    global _enabled_dir
    env = os.environ.get('OCTSEG_COMPILE_CACHE', '')
    if env in ('0', 'false', 'off'):
        return None
    if cache_dir is None:
        cache_dir = env if env not in ('', '1', 'true', 'on') else default_cache_dir()
    if _enabled_dir is not None:
        return _enabled_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # jax initializes its cache singleton at most once, at the dir in
        # force during the FIRST cached compile — a dir set after that is
        # silently ignored. Reset so this redirect actually takes effect
        # (no-op for CLIs, which enable before any compile).
        try:
            from jax._src import compilation_cache as _cc

            if getattr(_cc, '_cache_initialized', False):
                _cc.reset_cache()
        except Exception:  # pragma: no cover - private-API drift
            pass
        # cache everything that took >1s to compile, regardless of size
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception as e:  # pragma: no cover - version-dependent knobs
        log.info('persistent compilation cache unavailable: %s', e)
        return None
    _enabled_dir = cache_dir
    log.info('XLA persistent compilation cache at %s', cache_dir)
    return cache_dir
