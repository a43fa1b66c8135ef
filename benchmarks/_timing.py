"""Shared relay-safe timing for the benchmark scripts.

On this rig `block_until_ready` only acks enqueue through the relay, so the
only reliable sync is host-fetching a 1-element probe (~30 ms RTT). The
shared pool swings ~20-25% hour to hour, so every measurement is
best-of-passes over blocks of back-to-back dispatches (the probe RTT is
amortized by iters). bench.py carries the same pattern inline because its
AOT-compiled executables also feed cost_analysis.
"""

from __future__ import annotations

import time

import jax


_probe = jax.jit(lambda y: y.reshape(-1)[0])


def sync(out) -> float:
    """Host-fetch a single element — the only true completion barrier.

    The probe MUST be a module-level jit: a fresh `jax.jit(lambda ...)` per
    call is a new callable identity, so every sync retraces and re-hits the
    (remote, variably-loaded) compile service — measured as a phantom
    40-60 ms "dispatch floor" that looks exactly like pool contention."""
    return float(jax.device_get(_probe(out)))


def timed(fn, *args, iters: int = 6, passes: int = 3) -> float:
    """Best-of-`passes` mean seconds per call over `iters` dispatches."""
    sync(fn(*args))  # warm (compile + first execution)
    best = float('inf')
    for _ in range(passes):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best
