"""Measure the persistent-compilation-cache win on the ensemble programs.

Cold pass: compile each winning-config forward program (512 px, b128,
bf16 — exactly what bench.py/the engine build) into a fresh cache dir.
Warm pass: a fresh subprocess compiles the same programs against that
cache. The delta is the engine's cold-start saving on every process after
the first (octseg/core/compilecache.py wires this into all CLI entry
points). Writes benchmarks/compile_cache.json.

Usage: python benchmarks/compile_cache.py [--child <cache_dir>]
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root (octseg importable)

ENSEMBLE = [
    ('UnetPlusPlus', 'resnet101', 1),
    ('LinkNet', 'efficientnet-b7', 2),
    ('Unet', 'timm-regnetx_064', 1),
]
BATCH, INPUT, OUT = 128, 512, (1000, 1000)


def compile_all(cache_dir: str) -> dict:
    from octseg.core.compilecache import enable_compilation_cache

    enable_compilation_cache(cache_dir)

    import jax
    import jax.numpy as jnp

    from octseg.models import create_model
    from octseg.ops.normalize import sigmoid_threshold
    from octseg.ops.resize import resize_nearest

    times = {}
    for arch, encoder, classes in ENSEMBLE:
        model = create_model(arch, encoder, classes=classes, dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        imgs = jnp.zeros((BATCH, INPUT, INPUT, 3), jnp.float32)
        variables = jax.eval_shape(
            functools.partial(model.init, train=False),
            {'params': rng, 'dropout': rng}, imgs,
        )

        def forward(variables, imgs):
            logits = model.apply(variables, imgs, train=False)
            return resize_nearest(sigmoid_threshold(logits), OUT).astype(jnp.uint8)

        t0 = time.perf_counter()
        jax.jit(forward).lower(variables, imgs).compile()
        times[f'{arch}/{encoder}'] = round(time.perf_counter() - t0, 2)
        print(f'# {arch}/{encoder}: {times[f"{arch}/{encoder}"]}s',
              file=sys.stderr, flush=True)
    return times


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == '--child':
        print(json.dumps(compile_all(sys.argv[2])))
        return

    with tempfile.TemporaryDirectory(prefix='octseg-xla-cache-') as cache_dir:
        passes = {}
        for label in ('cold', 'warm'):
            proc = subprocess.run(
                [sys.executable, '-u', os.path.abspath(__file__),
                 '--child', cache_dir],
                capture_output=True, text=True, timeout=3600,
            )
            sys.stderr.write(proc.stderr)
            if proc.returncode != 0:
                raise SystemExit(f'{label} pass failed:\n{proc.stderr[-2000:]}')
            passes[label] = json.loads(proc.stdout.strip().splitlines()[-1])

    import jax

    result = {
        'device': str(jax.devices()[0]),
        'program': f'ensemble forward {INPUT}^2 b{BATCH} bf16 (bench.py build)',
        'cold_s': passes['cold'],
        'warm_s': passes['warm'],
        'cold_total_s': round(sum(passes['cold'].values()), 2),
        'warm_total_s': round(sum(passes['warm'].values()), 2),
        'speedup': round(sum(passes['cold'].values())
                         / max(sum(passes['warm'].values()), 1e-9), 1),
        'note': 'warm pass is a fresh process against the populated cache — '
                'the engine cold-start saving realized by '
                'octseg.core.compilecache on every CLI run after the first',
    }
    out = os.path.join(HERE, 'compile_cache.json')
    with open(out, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
