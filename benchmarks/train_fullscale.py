"""Winning-config training step time at the REAL input sizes (VERDICT r2
item 7): LinkNet/efficientnet-b7 @896 batch 4 bf16 with per-block remat
(the FC_LC config that only fits one 16 GB chip via octseg.models.rematutil)
and U-Net/timm-regnetx_064 @896 batch 4 (VV).

Writes benchmarks/train_fullscale.json so the headline training claims are a
measured artifact, not README prose. Relay-safe timing (host-fetched probe,
best-of-passes). Usage: python benchmarks/train_fullscale.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _timing import sync as _sync  # noqa: E402  (benchmarks/ on sys.path)

CONFIGS = [
    # (name, arch, encoder, size, batch, remat)
    ('FC_LC', 'LinkNet', 'efficientnet-b7', 896, 4, True),
    ('VV', 'Unet', 'timm-regnetx_064', 896, 4, True),
]
ITERS, PASSES = 4, 2


def bench_one(name, arch, encoder, size, batch, remat):
    from octseg.models import create_model
    from octseg.models.rematutil import set_block_remat
    from octseg.train.state import TrainState, make_optimizer
    from octseg.train.train import make_train_step

    set_block_remat(remat)
    try:
        model = create_model(arch, encoder, classes=2, dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        imgs = jax.random.uniform(rng, (batch, size, size, 3),
                                  jnp.float32, 0, 255)
        masks = (jax.random.uniform(rng, (batch, size, size, 2)) > 0.7
                 ).astype(jnp.float32)
        variables = jax.jit(functools.partial(model.init, train=False))(
            {'params': rng, 'dropout': rng}, imgs[:1])
        tx = make_optimizer('Adam', 1e-4, 1e-4)
        state = TrainState.create(variables['params'],
                                  variables['batch_stats'], tx)
        step = jax.jit(make_train_step(model, use_augmentation=True),
                       donate_argnums=(0,))

        sync = _sync
        t0 = time.perf_counter()
        state, metrics = step(state, imgs, masks, jax.random.PRNGKey(1))
        sync(metrics['loss'][None])
        compile_s = time.perf_counter() - t0

        best = float('inf')
        for p in range(PASSES):
            t0 = time.perf_counter()
            for i in range(ITERS):
                state, metrics = step(state, imgs, masks,
                                      jax.random.fold_in(rng, p * ITERS + i))
            sync(metrics['loss'][None])
            best = min(best, (time.perf_counter() - t0) / ITERS)
        row = {
            'config': f'{arch}/{encoder} @{size} b{batch} bf16'
                      + (' remat' if remat else ''),
            'ms_per_step': round(best * 1e3, 1),
            'img_s': round(batch / best, 2),
            'first_compile_s': round(compile_s, 1),
        }
        print(f'# {name}: {row}', file=sys.stderr, flush=True)
        return row
    finally:
        set_block_remat(False)


def main():
    out = {'device': str(jax.devices()[0]), 'configs': {}}
    for spec in CONFIGS:
        out['configs'][spec[0]] = bench_one(*spec)
    path = os.path.join(os.path.dirname(__file__), 'train_fullscale.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v['img_s'] for k, v in out['configs'].items()}))


if __name__ == '__main__':
    main()
