"""Benchmark: OCT frames/sec/chip for 512² hybrid-ensemble inference.

The BASELINE.json headline metric. Each frame passes through the full
3-model ensemble (U-Net++/resnet101 for LM, LinkNet/efficientnet-b7 for
FC+LC, U-Net/timm-regnetx_064 for VV — the reference's winning configs,
BASELINE.md) at 512x512, bfloat16 compute, including on-device sigmoid
threshold + nearest resize to 1000x1000 output masks.

The reference publishes no throughput (BASELINE.md), so vs_baseline is
reported against the north-star target derived from the driver goal
"500-frame pullback < 2 s on v5e-8": 500/2/8 = 31.25 frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp

BATCH = 128
INPUT = 512
OUT = (1000, 1000)
TARGET_FPS_PER_CHIP = 31.25

ENSEMBLE = [
    ('UnetPlusPlus', 'resnet101', 1),   # LM
    ('LinkNet', 'efficientnet-b7', 2),  # FC_LC
    ('Unet', 'timm-regnetx_064', 1),    # VV
]


def build(arch, encoder, classes):
    from octseg.models import create_model
    from octseg.ops.normalize import sigmoid_threshold
    from octseg.ops.resize import resize_nearest

    model = create_model(arch, encoder, classes=classes, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((BATCH, INPUT, INPUT, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {'params': rng, 'dropout': rng}, imgs
    )

    @jax.jit
    def forward(variables, imgs):
        logits = model.apply(variables, imgs, train=False)
        return resize_nearest(sigmoid_threshold(logits), OUT)

    return forward, variables


def main():
    import numpy as np

    n_chips = jax.device_count()
    fns = [build(*spec) for spec in ENSEMBLE]
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, INPUT, INPUT, 3),
                              jnp.float32, 0, 255)
    # single-element probe: forcing a host fetch is the only reliable sync on
    # a tunneled device (block_until_ready acks enqueue, not completion)
    probe = jax.jit(lambda m: m[0, 0, 0, 0])

    def sync(out):
        return float(np.asarray(jax.device_get(probe(out))))

    # warmup (compile everything incl. the probe)
    for fn, variables in fns:
        sync(fn(variables, imgs))

    iters = 3
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        for fn, variables in fns:
            out = fn(variables, imgs)
    sync(out)  # the device queue is FIFO: last result ⇒ all work done
    dt = time.perf_counter() - t0

    frames = BATCH * iters  # each frame goes through the whole ensemble
    fps_per_chip = frames / dt / n_chips
    print(json.dumps({
        'metric': 'OCT frames/sec/chip (512^2 3-model ensemble inference)',
        'value': round(fps_per_chip, 2),
        'unit': 'frames/s/chip',
        'vs_baseline': round(fps_per_chip / TARGET_FPS_PER_CHIP, 3),
    }))


if __name__ == '__main__':
    main()
