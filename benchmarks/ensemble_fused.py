"""Single-program ensemble vs serial per-model dispatch (VERDICT r3 #6).

The inference engine runs the three winning models as three XLA executables
per block (octseg/infer/engine.py serializes them — two different
executables in flight would OOM: U-Net++ temps alone are 13.5 GB at b128).
ensemble_breakdown.json blames part of the structural MFU residual on the
per-executable sync between them. This measures the alternative: ONE jitted
program computing all three models' 512² masks for a block, so XLA can
schedule across model boundaries and the host pays one dispatch + one sync
per block instead of three.

Memory forces small blocks for the fused program (the three executables'
temps coexist inside one program's buffer assignment), so the comparison is
at b32/b64: fused(b) vs the sum of the three serial per-model times at the
same b. The decision (adopt or park) is recorded in the artifact either way.

Writes benchmarks/ensemble_fused.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _timing import timed  # noqa: E402

S = 512
OUT = (1000, 1000)
V5E_BF16_PEAK = 197e12
BLOCKS = (32, 64)

SPECS = [
    ('UnetPlusPlus', 'resnet101', 1),   # LM
    ('LinkNet', 'efficientnet-b7', 2),  # FC_LC
    ('Unet', 'timm-regnetx_064', 1),    # VV
]


def make_models():
    from octseg.models import create_model

    models, variables = [], []
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, S, S, 3), jnp.float32)
    for arch, enc, classes in SPECS:
        m = create_model(arch, enc, classes=classes, dtype=jnp.bfloat16)
        v = jax.device_put(jax.jit(functools.partial(m.init, train=False))(
            {'params': rng, 'dropout': rng}, x1))
        models.append(m)
        variables.append(v)
    return models, variables


def main():
    from octseg.core.compilecache import enable_compilation_cache
    from octseg.ops.normalize import sigmoid_threshold
    from octseg.ops.resize import resize_nearest

    enable_compilation_cache()
    models, variables = make_models()

    def one(model, v, x):
        return resize_nearest(
            sigmoid_threshold(model.apply(v, x, train=False)), OUT)

    def fused(vs, x):
        # ensemble semantics of the engine (reference src/predict.py:61-101)
        # unchanged: LM ch0 -> mask ch0; FC_LC ch0 -> ch2 (Lipid core),
        # ch1 -> ch1 (Fibrous cap); VV ch0 -> ch3. One program, one sync.
        lm = one(models[0], vs[0], x)
        fc_lc = one(models[1], vs[1], x)
        vv = one(models[2], vs[2], x)
        return jnp.concatenate(
            [lm, fc_lc[..., 1:2], fc_lc[..., 0:1], vv], axis=-1)

    rows = []
    compiled_all = []
    for b in BLOCKS:
        imgs = jnp.zeros((b, S, S, 3), jnp.float32)
        serial = [jax.jit(functools.partial(one, m)).lower(v, imgs).compile()
                  for m, v in zip(models, variables)]
        fusedc = jax.jit(fused).lower(variables, imgs).compile()
        mem = fusedc.memory_analysis()
        print(f'# fused b{b}: temps {mem.temp_size_in_bytes / 2**30:.1f} GB',
              file=sys.stderr, flush=True)
        compiled_all.append((b, serial, fusedc))

    # the engine's real operating point — serial per-model at b128 — is the
    # bar the fused program must beat, not just serial at its own (memory-
    # capped) block size
    B_HEAD = 128
    imgs = jnp.zeros((B_HEAD, S, S, 3), jnp.float32)
    serial_head = [jax.jit(functools.partial(one, m)).lower(v, imgs).compile()
                   for m, v in zip(models, variables)]

    from bench import wait_for_calm_pool  # noqa: E402

    floor = wait_for_calm_pool()
    for b, serial, fusedc in compiled_all:
        x = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (b, S, S, 3), jnp.float32, 0, 255))
        t_serial = sum(timed(c, v, x, iters=4, passes=2)
                       for c, v in zip(serial, variables))
        t_fused = timed(fusedc, variables, x, iters=4, passes=2)
        flops = float(fusedc.cost_analysis().get('flops', 0.0))
        row = {
            'block': b,
            'serial_ms': round(t_serial * 1e3, 1),
            'fused_ms': round(t_fused * 1e3, 1),
            'fused_speedup': round(t_serial / t_fused, 3),
            'serial_f_s': round(b / t_serial, 1),
            'fused_f_s': round(b / t_fused, 1),
            'fused_mfu': round(flops / t_fused / V5E_BF16_PEAK, 3),
            'fused_temp_gb': round(
                fusedc.memory_analysis().temp_size_in_bytes / 2 ** 30, 1),
        }
        print(f'# {row}', file=sys.stderr, flush=True)
        rows.append(row)

    x = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (B_HEAD, S, S, 3), jnp.float32, 0, 255))
    t_head = sum(timed(c, v, x, iters=4, passes=2)
                 for c, v in zip(serial_head, variables))
    serial_b128_f_s = round(B_HEAD / t_head, 1)

    best = max(rows, key=lambda r: r['fused_f_s'])
    # adopt only if the fused program beats the deployed configuration
    # (serial b128), not merely serial at its own memory-capped block size
    adopt = best['fused_f_s'] > serial_b128_f_s * 1.05
    out = {
        'device': str(jax.devices()[0]),
        'input': S,
        'rows': rows,
        'serial_b128_f_s': serial_b128_f_s,
        'decision': ('adopt' if adopt else 'park'),
        'dispatch_floor_ms': round(floor * 1e3, 2),
        'note': ('fused = one XLA program computing all three 512^2 models '
                 'per block (one dispatch+sync); serial = the engine\'s '
                 'current per-model executables at the same block size. '
                 'Memory confines the fused program to small blocks, so the '
                 'bar to beat is the serial b128 headline, not just serial '
                 'at equal b.'),
    }
    path = os.path.join(os.path.dirname(__file__), 'ensemble_fused.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'decision': out['decision'], 'rows': rows}))


if __name__ == '__main__':
    main()
