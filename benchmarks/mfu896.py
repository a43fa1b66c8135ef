"""Deployed-shape (896²) MFU investigation.

Round-4 finding (benchmarks/ensemble_deployed.json): the same models that
run at 35-60% MFU at 512² collapse at their deployed 896² input —
VV (U-Net/timm-regnetx_064) 35.6% → 13.8%, FC_LC (LinkNet/efficientnet-b7)
13.0% → 13.3%-but-at-b64 — and FLOP scaling says MFU should be
~size-invariant (both FLOPs and activation traffic scale with pixels, so
arithmetic intensity is unchanged). Hypotheses this script separates:

  H1 block size   — the 896 runs were memory-forced to b32/b64; if MFU at
                    512 b16 ≈ 512 b128, per-execution overhead isn't it.
  H2 size cliff   — probe {512, 640, 768, 896}: a smooth decay says XLA
                    tiling degrades with spatial extent; a cliff at one size
                    says a layout/padding threshold.
  H3 postproc     — measure forward-only at model resolution vs forward +
                    sigmoid-threshold + NEAREST 1000² (the deployed tail);
                    the tail is pure HBM traffic that adds zero FLOPs.

Writes benchmarks/mfu896.json: a grid of (model, size, block) rows with
ms/block, f/s, analytic TFLOP, MFU, plus the postproc delta at 896.
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

V5E_BF16_PEAK = 197e12
HBM_BUDGET = 13.5 * 2 ** 30
OUT = (1000, 1000)

SPECS = [
    ('VV', 'Unet', 'timm-regnetx_064', 1),
    ('FC_LC', 'LinkNet', 'efficientnet-b7', 2),
]
SIZES = (512, 640, 768, 896)
BLOCKS = (8, 16, 32, 64)


def compile_fwd(model, variables, size, block, postproc):
    from octseg.ops.normalize import sigmoid_threshold
    from octseg.ops.resize import resize_nearest

    def fwd(v, x):
        y = model.apply(v, x, train=False)
        if postproc:
            return resize_nearest(sigmoid_threshold(y), OUT)
        return y

    imgs = jnp.zeros((block, size, size, 3), jnp.float32)
    compiled = jax.jit(fwd).lower(variables, imgs).compile()
    mem = compiled.memory_analysis()
    need = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
            + mem.output_size_in_bytes)
    if need > HBM_BUDGET:
        return None, 0.0
    return compiled, float(compiled.cost_analysis().get('flops', 0.0))


def main():
    from octseg.core.compilecache import enable_compilation_cache
    from octseg.models import create_model

    enable_compilation_cache()
    built = []
    for name, arch, enc, classes in SPECS:
        model = create_model(arch, enc, classes=classes, dtype=jnp.bfloat16)
        rng = jax.random.PRNGKey(0)
        variables = jax.device_put(jax.jit(
            functools.partial(model.init, train=False))(
            {'params': rng, 'dropout': rng},
            jnp.zeros((1, 128, 128, 3), jnp.float32)))
        for size in SIZES:
            for block in BLOCKS:
                compiled, flops = compile_fwd(model, variables, size, block,
                                              postproc=False)
                if compiled is None:
                    print(f'# {name}@{size} b{block}: over budget',
                          file=sys.stderr, flush=True)
                    continue
                built.append((name, size, block, False, compiled, variables,
                              flops))
        # postproc tail delta at the deployed shape, biggest fitting block
        for block in reversed(BLOCKS):
            compiled, flops = compile_fwd(model, variables, 896, block,
                                          postproc=True)
            if compiled is not None:
                built.append((name, 896, block, True, compiled, variables,
                              flops))
                break

    from bench import wait_for_calm_pool  # noqa: E402

    floor = wait_for_calm_pool()
    rows = []
    for name, size, block, postproc, compiled, variables, flops in built:
        x = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (block, size, size, 3), jnp.float32,
            0, 255))
        dt = timed(compiled, variables, x, iters=3, passes=2)
        row = {
            'model': name, 'input': size, 'block': block,
            'postproc_1000': postproc,
            'ms_per_block': round(dt * 1e3, 1),
            'f_s': round(block / dt, 1),
            'tflop_per_block': round(flops / 1e12, 2),
            'mfu': round(flops / dt / V5E_BF16_PEAK, 3),
        }
        print(f'# {row}', file=sys.stderr, flush=True)
        rows.append(row)

    out = {
        'device': str(jax.devices()[0]),
        'dispatch_floor_ms': round(floor * 1e3, 2),
        'v5e_bf16_peak_tflops': V5E_BF16_PEAK / 1e12,
        'rows': rows,
    }
    path = os.path.join(os.path.dirname(__file__), 'mfu896.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'rows': len(rows)}))


if __name__ == '__main__':
    main()
