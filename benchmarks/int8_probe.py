"""Probe: int8 vs bf16 conv throughput on this chip (v5e int8 MXU peak is
2x bf16 — 394 vs 197 TOPS). Decides whether an int8 inference mode can hit
the VERDICT r2 target (>=1.5x ensemble f/s).

Representative U-Net++/resnet101 @512 inference conv shapes. Relay-safe
timing: back-to-back dispatches, one host-fetched probe per block,
best-of-passes (shared-pool noise ~20%).

Usage: python benchmarks/int8_probe.py  -> JSON to stdout + benchmarks/int8_probe.json
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# (batch, h, w, cin, cout, k) — resnet101 body + unet++ decoder workhorses.
# cin == cout so CHAIN convs inside one jit: a single dispatch through the
# relay costs ~4 ms (measured), which swamps sub-ms kernels — chaining makes
# the measured quantity the kernel, not the dispatch.
SHAPES = [
    (16, 128, 128, 64, 64, 3),
    (16, 64, 64, 128, 128, 3),
    (16, 32, 32, 256, 256, 3),
    (16, 16, 16, 512, 512, 3),
    (16, 128, 128, 256, 256, 3),  # u-net++ dense-grid workhorse at 1/4
]
CHAIN = 24  # convs per dispatch
ITERS, PASSES = 3, 3


def conv(x, w, out_dtype=None):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=out_dtype,
    )


def timed(fn, *args):
    from _timing import timed as _timed  # benchmarks/ is the script dir

    return _timed(fn, *args, iters=ITERS, passes=PASSES)


def main():
    rng = np.random.default_rng(0)
    rows = []
    for (n, h, w, cin, cout, k) in SHAPES:
        x = rng.normal(size=(n, h, w, cin)).astype(np.float32)
        wgt = rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.05
        flops = 2.0 * n * h * w * cin * cout * k * k * CHAIN

        def chain_bf16(a, b):
            y = a
            for _ in range(CHAIN):
                y = conv(y, b)
                y = jnp.clip(y, -3, 3)  # keep magnitudes tame
            return y

        def chain_int8(a, b):
            # the full inference int8 round trip per layer: int8 conv on the
            # MXU, f32 dequant, bf16, re-quantize the activation
            y = a
            for _ in range(CHAIN):
                z = conv(y, b, jnp.int32).astype(jnp.float32)
                z = jnp.clip(z * (1.0 / 127), -127, 127)
                y = z.astype(jnp.int8)
            return y

        xb = jax.device_put(jnp.asarray(x, jnp.bfloat16))
        wb = jax.device_put(jnp.asarray(wgt, jnp.bfloat16))
        t_bf16 = timed(jax.jit(chain_bf16), xb, wb)

        xi = jax.device_put(jnp.asarray(
            np.clip(np.round(x * 10), -127, 127), jnp.int8))
        wi = jax.device_put(jnp.asarray(
            np.clip(np.round(wgt * 100), -127, 127), jnp.int8))
        t_int8 = timed(jax.jit(chain_int8), xi, wi)

        row = {
            'shape': f'{n}x{h}x{w}x{cin}->{cout} k{k} x{CHAIN}',
            'bf16_ms': round(t_bf16 * 1e3, 3),
            'int8_ms': round(t_int8 * 1e3, 3),
            'bf16_tflops': round(flops / t_bf16 / 1e12, 1),
            'int8_tops': round(flops / t_int8 / 1e12, 1),
            'speedup': round(t_bf16 / t_int8, 2),
        }
        rows.append(row)
        print(row, flush=True)

    out = {
        'device': str(jax.devices()[0]),
        'v5e_peaks_tops': {'bf16': 197, 'int8': 394},
        'iters': ITERS, 'passes': PASSES,
        'rows': rows,
    }
    path = os.path.join(os.path.dirname(__file__), 'int8_probe.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'geomean_speedup': round(
        float(np.exp(np.mean([np.log(r['speedup']) for r in rows]))), 3)}))


if __name__ == '__main__':
    main()
