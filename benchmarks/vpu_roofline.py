"""VPU/HBM roofline evidence for the efficientnet-b7 depthwise stages.

VERDICT r2 (weak #1 / item 3): the claim that LinkNet/efficientnet-b7's
depthwise convolutions already run at the VPU speed-of-light was asserted
from one probe. This script makes it a reproducible artifact.

Methodology — every measured quantity is a CHAIN of ops inside ONE jit
dispatch, because the relay's per-dispatch floor is large and varies
hour-to-hour (measured 4-65 ms); the floor itself is recorded:

1. dispatch floor: a trivial jitted op, timed;
2. VPU ceiling: the best hand-tuned Pallas elementwise-fma kernel found
   (8 independent accumulator chains — see calibrate_vpu for the
   alternatives measured and rejected);
3. HBM ceiling: chained full passes over a 512 MB buffer with
   lax.optimization_barrier between steps (or XLA fuses the chain into
   one pass and 'beats' the HBM spec 5x);
4. each distinct stride-1 depthwise conv shape of efficientnet-b7 at 512 px:
   y = dwconv(y, w) chained CHAIN times (stride-2 shapes cannot chain —
   they are 4 of ~50 blocks and excluded, noted in the artifact).

A stage is at speed-of-light when max(util_vpu, util_hbm) ~ 1: the roofline
says nothing faster exists for that op on this chip without changing the
algorithm. Writes benchmarks/vpu_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _timing import sync, timed  # noqa: E402  (benchmarks/ on sys.path)
from octseg.models.encoders.efficientnet import (  # noqa: E402
    efficientnet_out_channels,
    flattened_blocks,
)

BATCH = int(os.environ.get('ROOFLINE_BATCH', 128))
INPUT = 512
CHAIN = int(os.environ.get('ROOFLINE_CHAIN', 8))
ITERS, PASSES = 3, 3
DTYPE = jnp.bfloat16


def measure_dispatch_floor():
    x = jax.device_put(jnp.ones((8, 8), DTYPE))
    return timed(jax.jit(lambda a: a + 1), x, iters=8, passes=PASSES)


def calibrate_vpu():
    """Best-achieved Pallas elementwise-fma throughput: the ceiling a
    hand-written VPU kernel can realistically reach on this chip.

    Methodology notes (each alternative was measured and rejected):
    - An XLA-level jnp chain measures 0.27 TFLOP/s — XLA splits the chain
      into hundreds of tiny kernels and per-kernel overhead dominates.
    - A single dependent Pallas chain (y = y*y + c) measures 0.8-1.3
      TFLOP/s — fma LATENCY bound, one chain cannot fill the pipeline.
    - 8 independent accumulator chains (ILP) at block (128, 256) is the
      best found: ~2.0 TFLOP/s. This is the honest custom-kernel ceiling
      to compare XLA's depthwise convs against (several already exceed
      it — they have k*k-tap ILP an elementwise chain lacks)."""
    from jax.experimental import pallas as pl

    reps, unroll, nacc = 256, 8, 8
    rows, bm = 1024, (128, 256)

    def kernel(x_ref, o_ref):
        y = x_ref[...]
        ks = [jnp.bfloat16(0.25) + jnp.bfloat16(0.01) * i for i in range(nacc)]
        accs = tuple(y + jnp.bfloat16(0.001) * i for i in range(nacc))

        def body(_, accs):
            for _ in range(unroll):
                accs = tuple(a * a + k for a, k in zip(accs, ks))
            return accs

        accs = jax.lax.fori_loop(0, reps // unroll, body, accs)
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[...] = out

    x = jax.device_put(jnp.full((rows * bm[0], bm[1]), 0.5, DTYPE))
    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[pl.BlockSpec(bm, lambda i: (i, 0))],
        out_specs=pl.BlockSpec(bm, lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, DTYPE),
    ))
    dt = timed(f, x, iters=ITERS, passes=PASSES)
    return 2.0 * nacc * reps * x.size / dt


def calibrate_hbm():
    """Chained full passes over a 512 MB buffer with an optimization
    barrier between steps — without it XLA fuses the whole chain into one
    read+write pass and 'measures' 5x the HBM spec (observed)."""
    x = jax.device_put(jnp.ones((256, 1024, 1024), DTYPE))  # 512 MB bf16
    reps = 16

    @jax.jit
    def chain(x):
        y = x
        for _ in range(reps):
            y = jax.lax.optimization_barrier(y + jnp.bfloat16(1.0))
        return y

    dt = timed(chain, x, iters=ITERS, passes=PASSES)
    return 2.0 * reps * x.size * x.dtype.itemsize / dt


def b7_depthwise_stages():
    """(h, channels, kernel, stride, count) for every distinct depthwise
    shape of efficientnet-b7 at INPUT px (depthwise runs on in_ch*expand)."""
    h = INPUT // 2  # after the stride-2 stem
    seen = {}
    in_ch = efficientnet_out_channels('efficientnet-b7')[1]
    for blk in flattened_blocks('efficientnet-b7'):
        mid = in_ch * blk['expand']
        key = (h, mid, blk['kernel'], blk['stride'])
        seen[key] = seen.get(key, 0) + 1
        if blk['stride'] == 2:
            h //= 2
        in_ch = blk['out']
    return seen


def main():
    floor = measure_dispatch_floor()
    vpu = calibrate_vpu()
    hbm = calibrate_hbm()
    print(f'# dispatch floor {floor * 1e3:.1f} ms; calibrated ceilings: '
          f'VPU {vpu / 1e12:.2f} TFLOP/s, HBM {hbm / 1e9:.0f} GB/s',
          flush=True)

    # Degraded-pool guard: when the shared chip is time-sliced, every
    # dispatch flattens to the slice granularity (floor observed 50-65 ms vs
    # 4 ms calm) and the calibrated VPU ceiling collapses ~100x — any
    # numbers taken then are meaningless. Refuse to write an artifact.
    if floor > 0.010 or vpu < 0.5e12:
        print(f'# POOL DEGRADED (floor {floor * 1e3:.1f} ms, VPU '
              f'{vpu / 1e12:.2f} TFLOP/s) — aborting without writing '
              f'vpu_roofline.json; rerun on a calm pool', flush=True)
        sys.exit(2)

    rows = []
    skipped = []
    for (hh, c, k, s), count in sorted(b7_depthwise_stages().items(),
                                       key=lambda kv: -kv[0][0]):
        if s != 1:
            skipped.append(f'{BATCH}x{hh}x{hh}x{c} k{k} s2 (x{count})')
            continue
        x = jax.device_put(jnp.ones((BATCH, hh, hh, c), DTYPE))
        w = jax.device_put(jnp.full((k, k, 1, c), 1.0 / (k * k), DTYPE))

        def dwchain(a, b, c=c):
            y = a
            for _ in range(CHAIN):
                y = jax.lax.conv_general_dilated(
                    y, b, (1, 1), 'SAME',
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=c,
                )
            return y

        dt = timed(jax.jit(dwchain), x, w, iters=ITERS, passes=PASSES) / CHAIN
        flops = 2.0 * BATCH * hh * hh * c * k * k
        bytes_moved = 2.0 * x.size * x.dtype.itemsize  # read + write
        row = {
            'shape': f'{BATCH}x{hh}x{hh}x{c} k{k} s1 (x{count} blocks)',
            'ms': round(dt * 1e3, 3),
            'tflops': round(flops / dt / 1e12, 2),
            'gb_s': round(bytes_moved / dt / 1e9, 1),
            'util_vpu': round(flops / dt / vpu, 3),
            'util_hbm': round(bytes_moved / dt / hbm, 3),
            'count': count,
        }
        row['util'] = round(max(row['util_vpu'], row['util_hbm']), 3)
        rows.append(row)
        print(row, flush=True)

    total_ms = sum(r['ms'] * r['count'] for r in rows)
    weighted_util = sum(
        r['util'] * r['ms'] * r['count'] for r in rows) / max(total_ms, 1e-9)
    # headroom: what a PERFECT Pallas depthwise kernel running at the
    # hand-tuned elementwise ceiling would save (shapes already above the
    # ceiling — the convs have k*k-tap ILP — contribute zero)
    saved_ms = sum(
        max(0.0, r['ms'] - (r['tflops'] * r['ms'] / (vpu / 1e12)))
        * r['count'] for r in rows)
    out = {
        'device': str(jax.devices()[0]),
        'dispatch_floor_ms': round(floor * 1e3, 2),
        'pallas_vpu_ceiling_tflops': round(vpu / 1e12, 2),
        'calibrated_hbm_gb_s': round(hbm / 1e9, 1),
        'batch': BATCH, 'input': INPUT, 'chain': CHAIN,
        'rows': rows,
        'skipped_stride2_stages': skipped,
        'total_s1_depthwise_ms_per_block': round(total_ms, 1),
        'time_weighted_roofline_util': round(weighted_util, 3),
        'perfect_pallas_depthwise_would_save_ms_per_block':
            round(saved_ms, 1),
        'saved_fraction_of_depthwise': round(saved_ms / max(total_ms, 1e-9), 3),
        'conclusion': (
            f'a perfect Pallas depthwise kernel at the measured hand-kernel '
            f'VPU ceiling would save {saved_ms:.1f} ms of {total_ms:.1f} ms '
            f's1-depthwise per b{BATCH} block '
            f'({saved_ms / max(total_ms, 1e-9):.0%} of depthwise; several '
            f'XLA conv shapes already exceed the elementwise ceiling) — '
            + ('worth attempting' if saved_ms / max(total_ms, 1e-9) > 0.4
               else 'not worth a custom kernel')),
    }
    path = os.path.join(os.path.dirname(__file__), 'vpu_roofline.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'time_weighted_roofline_util': out[
        'time_weighted_roofline_util']}))


if __name__ == '__main__':
    main()
