"""VPU/HBM roofline evidence for the efficientnet-b7 depthwise stages.

VERDICT r2 (weak #1 / item 3): the claim that LinkNet/efficientnet-b7's
depthwise convolutions already run at the VPU speed-of-light was asserted
from one probe. This script makes it a reproducible artifact.

Methodology — every measured quantity is a CHAIN of ops inside ONE jit
dispatch, because the relay's per-dispatch floor is large and varies
hour-to-hour (measured 4-65 ms); the floor itself is recorded:

1. dispatch floor: a trivial jitted op, timed;
2. VPU ceiling: a long fused multiply-add chain on a VMEM-resident block
   (arithmetic >> floor);
3. HBM ceiling: N chained full passes (y = y + 1) over a buffer far larger
   than VMEM (traffic >> floor);
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

BATCH = 16
INPUT = 512
CHAIN = 32
ITERS, PASSES = 3, 3
DTYPE = jnp.bfloat16


def measure_dispatch_floor():
    x = jax.device_put(jnp.ones((8, 8), DTYPE))
    return timed(jax.jit(lambda a: a + 1), x, iters=8, passes=PASSES)


def calibrate_vpu():
    """Non-foldable elementwise chain on a VMEM-resident block. The chain
    must be NONLINEAR per step (y*y) — a constant multiply-add chain is
    affine and XLA algebraically folds 4096 steps into one (observed)."""
    x = jax.device_put(jnp.full((512, 1024), 0.5, DTYPE))
    reps = 4096

    @jax.jit
    def chain(x):
        y = x
        for _ in range(reps):
            y = y * y + jnp.bfloat16(0.25)  # 2 flops/elem, not foldable
        return y

    dt = timed(chain, x, iters=ITERS, passes=PASSES)
    return 2.0 * reps * x.size / dt


def calibrate_hbm():
    """64 chained full passes over a 512 MB buffer (read+write each)."""
    x = jax.device_put(jnp.ones((256, 1024, 1024), DTYPE))  # 512 MB bf16
    reps = 48

    @jax.jit
    def chain(x):
        y = x
        for _ in range(reps):
            y = y + jnp.bfloat16(1.0)
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
    out = {
        'device': str(jax.devices()[0]),
        'dispatch_floor_ms': round(floor * 1e3, 2),
        'calibrated_vpu_tflops': round(vpu / 1e12, 2),
        'calibrated_hbm_gb_s': round(hbm / 1e9, 1),
        'batch': BATCH, 'input': INPUT, 'chain': CHAIN,
        'rows': rows,
        'skipped_stride2_stages': skipped,
        'total_s1_depthwise_ms_per_b16_block': round(total_ms, 1),
        'time_weighted_roofline_util': round(weighted_util, 3),
        'conclusion': (
            'stride-1 depthwise stages at/near the measured roofline — no '
            'headroom without an algorithm change' if weighted_util > 0.7
            else 'headroom exists below the roofline — a Pallas depthwise '
                 'kernel is worth attempting'),
    }
    path = os.path.join(os.path.dirname(__file__), 'vpu_roofline.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'time_weighted_roofline_util': out[
        'time_weighted_roofline_util']}))


if __name__ == '__main__':
    main()
