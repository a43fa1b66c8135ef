"""As-deployed ensemble benchmark: the reference product's exact shapes.

bench.py's headline (BASELINE.json metric) runs all three models at 512² —
but the reference DEPLOYS them at mixed sizes: LM (U-Net++/resnet101) at
512, FC_LC (LinkNet/efficientnet-b7) and VV (U-Net/timm-regnetx_064) at
896 (reference eval/training/{Fibrous cap,Vasa vasorum}/fold_1/config.json),
with 1000² output masks (reference configs/predict.yaml:8). This measures
that deployment shape on one chip, bf16, on-device sigmoid-threshold +
NEAREST resize to 1000² — i.e. the per-frame cost a user of the deployed
reference ensemble would actually pay here.

Block sizes are probed per model: largest power-of-two whose XLA temp+arg
memory fits the 16 GB chip with headroom (896² temps are ~3x the 512² ones).

Writes benchmarks/ensemble_deployed.json:
  per-model ms/block + f/s + MFU at its deployed input size,
  ensemble frames/s/chip (1 / sum(per-frame times)),
  and an end-to-end 500-frame pullback estimate.
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

OUT = (1000, 1000)
V5E_BF16_PEAK = 197e12
HBM_BUDGET = 13.5 * 2 ** 30  # leave ~2.5 GB headroom on the 16 GB chip

# (name, arch, encoder, classes, deployed input size, candidate blocks)
SPECS = [
    ('LM', 'UnetPlusPlus', 'resnet101', 1, 512, (128, 96, 64)),
    ('FC_LC', 'LinkNet', 'efficientnet-b7', 2, 896, (64, 32, 16)),
    ('VV', 'Unet', 'timm-regnetx_064', 1, 896, (64, 32, 16)),
]


def build(arch, enc, classes, size, blocks):
    from octseg.models import create_model
    from octseg.ops.normalize import sigmoid_threshold
    from octseg.ops.resize import resize_nearest

    model = create_model(arch, enc, classes=classes, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.device_put(jax.jit(
        functools.partial(model.init, train=False))(
        {'params': rng, 'dropout': rng},
        jnp.zeros((1, size, size, 3), jnp.float32)))

    def fwd(v, x):
        return resize_nearest(
            sigmoid_threshold(model.apply(v, x, train=False)), OUT)

    for b in blocks:
        imgs = jnp.zeros((b, size, size, 3), jnp.float32)
        compiled = jax.jit(fwd).lower(variables, imgs).compile()
        mem = compiled.memory_analysis()
        need = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes)
        print(f'# {arch}/{enc}@{size} b{b}: temps '
              f'{mem.temp_size_in_bytes / 2**30:.1f} GB, total need '
              f'{need / 2**30:.1f} GB', file=sys.stderr, flush=True)
        if need <= HBM_BUDGET:
            flops = float(compiled.cost_analysis().get('flops', 0.0))
            return compiled, variables, b, flops
    raise RuntimeError(f'no candidate block fits for {arch}/{enc}@{size}')


def main():
    from octseg.core.compilecache import enable_compilation_cache

    enable_compilation_cache()
    rows = []
    per_frame_s = 0.0
    total_flops_per_frame = 0.0
    built = []
    for name, arch, enc, classes, size, blocks in SPECS:
        compiled, variables, b, flops = build(arch, enc, classes, size, blocks)
        built.append((name, arch, enc, size, compiled, variables, b, flops))

    # measure after all compiles, on a calm pool (bench.py's gate)
    from bench import wait_for_calm_pool  # noqa: E402

    floor = wait_for_calm_pool()
    for name, arch, enc, size, compiled, variables, b, flops in built:
        x = jax.device_put(jax.random.uniform(
            jax.random.PRNGKey(1), (b, size, size, 3), jnp.float32, 0, 255))
        dt = timed(compiled, variables, x, iters=4, passes=2)
        mfu = flops / dt / V5E_BF16_PEAK if flops else 0.0
        row = {
            'model': name, 'spec': f'{arch}/{enc}', 'input': size,
            'block': b, 'ms_per_block': round(dt * 1e3, 1),
            'f_s': round(b / dt, 1), 'mfu': round(mfu, 3),
            'tflop_per_block': round(flops / 1e12, 2),
        }
        print(f'# {row}', file=sys.stderr, flush=True)
        rows.append(row)
        per_frame_s += dt / b
        total_flops_per_frame += flops / b

    fps = 1.0 / per_frame_s
    out = {
        'device': str(jax.devices()[0]),
        'shapes': 'LM@512 + FC_LC@896 + VV@896 -> 1000^2 masks (deployed)',
        'rows': rows,
        'ensemble_f_s_chip': round(fps, 2),
        'ensemble_mfu': round(
            total_flops_per_frame * fps / V5E_BF16_PEAK, 4),
        'e2e_500_frame_estimate_s': round(500 * per_frame_s, 2),
        'dispatch_floor_ms': round(floor * 1e3, 2),
        'note': ('compute-only (device-resident blocks, on-device postproc '
                 'to 1000^2); host decode/encode measured separately in '
                 'e2e_pullback.json. The 512^2 headline in BENCH_r*.json '
                 'stays the driver metric per BASELINE.json.'),
    }
    path = os.path.join(os.path.dirname(__file__), 'ensemble_deployed.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'ensemble_f_s_chip': out['ensemble_f_s_chip'],
                      'e2e_500_frame_estimate_s':
                          out['e2e_500_frame_estimate_s']}))


if __name__ == '__main__':
    main()
