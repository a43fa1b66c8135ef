"""Where the ensemble's non-MXU time goes — encoder/decoder split and
block-size scaling for the three winning models.

Round-3 findings this script reproduces (benchmarks/ensemble_breakdown.json):

- U-Net++/resnet101 b128 @512: decoder 52.8 TFLOP at ~65% MFU (the dense
  skip grid is MXU-friendly), encoder 10.3 TFLOP at ~49% (stem + early
  low-channel stages are HBM-bound) — the 59-62% whole-model MFU is a
  FLOPs-weighted mix, not one fixable stage.
- Larger blocks do not help the lighter models: LinkNet/eff-b7 is flat
  b128->b256 (VPU/HBM-bound depthwise, see vpu_roofline.json) and
  U-Net/regnetx_064 gains ~9% model-level = ~1.5% ensemble, for 11.5 GB
  of temps (vs 5.8 at b128) — not worth the resident-memory pressure.
- The residual gap to 100% MFU is structural (low-channel HBM-bound
  stages, BN/elementwise epilogues, pad/concat traffic), consistent with
  the roofline artifact; no single addressable stage remains.

Writes benchmarks/ensemble_breakdown.json.
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
from octseg.models import create_model  # noqa: E402

S = 512
V5E_BF16_PEAK = 197e12
SPECS = [
    ('UnetPlusPlus', 'resnet101', 1, (128,)),
    ('LinkNet', 'efficientnet-b7', 2, (128, 256)),
    ('Unet', 'timm-regnetx_064', 1, (128, 256)),
]


def bench_model(arch, enc, classes, batch):
    model = create_model(arch, enc, classes=classes, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((batch, S, S, 3), jnp.float32)
    variables = jax.device_put(jax.jit(
        functools.partial(model.init, train=False))(
        {'params': rng, 'dropout': rng}, imgs[:1]))

    def fwd(v, x):
        return model.apply(v, x, train=False)

    def encode(v, x):
        return model.apply(v, x, train=False, method=model.encode)[-1]

    x = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (batch, S, S, 3), jnp.float32, 0, 255))
    row = {'model': f'{arch}/{enc}', 'batch': batch}
    full = jax.jit(fwd).lower(variables, imgs).compile()
    row['temp_gb'] = round(
        full.memory_analysis().temp_size_in_bytes / 2 ** 30, 1)
    t_full = timed(full, variables, x, iters=3, passes=3)
    fl_full = float(full.cost_analysis().get('flops', 0.0))
    row['full_ms'] = round(t_full * 1e3, 1)
    row['f_s'] = round(batch / t_full, 1)
    row['mfu'] = round(fl_full / t_full / V5E_BF16_PEAK, 3)
    if batch == 128:  # split once, at the production block size
        encc = jax.jit(encode).lower(variables, imgs).compile()
        t_enc = timed(encc, variables, x, iters=3, passes=3)
        fl_enc = float(encc.cost_analysis().get('flops', 0.0))
        row['encoder_ms'] = round(t_enc * 1e3, 1)
        row['encoder_mfu'] = round(fl_enc / t_enc / V5E_BF16_PEAK, 3)
        # decoder time is a SUBTRACTION of two independent measurements on
        # a shared pool (~20% swing): a degraded window between the two can
        # make it meaningless — refuse rather than record nonsense
        if t_full > t_enc * 1.05:
            row['decoder_ms'] = round((t_full - t_enc) * 1e3, 1)
            row['decoder_mfu'] = round(
                (fl_full - fl_enc) / (t_full - t_enc) / V5E_BF16_PEAK, 3)
        else:
            row['decoder_ms'] = None
            row['note'] = ('full/encoder timings inconsistent (pool noise '
                           'between the two measurements) — rerun')
    print(row, flush=True)
    return row


def main():
    rows = []
    for arch, enc, classes, batches in SPECS:
        for b in batches:
            rows.append(bench_model(arch, enc, classes, b))
    out = {
        'device': str(jax.devices()[0]),
        'input': S,
        'rows': rows,
        'conclusion': (
            'no single addressable stage: U-Net++ decoder already ~65% MFU, '
            'encoder gap is HBM-bound low-channel stages, larger blocks are '
            'flat (LinkNet) or +1.5% ensemble for 2x temps (Unet)'),
    }
    path = os.path.join(os.path.dirname(__file__), 'ensemble_breakdown.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps({'rows': len(rows)}))


if __name__ == '__main__':
    main()
