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


V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s per chip


def build(arch, encoder, classes, int8=False):
    from octseg.models import create_model
    from octseg.ops.normalize import sigmoid_threshold
    from octseg.ops.quantize import apply_int8
    from octseg.ops.resize import resize_nearest

    model = create_model(arch, encoder, classes=classes, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((BATCH, INPUT, INPUT, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {'params': rng, 'dropout': rng}, imgs
    )

    @jax.jit
    def forward(variables, imgs):
        if int8:  # int8 MXU convs (octseg/ops/quantize.py, opt-in mode)
            logits = apply_int8(model, variables, imgs, train=False)
        else:
            logits = model.apply(variables, imgs, train=False)
        return resize_nearest(sigmoid_threshold(logits), OUT)

    # ONE AOT compile per model: the compiled executable provides both the
    # analytical cost (XLA's own accounting; a bf16 MXU matmul counts each
    # multiply-add as 2 flops) and the benchmark callable — calling the jit
    # wrapper instead would compile each multi-minute program a second time.
    variables = jax.device_put(variables)
    compiled = forward.lower(variables, imgs).compile()
    try:
        flops = float(compiled.cost_analysis().get('flops', 0.0))
    except Exception:
        flops = 0.0
    import sys as _s

    print(f'# built {arch}/{encoder}{" int8" if int8 else ""}',
          file=_s.stderr, flush=True)
    return compiled, variables, flops


def measure_dispatch_floor():
    """Per-dispatch floor (s) of the shared pool: best-of-3 blocks of 8
    trivial jitted dispatches. Calm ≈ 4 ms; a time-sliced pool flattens
    every dispatch to 50-65 ms and makes all numbers meaningless."""
    x = jax.device_put(jnp.ones((8, 8), jnp.float32))
    f = jax.jit(lambda a: a + 1)
    jax.device_get(f(x))  # compile
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(8):
            out = f(x)
        jax.device_get(out)
        best = min(best, (time.perf_counter() - t0) / 8)
    return best


def wait_for_calm_pool(max_wait_s=1200.0, threshold_s=0.012):
    """The shared chip pool is sometimes time-sliced for tens of minutes
    (observed floor 4 -> 50-65 ms). A benchmark taken then records the
    neighbors, not the machine — so wait (bounded) for the floor to drop
    before measuring, and report the floor either way."""
    import sys

    deadline = time.time() + max_wait_s
    floor = measure_dispatch_floor()
    while floor > threshold_s and time.time() < deadline:
        print(f'# pool degraded (dispatch floor {floor * 1e3:.1f} ms) — '
              f'waiting up to {int(deadline - time.time())}s for calm',
              file=sys.stderr, flush=True)
        time.sleep(60)
        floor = measure_dispatch_floor()
    return floor


def main():
    import numpy as np

    from octseg.core.compilecache import enable_compilation_cache

    enable_compilation_cache()  # minutes -> seconds on repeat runs
    fns = [build(*spec) for spec in ENSEMBLE]
    floor = wait_for_calm_pool()
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, INPUT, INPUT, 3), jnp.float32, 0, 255))
    # single-element probe: forcing a host fetch is the only reliable sync on
    # a tunneled device (block_until_ready acks enqueue, not completion)
    probe = jax.jit(lambda m: m[0, 0, 0, 0])

    def sync(out):
        return float(np.asarray(jax.device_get(probe(out))))

    # warmup (compile everything incl. the probe)
    for fn, variables, _flops in fns:
        sync(fn(variables, imgs))

    # Ensemble timing = sum of per-model times. The three models CANNOT
    # overlap on one chip: XLA temp buffers are per-executable and the
    # U-Net++ one alone is 13.5 GB at b128 (memory_analysis, r2) — two
    # different executables in flight OOM the 16 GB chip, so each model is
    # synced before the next. Per model: best-of-PASSES blocks of ITERS
    # back-to-back dispatches (the tunneled chip is a shared pool whose
    # effective speed swings ~20% hour to hour — best-of measures the
    # machine, not the neighbors; the ~30 ms probe RTT is amortized by ITERS).
    import sys

    ITERS, PASSES = 5, 2
    per_model = [float('inf')] * len(fns)
    for _ in range(PASSES):
        for k, (fn, variables, _flops) in enumerate(fns):
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                out = fn(variables, imgs)
            sync(out)
            per_model[k] = min(per_model[k], (time.perf_counter() - t0) / ITERS)
    for (arch, enc, _c), (fn, _v, flops), dt in zip(ENSEMBLE, fns, per_model):
        mfu = flops / dt / V5E_BF16_PEAK if flops else 0.0
        print(f'# {arch}/{enc}: {dt * 1e3:.1f} ms/block '
              f'({BATCH / dt:.1f} f/s, {flops / 1e12:.2f} TFLOP, '
              f'mfu {mfu:.1%})', file=sys.stderr, flush=True)

    dt = sum(per_model)  # seconds per BATCH frames through the full ensemble
    # everything above ran on ONE device (un-sharded device_put lands on
    # device 0), so the per-chip figures must NOT divide by device_count —
    # on a multi-chip host that under-reports by n_chips x. Multi-chip
    # scaling is certified separately (frame-axis sharding in
    # __graft_entry__.dryrun_multichip and the mesh tests).
    fps_per_chip = BATCH / dt
    total_flops = sum(flops for _fn, _v, flops in fns)
    mfu = total_flops / dt / V5E_BF16_PEAK

    # int8 ensemble mode (per-channel weight + dynamic per-tensor activation
    # quantization, octseg/ops/quantize.py): measured in a FRESH SUBPROCESS —
    # the int32 conv outputs inflate XLA temps ~50% over bf16, so the int8
    # executables need the whole chip to themselves (b128 OOMs even solo; it
    # runs at b64). Opt-in via BENCH_INT8=1: the measured result is a NET
    # LOSS vs bf16 on this XLA (benchmarks/int8_ensemble.json — the 1.6x
    # kernel win at MXU-saturating shapes is eaten by quantize/dequantize
    # passes and the b64 memory constraint), so the default driver bench
    # does not spend ~20 min re-measuring it.
    import os as _os

    int8_fps = _int8_subprocess() if _os.environ.get('BENCH_INT8') else 0.0

    train_img_s = bench_training(sync)
    headline = max(fps_per_chip, int8_fps)
    print(json.dumps({
        'metric': 'OCT frames/sec/chip (512^2 3-model ensemble inference)',
        'value': round(headline, 2),
        'unit': 'frames/s/chip',
        'vs_baseline': round(headline / TARGET_FPS_PER_CHIP, 3),
        # which run produced 'value' (the int8 phase runs at b64; 'mfu' is
        # always derived from the bf16 b128 run)
        'headline_mode': (f'int8_b{BATCH // 2}' if int8_fps > fps_per_chip
                          else f'bf16_b{BATCH}'),
        'mfu': round(mfu, 4),
        'bf16_f_s': round(fps_per_chip, 2),
        'int8_f_s': round(int8_fps, 2),
        'int8_speedup': round(int8_fps / fps_per_chip, 3) if int8_fps else 0.0,
        'train_img_s': round(train_img_s, 1),
        'dispatch_floor_ms': round(floor * 1e3, 2),
    }))


def _int8_subprocess() -> float:
    """Run the int8 ensemble phase isolated; returns f/s/chip (0 on failure)."""
    import os
    import subprocess
    import sys

    batch = BATCH // 2  # b128 deterministically OOMs (int32 conv temps)
    try:
        proc = subprocess.run(
            [sys.executable, '-u', os.path.abspath(__file__),
             '--int8-phase', str(batch)],
            capture_output=True, text=True, timeout=2400,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0 and proc.stdout.strip():
            fps = float(json.loads(proc.stdout.strip().splitlines()[-1])
                        ['int8_f_s'])
            print(f'# int8 measured at b{batch} (b{BATCH} OOMs)',
                  file=sys.stderr, flush=True)
            return fps
    except Exception as e:
        print(f'# int8 subprocess failed: {e}', file=sys.stderr, flush=True)
    return 0.0


def int8_phase(batch: int) -> None:
    """Child-process entry: time the int8 ensemble at the given batch."""
    import sys

    import numpy as np

    from octseg.core.compilecache import enable_compilation_cache

    enable_compilation_cache()
    global BATCH
    BATCH = batch
    fns = [build(*spec, int8=True) for spec in ENSEMBLE]
    imgs = jax.device_put(jax.random.uniform(
        jax.random.PRNGKey(1), (batch, INPUT, INPUT, 3), jnp.float32, 0, 255))
    probe = jax.jit(lambda m: m[0, 0, 0, 0])

    def sync(out):
        return float(np.asarray(jax.device_get(probe(out))))

    for spec, (fn, variables, _f) in zip(ENSEMBLE, fns):
        t0 = time.perf_counter()
        sync(fn(variables, imgs))
        print(f'# int8 warm {spec[0]}/{spec[1]}: '
              f'{time.perf_counter() - t0:.0f}s', file=sys.stderr, flush=True)
    per_model = [float('inf')] * len(fns)
    ITERS, PASSES = 5, 2
    for _ in range(PASSES):
        for k, (fn, variables, _f) in enumerate(fns):
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                out = fn(variables, imgs)
            sync(out)
            per_model[k] = min(per_model[k], (time.perf_counter() - t0) / ITERS)
    for (arch, enc, _c), dt8 in zip(ENSEMBLE, per_model):
        print(f'# int8 {arch}/{enc}: {dt8 * 1e3:.1f} ms/block '
              f'({batch / dt8:.1f} f/s)', file=sys.stderr, flush=True)
    print(json.dumps(  # single-device run: already per chip
        {'int8_f_s': round(batch / sum(per_model), 2)}))


def bench_training(sync, batch=16, size=512):
    """Training throughput (img/s): jitted Unet/resnet18 step at 512^2 bf16
    including the fused device augmentation (VERDICT r1 weak #4 — training
    throughput must reach the driver artifact)."""
    import sys

    from octseg.models import create_model
    from octseg.train.state import TrainState, make_optimizer
    from octseg.train.train import make_train_step

    model = create_model('Unet', 'resnet18', classes=4, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (batch, size, size, 3), jnp.float32, 0, 255)
    masks = (jax.random.uniform(rng, (batch, size, size, 4)) > 0.7).astype(jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {'params': rng, 'dropout': rng}, imgs[:1]
    )
    tx = make_optimizer('Adam', 1e-4, 1e-4)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    step = jax.jit(make_train_step(model, use_augmentation=True),
                   donate_argnums=(0,))
    state, metrics = step(state, imgs, masks, jax.random.PRNGKey(1))  # compile
    sync(metrics['loss'][None, None, None, None])
    iters, best = 10, float('inf')
    for p in range(2):  # best-of-2 passes (shared-pool noise, see main())
        t0 = time.perf_counter()
        for i in range(iters):
            state, metrics = step(state, imgs, masks,
                                  jax.random.fold_in(rng, p * iters + i))
        sync(metrics['loss'][None, None, None, None])
        best = min(best, time.perf_counter() - t0)
    img_s = batch * iters / best
    dt = best
    print(f'# train Unet/resnet18 512^2 b{batch} bf16 +aug: '
          f'{dt / iters * 1e3:.0f} ms/step, {img_s:.1f} img/s',
          file=sys.stderr, flush=True)
    return img_s


if __name__ == '__main__':
    import sys as _sys

    if len(_sys.argv) > 2 and _sys.argv[1] == '--int8-phase':
        int8_phase(int(_sys.argv[2]))
    else:
        main()
