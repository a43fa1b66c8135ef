"""Serving cold start: traced vs persistent-cache vs AOT-exported engine.

Measures time-to-ready for a fresh InferenceEngine process on the real
ensemble configs (U-Net++/resnet101, LinkNet/efficientnet-b7,
U-Net/timm-regnetx_064 at their manifest input sizes, bf16, b128 blocks,
1000x1000 pullback frames — the production serving shape), split into:

  weights_s  — checkpoint read + device upload (identical across modes)
  program_s  — _forward_fn + _block_for: trace + lower + XLA compile
               (traced), cache-hit compile (cache), or jax.export
               deserialize (aot)
  first_block_s — one executed block (proves the program runs)

Modes share one persistent-cache dir, run in order: traced (populates the
cache), cache, aot (after an export child). Writes aot_cold_start.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root

ENSEMBLE = [
    ('LM', 'UnetPlusPlus', 'resnet101', ['Lumen'], 512),
    ('FC_LC', 'LinkNet', 'efficientnet-b7', ['Lipid core', 'Fibrous cap'], 896),
    ('VV', 'Unet', 'timm-regnetx_064', ['Vasa vasorum'], 896),
]
CLASSES = ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum']
FRAME_HW = (1000, 1000)
OUT = (1000, 1000)
BLOCK = 128


def make_model_dirs(root: str) -> None:
    from octseg.train.checkpoint import initialize_model_dir

    for name, arch, encoder, classes, input_size in ENSEMBLE:
        initialize_model_dir(
            os.path.join(root, name), classes, arch=arch, encoder=encoder,
            input_size=input_size, seed=1, init_size=64)
        print(f'# model dir {name} ({arch}/{encoder})',
              file=sys.stderr, flush=True)


def child_export(models_dir: str) -> None:
    from octseg.infer.engine import MODELS_META, InferenceEngine

    engine = InferenceEngine(models_dir, classes=CLASSES,
                             block_size=BLOCK, bf16=True)
    for name in dict.fromkeys(MODELS_META[c]['model_dir'] for c in CLASSES):
        engine.export_aot(name, OUT, frame_hw=FRAME_HW)
    print(json.dumps({'export': 'ok'}))


def child_measure(models_dir: str) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from octseg.infer.engine import MODELS_META, InferenceEngine

    engine = InferenceEngine(models_dir, classes=CLASSES,
                             block_size=BLOCK, bf16=True)
    t0 = time.perf_counter()
    for name in dict.fromkeys(MODELS_META[c]['model_dir'] for c in CLASSES):
        engine._bundle(name)
        # device upload happens inside _forward_fn; force it here so
        # weights_s isolates IO+transfer from program prep
        engine._forward_fn(name, *OUT, device_preprocess=True)
    weights_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    runners = {}
    for name in dict.fromkeys(MODELS_META[c]['model_dir'] for c in CLASSES):
        fn, variables, _cfg = engine._forward_fn(
            name, *OUT, device_preprocess=True)
        runners[name] = (engine._block_for(
            name, fn, variables, (BLOCK, *FRAME_HW, 3), jnp.uint8,
            fn_key=(*OUT, True)), fn, variables)
    program_s = time.perf_counter() - t1

    from octseg.parallel.sharding import batch_sharding

    # the engine's batch sharding + jitted slicer: an eager slice of an
    # unsharded upload would make the compiled/AOT runner reject its input
    # on a multi-device mesh and first_block_s would silently measure the
    # jit-fallback recompile (see engine.segment_pullback's slicer note)
    frames = jax.device_put(
        jnp.asarray(np.zeros((BLOCK, *FRAME_HW, 3), np.uint8)),
        batch_sharding(engine.mesh))
    # sync: device_put is async — without this the 384 MB relay upload
    # lands inside first_block_s and swamps the mode differences
    jax.block_until_ready(frames)
    t2 = time.perf_counter()
    for name, ((bs, runner), fn, variables) in runners.items():
        chunk = engine._slicer(bs)(frames, 0)
        out = engine._run(runner, fn, variables, chunk)
        np.asarray(jax.device_get(out[0, 0, 0, 0]))
    first_block_s = time.perf_counter() - t2

    # Pool-contention context: the r4 artifact recorded cache-mode
    # first_block_s 136 s vs traced 33 s for the SAME executed programs —
    # only explicable as shared-pool noise if the floor differs between the
    # child processes. Record it so every mode row carries its own weather.
    from bench import measure_dispatch_floor

    floor_ms = round(measure_dispatch_floor() * 1e3, 1)
    # second executed block: steady-state execution with the weather it ran
    # under, separating "first execution is special" from "the pool was slow"
    t3 = time.perf_counter()
    for name, ((bs, runner), fn, variables) in runners.items():
        chunk = engine._slicer(bs)(frames, 0)
        out = engine._run(runner, fn, variables, chunk)
        np.asarray(jax.device_get(out[0, 0, 0, 0]))
    second_block_s = time.perf_counter() - t3
    print(json.dumps({
        'weights_s': round(weights_s, 2),
        'program_s': round(program_s, 2),
        'first_block_s': round(first_block_s, 2),
        'second_block_s': round(second_block_s, 2),
        'dispatch_floor_ms': floor_ms,
        'ready_s': round(weights_s + program_s + first_block_s, 2),
    }))


def run_child(mode: str, models_dir: str, cache_dir: str, aot: bool) -> dict:
    env = dict(os.environ,
               OCTSEG_COMPILE_CACHE=cache_dir,
               OCTSEG_AOT='1' if aot else '0')
    proc = subprocess.run(
        [sys.executable, '-u', os.path.abspath(__file__), '--child', mode,
         models_dir],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise SystemExit(f'{mode} child failed:\n{proc.stderr[-2000:]}')
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    print(f'# {mode}: {out}', file=sys.stderr, flush=True)
    return out


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == '--child':
        mode, models_dir = sys.argv[2], sys.argv[3]
        from octseg.core.compilecache import enable_compilation_cache

        enable_compilation_cache()
        if mode == 'export':
            child_export(models_dir)
        else:
            child_measure(models_dir)
        return

    with tempfile.TemporaryDirectory(prefix='octseg-aot-bench-') as tmp:
        models_dir = os.path.join(tmp, 'models')
        make_model_dirs(models_dir)
        cache_dir = os.path.join(tmp, 'xla-cache')
        results = {}
        results['traced'] = run_child('measure', models_dir, cache_dir, False)
        # two cache-mode children: the r4 anomaly (cache slower than traced)
        # must repeat across both to be structural rather than pool weather
        results['cache'] = run_child('measure', models_dir, cache_dir, False)
        results['cache2'] = run_child('measure', models_dir, cache_dir, False)
        run_child('export', models_dir, cache_dir, False)
        results['aot'] = run_child('measure', models_dir, cache_dir, True)

    import jax

    result = {
        'device': str(jax.devices()[0]),
        'config': f'3-model ensemble, bf16, b{BLOCK}, {FRAME_HW[0]}px frames '
                  f'(device-preprocess pullback path)',
        'modes': results,
        'speedup_ready': round(results['traced']['ready_s']
                               / results['aot']['ready_s'], 2),
        'note': 'traced = cold process, empty cache; cache = fresh process, '
                'warm persistent compile cache; aot = fresh process loading '
                'serialized COMPILED executables (.pjrtexe — no tracing, no '
                'XLA compile; StableHLO .jaxexp is the portable fallback) '
                '+ warm cache',
    }
    out_path = os.path.join(HERE, 'aot_cold_start.json')
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
