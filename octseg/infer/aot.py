"""AOT-exported inference programs: serving cold starts without tracing.

The persistent compile cache (octseg.core.compilecache) removes the
XLA-compile phase of an engine cold start but cannot remove flax tracing +
StableHLO lowering (~27 s for the ensemble, benchmarks/compile_cache.json).
This module exports the engine's forward programs to disk in two flavors:
the COMPILED PJRT executable (``jax.experimental.serialize_executable``) —
loading skips Python model construction, tracing, lowering AND the XLA
compile, so a serving process is compute-ready right after weights land —
and serialized StableHLO (``jax.export``) as the portable fallback for a
different device kind (first call recompiles). The reference has no analog
(torch rebuilds its eager graph per process and cuDNN ships precompiled
kernels); this is the idiomatic JAX/TPU serving path.

Artifacts live in ``<model_dir>/aot/<key-hash>.{jaxexp,json}``; the hash
covers everything that shapes the program (model manifest, block/frame
shapes, output size, dtypes, mesh shape, jax version, octseg version), so
a stale export can only be hit by an identical configuration. Exports are
BUILD ARTIFACTS: re-run ``python -m octseg.infer.aot`` after changing
model code or upgrading jax (the jax-version key mismatch then skips them).
Opt out at serve time with ``OCTSEG_AOT=0``.

Usage:
    python -m octseg.infer.aot [models_dir=...] [classes=[...]] ...
        (config: configs/export_aot.yaml)
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
from typing import Optional, Tuple

import jax

import octseg

log = logging.getLogger(__name__)

AOT_DIRNAME = 'aot'


def _enabled() -> bool:
    return os.environ.get('OCTSEG_AOT', '1') not in ('0', 'false', 'off')


def make_key(model_cfg: dict, fn_key: tuple, frame_shape: tuple, dtype,
             block: int, mesh_shape: tuple, compute_dtype, int8: bool) -> dict:
    """Everything that determines the exported program, as a JSON-able dict."""
    import numpy as np

    return {
        'manifest': {k: model_cfg.get(k) for k in
                     ('architecture', 'encoder', 'input_size', 'classes',
                      'normalize')},
        'fn_key': list(fn_key),
        'frame_shape': list(frame_shape[1:]),  # per-frame (the block is keyed)
        # np.dtype canonicalizes the engine's mixed currency (np dtypes from
        # arrays, jnp scalar types from code) to one name
        'dtype': np.dtype(dtype).name,
        'block': int(block),
        'mesh_shape': list(mesh_shape),
        'compute_dtype': (np.dtype(compute_dtype).name if compute_dtype
                          else 'float32'),
        'int8': bool(int8),
        # exports are per-device-kind: a .jaxexp exported on one platform
        # must not be hit on another (it would bypass the HBM probe with a
        # possibly-null stored memory need, and same-version cross-platform
        # exports would overwrite each other at the same hash)
        'platform': jax.devices()[0].platform,
        'device_kind': jax.devices()[0].device_kind,
        'jax': jax.__version__,
        'octseg': getattr(octseg, '__version__', '0'),
    }


def _key_hash(key: dict) -> str:
    blob = json.dumps(key, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _paths(model_dir: str, key: dict) -> Tuple[str, str]:
    h = _key_hash(key)
    d = os.path.join(model_dir, AOT_DIRNAME)
    return os.path.join(d, f'{h}.jaxexp'), os.path.join(d, f'{h}.json')


def save_exported(model_dir: str, key: dict, fn, variables,
                  block_shape: tuple, dtype, memory_need: Optional[int],
                  compiled=None) -> str:
    """Export the jitted ``fn(variables, block)`` at the given block shape
    and write it (plus its key/metadata) under ``<model_dir>/aot/``.

    Two artifact flavors:
    - ``.jaxexp`` — serialized StableHLO (``jax.export``): portable across
      devices of a topology, but the first call still pays the XLA compile
      (the persistent compile cache does not key deserialized modules the
      same as traced ones, so serving may recompile from scratch).
    - ``.pjrtexe`` — the COMPILED PJRT executable
      (``jax.experimental.serialize_executable``), written when ``compiled``
      is given and the backend supports it: loading skips tracing AND
      compilation entirely, so a serving process is compute-ready after
      weights upload. Device-specific — gated at load time on the exact
      platform/device kind it was built for.
    """
    import pickle

    from jax import export as jax_export

    var_avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    sample = jax.ShapeDtypeStruct(tuple(block_shape), dtype)
    exp = jax_export.export(fn)(var_avals, sample)
    blob_path, meta_path = _paths(model_dir, key)
    os.makedirs(os.path.dirname(blob_path), exist_ok=True)
    with open(blob_path, 'wb') as f:
        f.write(exp.serialize())
    meta = {'key': key, 'memory_need_bytes': memory_need}
    # TPU only: XLA:CPU executables deserialize but fail at dispatch in this
    # jaxlib ("Buffer Definition Event: ... not found", cpu_aot_loader also
    # warns on machine-feature mismatch) — CPU serving uses the StableHLO
    # flavor + persistent compile cache instead
    if compiled is not None and jax.devices()[0].platform.lower() == 'tpu':
        try:
            from jax.experimental import serialize_executable as se

            ser, in_tree, out_tree = se.serialize(compiled)
            with open(blob_path[: -len('jaxexp')] + 'pjrtexe', 'wb') as f:
                pickle.dump((ser, in_tree, out_tree), f)
            dev = jax.devices()[0]
            meta['exe'] = {'platform': dev.platform,
                           'device_kind': dev.device_kind}
        except Exception as e:  # backend without executable serialization
            log.info('PJRT executable not serializable here (%s) — '
                     'StableHLO export only', str(e).splitlines()[0][:120])
    with open(meta_path, 'w') as f:
        json.dump(meta, f, indent=2)
    log.info('AOT export: %s (block %d%s)', blob_path, key['block'],
             ', compiled executable' if 'exe' in meta else '')
    return blob_path


def load_runner(model_dir: str, key: dict, budget: Optional[int] = None,
                block_divides: Optional[int] = None,
                ) -> Optional[Tuple[int, object]]:
    """(block, runner) for a previously exported program matching ``key``
    (sans 'block', which the artifact itself supplies), or None. A stored
    memory need above the current budget refuses the hit — the engine then
    sizes blocks normally. ``block_divides`` rejects artifacts whose block
    does not divide it BEFORE paying the deserialize/device-load (the
    engine's chunked slicing needs per-model blocks dividing its block)."""
    if not _enabled():
        return None
    aot_dir = os.path.join(model_dir, AOT_DIRNAME)
    if not os.path.isdir(aot_dir):
        return None
    want = {k: v for k, v in key.items() if k != 'block'}
    for fname in sorted(os.listdir(aot_dir)):
        if not fname.endswith('.json'):
            continue
        try:
            with open(os.path.join(aot_dir, fname)) as f:
                meta = json.load(f)
            stored = meta.get('key', {})
            if {k: v for k, v in stored.items() if k != 'block'} != want:
                continue
            if block_divides is not None and (
                    stored['block'] > block_divides
                    or block_divides % stored['block']):
                log.info('AOT %s: block %d incompatible with engine block '
                         '%d — skipping', fname, stored['block'],
                         block_divides)
                continue
            need = meta.get('memory_need_bytes')
            if budget is not None and need is not None and need > budget:
                log.info('AOT %s: stored memory need %.1f GiB exceeds the '
                         'current budget — skipping', fname, need / 2 ** 30)
                continue
            # compiled-executable flavor first: skips XLA compile entirely,
            # valid only on the exact device kind it was built for
            exe_meta = meta.get('exe')
            exe_path = os.path.join(aot_dir, fname[:-5] + '.pjrtexe')
            if exe_meta and os.path.exists(exe_path):
                dev = jax.devices()[0]
                if (exe_meta.get('platform') == dev.platform
                        and exe_meta.get('device_kind') == dev.device_kind):
                    try:
                        import pickle

                        from jax.experimental import \
                            serialize_executable as se

                        with open(exe_path, 'rb') as f:
                            ser, in_tree, out_tree = pickle.load(f)
                        loaded = se.deserialize_and_load(ser, in_tree,
                                                         out_tree)
                        log.info('AOT hit (compiled executable): %s '
                                 '(block %d)', exe_path, stored['block'])
                        return int(stored['block']), loaded
                    except Exception as e:
                        log.warning('AOT executable %s unusable (%s) — '
                                    'trying the StableHLO export',
                                    exe_path, str(e).splitlines()[0][:120])
            blob_path = os.path.join(aot_dir, fname[:-5] + '.jaxexp')
            from jax import export as jax_export

            with open(blob_path, 'rb') as f:
                exp = jax_export.deserialize(f.read())
            log.info('AOT hit: %s (block %d)', blob_path, stored['block'])
            return int(stored['block']), exp.call
        except Exception as e:  # corrupt/incompatible artifact: never fatal
            log.warning('AOT artifact %s unusable (%s) — ignoring',
                        fname, str(e).splitlines()[0][:120])
    return None


def main(cfg=None, overrides=None) -> None:
    """Export AOT artifacts for every model routed by ``classes``."""
    from octseg.core.config import entry_point

    @entry_point('export_aot')
    def _main(cfg) -> None:
        from octseg.infer.engine import MODELS_META, InferenceEngine

        models_dir = cfg.models_dir if os.path.isabs(cfg.models_dir) \
            else os.path.join(octseg.PROJECT_DIR, cfg.models_dir)
        engine = InferenceEngine(
            models_dir=models_dir,
            classes=list(cfg.classes),
            block_size=int(cfg.get('block_size', 128)),
            bf16=bool(cfg.get('bf16', False)),
            int8=bool(cfg.get('int8', False)),
        )
        frame_hw = cfg.get('frame_size', None)
        for model_dir_name in dict.fromkeys(
                MODELS_META[c]['model_dir'] for c in cfg.classes):
            # the images/PIL variant (predict.py, the app) ...
            for path in engine.export_aot(
                    model_dir_name, cfg.output_size, frame_hw=None):
                log.info('exported %s', path)
            if frame_hw:  # ... and the device-preprocess pullback variant
                for path in engine.export_aot(
                        model_dir_name, cfg.output_size, frame_hw=frame_hw):
                    log.info('exported %s', path)

    _main(cfg, overrides)


if __name__ == '__main__':
    main()
