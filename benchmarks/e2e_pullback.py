"""End-to-end pullback benchmark: DICOM → ensemble masks wall time.

The north-star (BASELINE.json): 500-frame pullback DICOM→ensemble-mask in
< 2 s on a v5e-8. This script measures the full path on the available chips —
DICOM parse + pixel decode, device upload, on-device preprocessing (BGR swap +
bilinear resize fused into the forward block), 3-model ensemble forward,
thresholding and output-size resize — and reports a per-chip-scaled estimate.

Usage: python benchmarks/e2e_pullback.py [n_frames] [frame_size]
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: repo-root import without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    frame_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    import jax

    from octseg.data import dicom
    from octseg.infer.engine import InferenceEngine
    from octseg.train.checkpoint import initialize_model_dir

    # synthetic pullback DICOM + randomly-initialized winning-config models
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, frame_size, frame_size, 3), np.uint8)
    tmp = tempfile.mkdtemp()
    dcm_path = os.path.join(tmp, 'IMG001')
    dicom.dcmwrite(dcm_path, frames)

    # init_size=64: full-size init is a multi-minute XLA compile that buys
    # nothing for randomly-initialized benchmark weights
    initialize_model_dir(os.path.join(tmp, 'LM'), ['Lumen'],
                         arch='UnetPlusPlus', encoder='resnet101',
                         input_size=512, init_size=64)
    initialize_model_dir(os.path.join(tmp, 'FC_LC'), ['Lipid core', 'Fibrous cap'],
                         arch='LinkNet', encoder='efficientnet-b7',
                         input_size=512, init_size=64)
    initialize_model_dir(os.path.join(tmp, 'VV'), ['Vasa vasorum'],
                         arch='Unet', encoder='timm-regnetx_064',
                         input_size=512, init_size=64)

    engine = InferenceEngine(tmp, classes=[
        'Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum',
    ], bf16=True)
    # warmup / compile outside the timed region (deployments keep compiled fns)
    ds = dicom.dcmread(dcm_path)
    warm = ds.pixel_array[: engine.block_size]
    engine.segment_pullback(warm, output_size=[frame_size, frame_size])

    # (a) host DICOM parse + pixel decode
    t0 = time.perf_counter()
    ds = dicom.dcmread(dcm_path)
    pixels = ds.pixel_array
    t_decode = time.perf_counter() - t0

    # (b) upload + device compute. NOTE: on this rig the chip sits behind a
    # network relay (~50 MB/s host→device), so the upload component is NOT
    # representative of production PCIe; it is reported separately.
    import jax.numpy as jnp

    from octseg.parallel.sharding import batch_sharding

    t0 = time.perf_counter()
    bs_engine = engine.block_size
    n_pad = ((n_frames + bs_engine - 1) // bs_engine) * bs_engine
    padded = np.concatenate(
        [pixels, np.zeros((n_pad - n_frames, *pixels.shape[1:]), pixels.dtype)]
    ) if n_pad != n_frames else np.asarray(pixels)
    # the engine's batch sharding — an unsharded upload + eager slice would
    # make the compiled runner reject its input on a multi-device mesh and
    # (c) would silently measure jit-fallback recompiles
    dev_all = jax.device_put(jnp.asarray(padded), batch_sharding(engine.mesh))
    _ = float(np.asarray(jax.device_get(dev_all[0, 0, 0, 0])))
    t_upload = time.perf_counter() - t0

    t0 = time.perf_counter()
    masks = engine.segment_pullback(np.asarray(pixels), output_size=[frame_size, frame_size])
    t_segment = time.perf_counter() - t0

    # (b2) grayscale-replicated pullback: common for raw (non-colormapped)
    # OCT sources — engine uploads one channel (3x less) and broadcasts on
    # device (segment_pullback mono path)
    gray = np.repeat(pixels[..., :1], 3, axis=-1)
    engine.segment_pullback(gray[: engine.block_size],
                            output_size=[frame_size, frame_size])  # compile
    t0 = time.perf_counter()
    masks_gray = engine.segment_pullback(
        gray, output_size=[frame_size, frame_size])
    t_segment_gray = time.perf_counter() - t0
    assert masks_gray.shape == masks.shape
    del masks_gray, gray

    # (b3) streaming mode (engine.iter_pullback): bounded host memory, the
    # next block's relay upload overlaps the current block's compute, masks
    # stream out per block
    for _start, _block in engine.iter_pullback(  # compile/size programs
            np.asarray(pixels[: engine.block_size]),
            output_size=[frame_size, frame_size]):
        pass
    t0 = time.perf_counter()
    done = 0
    for _start, block in engine.iter_pullback(
            np.asarray(pixels), output_size=[frame_size, frame_size]):
        done += block.shape[0]
    t_stream = time.perf_counter() - t0
    assert done == n_frames

    # (c) compute-only: frames already device-resident, outputs probe-synced
    # (mask download excluded — negligible over PCIe, ~11 MB/s over this
    # relay). Per-model blocks + a sync per model: different executables'
    # temp buffers cannot coexist in HBM (see engine._block_for).
    probe = jax.jit(lambda m: m[0, 0, 0, 0])
    t_compute = 0.0
    for model_dir_name in ('LM', 'FC_LC', 'VV'):
        fn, variables, _ = engine._forward_fn(
            model_dir_name, frame_size, frame_size, device_preprocess=True
        )
        bs, runner = engine._block_for(
            model_dir_name, fn, variables, (bs_engine, *padded.shape[1:]),
            dev_all.dtype, extra_resident=padded.nbytes,
        )
        out = engine._run(runner, fn, variables,
                          engine._slicer(bs)(dev_all, 0))  # warm
        _ = float(np.asarray(jax.device_get(probe(out))))
        t0 = time.perf_counter()
        for start in range(0, n_pad, bs):
            out = engine._run(runner, fn, variables,
                              engine._slicer(bs)(dev_all, start))
        _ = float(np.asarray(jax.device_get(probe(out))))
        t_compute += time.perf_counter() - t0

    # relay rates measured in-run so the artifact is self-calibrating (the
    # shared pool swings 3x+ between sessions): upload from (b), download by
    # fetching the last block's packed masks
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    fetched = np.asarray(out)
    t_down = time.perf_counter() - t0
    down_rate = fetched.nbytes / max(t_down, 1e-9) / 1e6
    up_rate = padded.nbytes / max(t_upload, 1e-9) / 1e6

    # host-side share of segment wall time: expansion of one fetched block
    # into the float32 result, scaled to the full pullback (single-core
    # rig). Two paths measured: the native expand-and-route pass the engine
    # actually uses (octseg/native/unpack.cc) and the numpy fallback it
    # replaced (unpackbits intermediate + strided channel scatter). The
    # result allocation happens ONCE per pullback, not per block — keep it
    # outside the timed region (and pre-touch it: first-touch page faults
    # belong to the allocation, not the expansion).
    from octseg.ops.bitpack import _unpack_route_numpy, unpack_route_into

    sink = np.full((fetched.shape[0], frame_size, frame_size, 4), 0.0,
                   np.float32)
    sink[:] = 1.0  # touch pages
    t0 = time.perf_counter()
    unpack_route_into(fetched, sink, [(0, 0)])
    t_native_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    _unpack_route_numpy(fetched, sink, [(0, 0)])
    t_numpy_block = time.perf_counter() - t0
    # measured one channel for one block; the pullback expands 4 routed
    # channels (LM 1 + FC_LC 2 + VV 1) for every block of n_pad frames
    scale = 4 * n_pad / fetched.shape[0]
    host_unpack_native_s = t_native_block * scale
    host_unpack_numpy_s = t_numpy_block * scale

    n_chips = jax.device_count()
    out = {
        'n_frames': n_frames,
        'frame_size': frame_size,
        'n_chips': n_chips,
        'dicom_decode_s': round(t_decode, 3),
        'relay_upload_s': round(t_upload, 3),
        'segment_s_incl_relay_transfers': round(t_segment, 3),
        'segment_s_gray_pullback': round(t_segment_gray, 3),
        'segment_s_streaming': round(t_stream, 3),
        # masks cross the relay bitpacked, 8 px/byte (octseg/ops/bitpack.py)
        'mask_bytes_downloaded': int(  # LM 1ch + FC_LC 2ch + VV 1ch, padded
            4 * n_pad * frame_size * ((frame_size + 7) // 8)),
        'mask_bytes_unpacked_equiv': int(4 * n_pad * frame_size * frame_size),
        'relay_upload_MB_s': round(up_rate, 1),
        'relay_download_MB_s': round(down_rate, 1),
        'host_unpack_native_s_est': round(host_unpack_native_s, 2),
        'host_unpack_numpy_s_est': round(host_unpack_numpy_s, 2),
        'device_compute_s': round(t_compute, 3),
        'compute_frames_per_s_per_chip': round(n_frames / t_compute / n_chips, 1),
        # honest v5e-8 estimate INCLUDING the host path: DICOM decode, then
        # compute/8 overlapped with the (streaming-pipelined) host expansion
        # — whichever is longer — plus PCIe-rate transfers (16 GB/s H2D,
        # 8 GB/s D2H; this rig's relay rates are reported above and are NOT
        # what a v5e-8 host pays). Host expansion uses this rig's 1-core
        # native rate; a production host parallelizes it across cores.
        'est_v5e8_total_s': round(
            t_decode
            + max(t_compute * n_chips / 8, host_unpack_native_s)
            + padded.nbytes / 16e9
            + 4 * n_pad * frame_size * ((frame_size + 7) // 8) / 8e9, 3),
        'est_v5e8_note': 'decode + max(compute/8, 1-core host expand) + PCIe transfers',
        'mask_shape': list(masks.shape),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'e2e_pullback.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
