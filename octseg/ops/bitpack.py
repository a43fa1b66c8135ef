"""Device-side binary-mask bitpacking for host-bound transfers.

The engine's ensemble masks are {0,1} per pixel but travel host-ward as one
byte per pixel; on a relay-attached chip (~11 MB/s down, docs/NEXT.md) the
download dominates the whole pullback end-to-end (benchmarks/e2e_pullback.json:
~2 GB of masks for a 500-frame pullback at 1000 px). Packing 8 pixels/byte on
device — a fused multiply-reduce XLA folds into the forward program — cuts
host-bound bytes 8x. The reference has no analog (its masks never leave the
GPU as a batch; src/predict.py:85-100 round-trips float arrays per frame).

Bit order matches ``np.unpackbits(..., bitorder='big')`` so the host side is
a single vectorized numpy call.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# big-endian bit weights: pixel j of a byte lands at bit (7 - j)
_WEIGHTS = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)


def packed_width(out_w: int) -> int:
    """Bytes along the packed W axis for ``out_w`` pixels."""
    return (int(out_w) + 7) // 8


def pack_mask_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) uint8 {0,1} -> (N, H, ceil(W/8), C) uint8, 8 pixels/byte
    along W (big-endian within each byte). Runs under jit; shapes static."""
    n, h, w, c = masks.shape
    pad_w = (-w) % 8
    if pad_w:
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
    m = masks.reshape(n, h, (w + pad_w) // 8, 8, c)
    # disjoint bit weights: the uint8 sum cannot exceed 255, no overflow
    return (m * jnp.asarray(_WEIGHTS)[None, None, None, :, None]).sum(
        axis=3, dtype=jnp.uint8)


def unpack_mask_bits(packed: np.ndarray, out_w: int) -> np.ndarray:
    """Host-side inverse: (N, H, ceil(W/8), C) uint8 -> (N, H, out_w, C)
    uint8 {0,1}."""
    return np.unpackbits(np.ascontiguousarray(packed), axis=2, count=int(out_w))


def _unpack_route_numpy(packed: np.ndarray, out: np.ndarray, routes) -> None:
    pred = unpack_mask_bits(packed, out.shape[2])
    for src, dst in routes:
        out[:, :, :, dst] = pred[:, :, :, src]


def unpack_route_into(packed: np.ndarray, out: np.ndarray, routes) -> None:
    """Expand bitpacked masks and write the routed channels straight into the
    interleaved float32 ensemble buffer: (N, H, ceil(W/8), Cs) uint8 →
    out[(N, H, W, OC) float32][..., dst] = bits[..., src] for each
    (src, dst) in ``routes``.

    Single C++ pass (octseg/native/unpack.cc) — the numpy route
    (unpackbits intermediate + strided per-channel float32 scatter) measured
    ~115 s of host work per 500-frame 1000px pullback on a 1-core rig, ~25x
    slower; falls back to it when no toolchain is available."""
    from octseg.native import load_library

    lib = load_library('unpack')
    if lib is None:
        _unpack_route_numpy(packed, out, routes)
        return
    import ctypes

    packed = np.ascontiguousarray(packed)
    if not (out.flags.c_contiguous and out.dtype == np.float32):
        _unpack_route_numpy(packed, out, routes)
        return
    n, h, wb, cs = packed.shape
    assert out.shape[:2] == (n, h), (packed.shape, out.shape)
    r = np.asarray([v for pair in routes for v in pair], np.int32)
    lib.octseg_unpack_route(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int64(h), ctypes.c_int64(wb),
        ctypes.c_int64(cs), ctypes.c_int64(out.shape[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(out.shape[3]),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(routes)),
    )
