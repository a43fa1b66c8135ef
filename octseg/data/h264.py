"""H.264 video encoding via the native intra-only encoder.

Replaces the reference's ffmpeg-binary H.264 re-encode step (reference
src/data/convert_dicoms.py:100-105, src/data/stack_images.py) in
environments without ffmpeg: octseg/native/h264enc.cc produces a baseline-
profile all-IDR Annex-B stream (CAVLC, I_16x16 DC prediction, 4x4 integer
transform; I_PCM lossless mode for tests), and octseg/data/mp4.py muxes it.

encode_mp4(frames_bgr, path, fps, qp) is the one-call entry point used by
the video writers; available() reports whether the native encoder built.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence

import numpy as np

from octseg import native


def _lib():
    lib = native.load_library('h264enc')
    if lib is None:
        return None
    if not getattr(lib, '_h264_configured', False):
        lib.h264enc_create.restype = ctypes.c_void_p
        lib.h264enc_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
        lib.h264enc_encode_frame.argtypes = [ctypes.c_void_p,
                                             ctypes.POINTER(ctypes.c_uint8)]
        lib.h264enc_size.restype = ctypes.c_uint64
        lib.h264enc_size.argtypes = [ctypes.c_void_p]
        lib.h264enc_data.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint8)]
        lib.h264enc_frame_count.restype = ctypes.c_int
        lib.h264enc_frame_count.argtypes = [ctypes.c_void_p]
        lib.h264enc_frame_sizes.argtypes = [ctypes.c_void_p,
                                            ctypes.POINTER(ctypes.c_uint64)]
        lib.h264enc_destroy.argtypes = [ctypes.c_void_p]
        lib._h264_configured = True
    return lib


def available() -> bool:
    """True when the native encoder compiled and loaded."""
    return _lib() is not None


class Encoder:
    """Streaming handle over the native encoder; exposes the per-frame
    reconstruction planes (the decode-exactness oracle used by tests —
    deblocking is disabled, so a conforming decoder reproduces them
    bit-exactly)."""

    def __init__(self, width: int, height: int, qp: int = 26,
                 pcm: bool = False):
        self._lib = _lib()
        if self._lib is None:
            raise RuntimeError('native h264 encoder unavailable')
        self._enc = self._lib.h264enc_create(width, height, qp, int(pcm))
        if not self._enc:
            raise ValueError(f'unsupported geometry {width}x{height}')
        self.width, self.height = width, height
        self._lib.h264enc_recon.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]

    def encode(self, frame_bgr: np.ndarray):
        """Encode one frame; returns (Y, U, V) reconstruction planes."""
        f = np.ascontiguousarray(frame_bgr, np.uint8)
        self._lib.h264enc_encode_frame(
            self._enc, f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        y = np.empty((self.height, self.width), np.uint8)
        u = np.empty((self.height // 2, self.width // 2), np.uint8)
        v = np.empty_like(u)
        self._lib.h264enc_recon(
            self._enc, *(p.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                         for p in (y, u, v)))
        return y, u, v

    def annexb(self) -> bytes:
        size = self._lib.h264enc_size(self._enc)
        buf = (ctypes.c_uint8 * size)()
        self._lib.h264enc_data(self._enc, buf)
        return bytes(buf)

    def close(self):
        if self._enc:
            self._lib.h264enc_destroy(self._enc)
            self._enc = None

    def __del__(self):
        self.close()


def encode_annexb(frames_bgr: Sequence[np.ndarray], qp: int = 26,
                  pcm: bool = False) -> bytes:
    """Encode BGR uint8 (H,W,3) frames to an Annex-B H.264 byte stream."""
    lib = _lib()
    if lib is None:
        raise RuntimeError('native h264 encoder unavailable')
    frames: List[np.ndarray] = [np.ascontiguousarray(f, np.uint8)
                                for f in frames_bgr]
    if not frames:
        raise ValueError('no frames')
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError('frames must share one (H, W, 3) shape')
    enc = lib.h264enc_create(w, h, qp, int(pcm))
    if not enc:
        raise ValueError(f'unsupported frame geometry {w}x{h} (must be even)')
    try:
        for f in frames:
            lib.h264enc_encode_frame(
                enc, f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        size = lib.h264enc_size(enc)
        buf = (ctypes.c_uint8 * size)()
        lib.h264enc_data(enc, buf)
        return bytes(buf)
    finally:
        lib.h264enc_destroy(enc)


def encode_mp4(frames_bgr: Sequence[np.ndarray], path: str, fps: float,
               qp: int = 26, pcm: bool = False) -> None:
    """Encode frames and write an .mp4 (H.264, all-IDR)."""
    from octseg.data.mp4 import write_mp4

    frames = list(frames_bgr)
    h, w = np.asarray(frames[0]).shape[:2]
    stream = encode_annexb(frames, qp=qp, pcm=pcm)
    write_mp4(path, stream, w, h, fps)


def reencode_mp4(src: str, dst: str, fps: Optional[float] = None,
                 qp: int = 26) -> bool:
    """Re-encode an existing (e.g. mp4v) video file to H.264; False if the
    native encoder or the source decoder is unavailable."""
    import cv2

    if not available():
        return False
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        return False
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 15.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    if not frames:
        return False
    encode_mp4(frames, dst, fps or src_fps, qp=qp)
    return True
