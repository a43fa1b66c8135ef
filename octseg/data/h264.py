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
        # _enc must exist before anything can raise: __del__ -> close()
        # reads it even when construction fails (no native lib).
        self._enc = None
        self._lib = _lib()
        if self._lib is None:
            raise RuntimeError('native h264 encoder unavailable')
        self._enc = self._lib.h264enc_create(width, height, qp, int(pcm))
        if not self._enc:
            raise ValueError(f'unsupported geometry {width}x{height}'
                             ' (dimensions must be positive and even)')
        self.width, self.height = width, height
        self._lib.h264enc_recon.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]

    def encode(self, frame_bgr: np.ndarray, recon: bool = True):
        """Encode one frame; returns (Y, U, V) reconstruction planes
        (or None with recon=False — the streaming re-encode path skips the
        three plane copies per frame)."""
        f = np.ascontiguousarray(frame_bgr, np.uint8)
        if f.shape != (self.height, self.width, 3):
            # the native side reads exactly 3*H*W bytes from the pointer; a
            # smaller array would be an out-of-bounds read, not a crash here
            raise ValueError(f'frame shape {f.shape} does not match encoder '
                             f'geometry ({self.height}, {self.width}, 3)')
        self._lib.h264enc_encode_frame(
            self._enc, f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if not recon:
            return None
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
    if not frames:
        raise ValueError('no frames')
    h, w = np.asarray(frames[0]).shape[:2]
    stream = encode_annexb(frames, qp=qp, pcm=pcm)
    write_mp4(path, stream, w, h, fps)


def reencode_mp4(src: str, dst: str, fps: Optional[float] = None,
                 qp: int = 26) -> bool:
    """Re-encode an existing (e.g. mp4v) video file to H.264; False if the
    native encoder or the source decoder is unavailable, or the geometry is
    unencodable (odd dimensions) — callers then keep the original file,
    matching the pre-native behavior when ffmpeg was absent/failed.

    Streams frame-by-frame: host memory stays at one decoded frame plus the
    compressed stream, regardless of video length (convert_dicoms re-encodes
    many studies concurrently from a thread pool)."""
    import cv2

    from octseg.data.mp4 import write_mp4

    if not available():
        return False
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        return False
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 15.0
    enc = None
    n = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if enc is None:
                h, w = frame.shape[:2]
                enc = Encoder(w, h, qp=qp)
            enc.encode(frame, recon=False)
            n += 1
    except ValueError:
        # odd geometry or a mid-stream frame-size change: leave src as-is
        return False
    finally:
        cap.release()
        if enc is not None:
            stream = enc.annexb() if n else b''
            enc.close()
    if n == 0:
        return False
    try:
        write_mp4(dst, stream, enc.width, enc.height, fps or src_fps)
    except ValueError:  # e.g. stream too large for 32-bit mp4 boxes
        return False
    return True
