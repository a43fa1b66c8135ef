"""Minimal MP4 (ISO BMFF) muxer for a single H.264 video track.

Container plumbing for the native intra-only H.264 encoder
(octseg/native/h264enc.cc): takes an Annex-B byte stream, extracts SPS/PPS
into the avcC sample entry, converts each IDR access unit into a
length-prefixed sample, and writes ftyp + mdat + moov. Pure host-side I/O —
no compute — mirroring where the reference leans on ffmpeg's mp4 muxer
(reference src/data/convert_dicoms.py:100-105).
"""

from __future__ import annotations

import struct
from typing import List, Tuple


def split_annexb(stream: bytes) -> List[bytes]:
    """Split an Annex-B stream into NAL units (payloads incl. header byte)."""
    nals = []
    i = 0
    n = len(stream)
    # find first start code
    starts = []
    while i < n - 3:
        if stream[i] == 0 and stream[i + 1] == 0:
            if stream[i + 2] == 1:
                starts.append((i, 3))
                i += 3
                continue
            if i < n - 4 and stream[i + 2] == 0 and stream[i + 3] == 1:
                starts.append((i, 4))
                i += 4
                continue
        i += 1
    for k, (pos, sc) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nals.append(stream[pos + sc:end])
    return nals


def _box(kind: bytes, *payload: bytes) -> bytes:
    body = b''.join(payload)
    if 8 + len(body) > 0xFFFFFFFF:
        # this muxer writes 32-bit box sizes and chunk offsets only (no
        # largesize/co64); annotation videos are far below this, so fail
        # loudly rather than write a corrupt header
        raise ValueError(
            f'{kind.decode("ascii", "replace")} box would be '
            f'{8 + len(body)} bytes — exceeds the 32-bit mp4 box limit')
    return struct.pack('>I', 8 + len(body)) + kind + body


def _full(kind: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(kind, struct.pack('>I', (version << 24) | flags), *payload)


def _avcc(sps: bytes, pps: bytes) -> bytes:
    return _box(
        b'avcC',
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1]),
        struct.pack('>H', len(sps)), sps,
        bytes([1]), struct.pack('>H', len(pps)), pps,
    )


def write_mp4(path: str, annexb: bytes, width: int, height: int,
              fps: float) -> None:
    """Mux an all-IDR Annex-B H.264 stream into an MP4 file."""
    nals = split_annexb(annexb)
    sps = pps = None
    samples: List[bytes] = []
    for nal in nals:
        t = nal[0] & 0x1F
        if t == 7:
            sps = nal
        elif t == 8:
            pps = nal
        elif t in (1, 5):
            samples.append(struct.pack('>I', len(nal)) + nal)
    if sps is None or pps is None or not samples:
        raise ValueError('annex-b stream lacks SPS/PPS or slices')

    timescale = 90000
    delta = int(round(timescale / fps))
    n = len(samples)
    duration = n * delta

    mdat = _box(b'mdat', *samples)
    # mdat payload begins right after ftyp + mdat header
    ftyp = _box(b'ftyp', b'isom', struct.pack('>I', 0x200),
                b'isomiso2avc1mp41')
    chunk_offset = len(ftyp) + 8

    stsd = _full(
        b'stsd', 0, 0, struct.pack('>I', 1),
        _box(
            b'avc1',
            bytes(6), struct.pack('>H', 1),          # reserved + dref idx
            bytes(16),                                # predefined/reserved
            struct.pack('>HH', width, height),
            struct.pack('>II', 0x480000, 0x480000),   # 72 dpi
            struct.pack('>I', 0), struct.pack('>H', 1),  # frame count
            bytes(32),                                # compressor name
            struct.pack('>Hh', 0x18, -1),             # depth, predefined
            _avcc(sps, pps),
        ))
    stts = _full(b'stts', 0, 0, struct.pack('>III', 1, n, delta))
    stss = _full(b'stss', 0, 0, struct.pack('>I', n),
                 b''.join(struct.pack('>I', i + 1) for i in range(n)))
    stsc = _full(b'stsc', 0, 0, struct.pack('>IIII', 1, 1, n, 1))
    stsz = _full(b'stsz', 0, 0, struct.pack('>II', 0, n),
                 b''.join(struct.pack('>I', len(s)) for s in samples))
    stco = _full(b'stco', 0, 0, struct.pack('>II', 1, chunk_offset))
    stbl = _box(b'stbl', stsd, stts, stss, stsc, stsz, stco)
    dinf = _box(b'dinf', _full(b'dref', 0, 0, struct.pack('>I', 1),
                               _full(b'url ', 0, 1)))
    vmhd = _full(b'vmhd', 0, 1, bytes(8))
    minf = _box(b'minf', vmhd, dinf, stbl)
    hdlr = _full(b'hdlr', 0, 0, bytes(4), b'vide', bytes(12),
                 b'VideoHandler\x00')
    mdhd = _full(b'mdhd', 0, 0,
                 struct.pack('>IIII', 0, 0, timescale, duration),
                 struct.pack('>HH', 0x55C4, 0))  # und language
    mdia = _box(b'mdia', mdhd, hdlr, minf)
    tkhd = _full(b'tkhd', 0, 7,
                 struct.pack('>IIII', 0, 0, 1, 0),
                 struct.pack('>I', duration), bytes(8),
                 struct.pack('>HHHH', 0, 0, 0, 0),
                 struct.pack('>9i', 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000),
                 struct.pack('>II', width << 16, height << 16))
    trak = _box(b'trak', tkhd, mdia)
    mvhd = _full(b'mvhd', 0, 0,
                 struct.pack('>IIII', 0, 0, timescale, duration),
                 struct.pack('>IH', 0x00010000, 0x0100), bytes(10),
                 struct.pack('>9i', 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000),
                 bytes(24), struct.pack('>I', 2))
    moov = _box(b'moov', mvhd, trak)

    with open(path, 'wb') as f:
        f.write(ftyp)
        f.write(mdat)
        f.write(moov)
