"""Native H.264 encoder (octseg/native/h264enc.cc + octseg/data/{h264,mp4}).

Replaces the reference's ffmpeg-binary H.264 re-encode (reference
src/data/convert_dicoms.py:100-105) — no software H.264 encoder exists in
this environment, so the encoder is ours and these tests hold it to the
strongest available oracle: cv2's ffmpeg DECODER. With deblocking disabled
a conforming decoder must reproduce the encoder's own reconstruction
bit-exactly, so the core test asserts decoded luma == recon luma on
adversarial content (dense CAVLC, level escapes, trailing-ones patterns,
chroma prediction across MBs). The VLC tables themselves were read out of
the decoder bit-by-bit (scripts/h264_vlc_readout.py).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from octseg.data import h264  # noqa: E402
from octseg.data.mp4 import split_annexb, write_mp4  # noqa: E402

pytestmark = pytest.mark.skipif(
    not h264.available(), reason='native h264 encoder did not build')


def decode_bgr(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    return frames


def decode_luma(path, w, h):
    cap = cv2.VideoCapture(path)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    planes = []
    while True:
        ok, raw = cap.read()
        if not ok:
            break
        planes.append(raw.reshape(-1, w)[:h].copy())
    return planes


def structured_frame(rng, h=48, w=64):
    """Flat background + random sparse 4x4 blocks: the content family that
    historically exposed every CAVLC table/semantics bug."""
    img = np.full((h, w, 3), 128, np.uint8)
    for by in range(0, h, 4):
        for bx in range(0, w, 4):
            mode = rng.integers(0, 5)
            if mode == 0:
                continue
            k = int(rng.integers(1, 17))
            ys = rng.integers(0, 4, k)
            xs = rng.integers(0, 4, k)
            amp = rng.choice([3, 6, 12, 24, 48, 96], k)
            sgn = rng.choice([-1, 1], k)
            ch = rng.integers(0, 4)
            blk = img[by:by + 4, bx:bx + 4].astype(int)
            if ch == 3:
                blk[ys, xs] = (128 + sgn * amp)[:, None]
            else:
                blk[ys, xs, ch] = 128 + sgn * amp
            img[by:by + 4, bx:bx + 4] = np.clip(blk, 0, 255)
    return img


def test_pcm_mode_is_lossless(tmp_path, rng):
    """I_PCM carries raw samples: gray round-trips within the YUV-conversion
    rounding (max 1), uniform frames bit-exactly."""
    frames = [np.full((48, 64, 3), c, np.uint8) for c in (30, 128, 220)]
    gray = cv2.cvtColor(
        rng.integers(0, 255, (48, 64), dtype=np.uint8).astype(np.uint8),
        cv2.COLOR_GRAY2BGR)
    frames.append(gray)
    p = str(tmp_path / 'pcm.mp4')
    h264.encode_mp4(frames, p, fps=15, pcm=True)
    got = decode_bgr(p)
    assert len(got) == len(frames)
    for a, b in zip(frames[:3], got[:3]):
        np.testing.assert_array_equal(a, b)
    assert np.abs(gray.astype(int) - got[3].astype(int)).max() <= 1


def test_decoder_reproduces_recon_bit_exactly(tmp_path):
    """The exact oracle: across qps and adversarial content, the ffmpeg
    decoder's luma planes equal the encoder's own reconstruction, and BGR
    output matches the recon converted with BT.601 within rounding."""
    rng = np.random.default_rng(11)
    for qp in (12, 26, 40):
        frames = [structured_frame(rng) for _ in range(4)]
        frames.append(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        enc = h264.Encoder(64, 48, qp=qp)
        recons = [enc.encode(f) for f in frames]
        p = str(tmp_path / f'exact_{qp}.mp4')
        write_mp4(p, enc.annexb(), 64, 48, 15)
        lumas = decode_luma(p, 64, 48)
        assert len(lumas) == len(frames)
        for n, y in enumerate(lumas):
            np.testing.assert_array_equal(
                y, recons[n][0], err_msg=f'qp{qp} frame {n} luma mismatch')
        for n, bgr in enumerate(decode_bgr(p)):
            ry, ru, rv = recons[n]
            yy = ry.astype(int)
            uu = np.repeat(np.repeat(ru.astype(int), 2, 0), 2, 1) - 128
            vv = np.repeat(np.repeat(rv.astype(int), 2, 0), 2, 1) - 128
            c = yy - 16
            ref = np.stack([
                np.clip((298 * c + 516 * uu + 128) >> 8, 0, 255),
                np.clip((298 * c - 100 * uu - 208 * vv + 128) >> 8, 0, 255),
                np.clip((298 * c + 409 * vv + 128) >> 8, 0, 255)], -1)
            assert np.abs(bgr.astype(int) - ref).max() <= 4


def test_quality_and_size_scale_with_qp(tmp_path, rng):
    img = cv2.GaussianBlur(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), (5, 5), 2)
    sizes, psnrs = {}, {}
    for qp in (16, 32, 44):
        p = str(tmp_path / f'q{qp}.mp4')
        h264.encode_mp4([img] * 2, p, fps=15, qp=qp)
        sizes[qp] = os.path.getsize(p)
        dec = decode_bgr(p)[0]
        mse = float(((img.astype(float) - dec.astype(float)) ** 2).mean())
        psnrs[qp] = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
    assert sizes[16] > sizes[32] > sizes[44]
    assert psnrs[16] > psnrs[32] > psnrs[44]
    assert psnrs[16] > 30  # DC-predicted all-intra on smoothed noise
    # and transform coding beats PCM by a wide margin on smooth content
    p = str(tmp_path / 'pcm_cmp.mp4')
    h264.encode_mp4([img] * 2, p, fps=15, pcm=True)
    assert sizes[32] < os.path.getsize(p) / 4


def test_annexb_structure(rng):
    stream = h264.encode_annexb(
        [rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)] * 3, qp=30)
    types = [n[0] & 31 for n in split_annexb(stream)]
    assert types == [7, 8, 5, 5, 5]  # SPS, PPS, one IDR per frame


def test_mp4_metadata(tmp_path, rng):
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
              for _ in range(5)]
    p = str(tmp_path / 'meta.mp4')
    h264.encode_mp4(frames, p, fps=25, qp=30)
    cap = cv2.VideoCapture(p)
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 64
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 48
    assert int(round(cap.get(cv2.CAP_PROP_FPS))) == 25
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5


def test_reencode_mp4_from_mp4v(tmp_path, rng):
    """The convert_dicoms/stack_images path: an mp4v temp video re-encoded
    to H.264 without an ffmpeg binary."""
    src = str(tmp_path / 'src.mp4')
    frames = [cv2.GaussianBlur(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), (5, 5), 2)
        for _ in range(4)]
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*'mp4v'), 15, (64, 64))
    for f in frames:
        w.write(f)
    w.release()
    dst = str(tmp_path / 'dst.mp4')
    assert h264.reencode_mp4(src, dst, qp=20)
    cap = cv2.VideoCapture(dst)
    codec = int(cap.get(cv2.CAP_PROP_FOURCC)).to_bytes(4, 'little')
    assert codec in (b'avc1', b'h264')  # reader reports tag or codec name
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    ok, dec = cap.read()
    assert ok
    # content survives the double lossy hop recognizably
    mse = float(((frames[0].astype(float) - dec.astype(float)) ** 2).mean())
    assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 28


def test_odd_and_large_geometry(tmp_path, rng):
    """Non-multiple-of-16 sizes exercise the SPS crop + padding path."""
    img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    p = str(tmp_path / 'crop.mp4')
    h264.encode_mp4([img], p, fps=15, qp=20)
    got = decode_bgr(p)
    assert got[0].shape == (50, 70, 3)
    # odd dims are rejected (4:2:0 chroma needs even)
    with pytest.raises(ValueError):
        h264.encode_mp4([rng.integers(0, 255, (49, 70, 3), dtype=np.uint8)],
                        str(tmp_path / 'odd.mp4'), fps=15)


def test_reencode_mp4_odd_geometry_falls_back(tmp_path, rng, monkeypatch):
    """An odd-width source (routine: truncated aspect resizes — and cv2's
    own mp4v writer silently rounds 63→62, so the fake capture below is the
    only way to feed one in) must return False — keep the original file —
    not abort the whole conversion run (review finding: ValueError used to
    propagate through convert_dicoms' thread pool)."""
    frames = [rng.integers(0, 255, (64, 63, 3), dtype=np.uint8)
              for _ in range(3)]

    class FakeCap:
        def __init__(self, path):
            self._i = 0

        def isOpened(self):
            return True

        def get(self, prop):
            return 15.0

        def read(self):
            if self._i >= len(frames):
                return False, None
            self._i += 1
            return True, frames[self._i - 1]

        def release(self):
            pass

    monkeypatch.setattr(cv2, 'VideoCapture', FakeCap)
    dst = str(tmp_path / 'odd_dst.mp4')
    assert h264.reencode_mp4('whatever.mp4', dst, qp=20) is False
    assert not os.path.exists(dst)


def test_encoder_rejects_mismatched_frame_shape():
    """The streaming Encoder validates frame geometry before handing the
    pointer to native code (which reads exactly 3*H*W bytes — a smaller
    array would be an out-of-bounds read)."""
    enc = h264.Encoder(64, 48, qp=26)
    try:
        with pytest.raises(ValueError, match='does not match'):
            enc.encode(np.zeros((48, 32, 3), np.uint8))
        with pytest.raises(ValueError, match='does not match'):
            enc.encode(np.zeros((64, 48, 3), np.uint8))  # swapped h/w
        enc.encode(np.zeros((48, 64, 3), np.uint8))  # correct shape works
    finally:
        enc.close()


def test_encoder_init_failure_leaves_del_safe(monkeypatch):
    """A failed construction (no native lib) must not spew AttributeError
    from __del__ during garbage collection."""
    monkeypatch.setattr(h264, '_lib', lambda: None)
    broken = h264.Encoder.__new__(h264.Encoder)
    with pytest.raises(RuntimeError):
        broken.__init__(64, 48)
    broken.__del__()  # gc calls this on the half-constructed instance


def test_encode_mp4_empty_frames_raises_value_error(tmp_path):
    with pytest.raises(ValueError, match='no frames'):
        h264.encode_mp4([], str(tmp_path / 'x.mp4'), fps=15)
