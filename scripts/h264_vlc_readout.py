"""Direct decoder readout of H.264 CAVLC tables (development tool).

The native encoder's VLC tables (octseg/native/h264enc.cc) cannot be copied
from anywhere in this environment (no spec, no ffmpeg sources, tables not
recoverable from the stripped binary), so they were verified — and several
entries corrected — by reading them OUT OF the production decoder itself:
handcraft a slice whose luma DC block has a chosen TotalCoeff and a
CANDIDATE total_zeros code + matching run_before hypothesis, mux it, decode
with cv2's ffmpeg, and accept a candidate only when the decoded Y plane is
bit-exact for its hypothesis. This pinned, among others: total_zeros row 4
(entries tz5..9), coeff_token ctx1 (14,2)/(14,3) (swapped), ctx2 (15,3)
({9,6} -> {10,6}), and the suffixLength adaptation rule (two sequential
updates, not if/else-if).

Usage: python scripts/h264_vlc_readout.py [TotalCoeff]   # default 4
Prints every (length, code) -> total_zeros mapping the decoder accepts.

The regression counterpart lives in tests/test_h264.py (exact-oracle
sweeps); this script is for re-deriving entries if a table ever needs to
change."""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from octseg.data.h264 import Encoder  # noqa: E402  (for SPS/PPS)
from octseg.data.mp4 import split_annexb, write_mp4  # noqa: E402

QP = 24


class BW:
    def __init__(s):
        s.bits = []

    def put(s, v, n):
        for i in range(n - 1, -1, -1):
            s.bits.append((v >> i) & 1)

    def ue(s, v):
        x = v + 1
        n = x.bit_length() - 1
        s.put(0, n)
        s.put(x, n + 1)

    def se(s, v):
        s.ue(2 * v - 1 if v > 0 else -2 * v)

    def bytes_rbsp(s):
        b = s.bits + [1]
        while len(b) % 8:
            b.append(0)
        out = bytearray()
        for i in range(0, len(b), 8):
            out.append(int(''.join(map(str, b[i:i + 8])), 2))
        return bytes(out)


def nal(t, rbsp, ref=3):
    out = bytearray(b'\x00\x00\x00\x01')
    out.append((ref << 5) | t)
    zeros = 0
    for byte in rbsp:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


# grab SPS/PPS for a 16x16 frame from the native encoder
enc = Encoder(16, 16, qp=QP)
enc.encode(np.full((16, 16, 3), 128, np.uint8))
nals = split_annexb(enc.annexb())
SPS = [n for n in nals if (n[0] & 31) == 7][0]
PPS = [n for n in nals if (n[0] & 31) == 8][0]

import re as _re
_CC = open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "octseg", "native", "h264enc.cc")).read()
_m = _re.search(r'kCoeffToken0\[17\]\[4\] = \{(.*?)\n\};', _CC, _re.S)
_pairs = _re.findall(r'\{(\d+),\s*(\d+)\}', _m.group(1))
import numpy as _np
_CT0 = _np.array([(int(a), int(b)) for a, b in _pairs]).reshape(17, 4, 2)
def ct0(tc, t1):
    return (int(_CT0[tc, t1, 0]), int(_CT0[tc, t1, 1]))
RUN = {  # run_before codes [zerosLeft clamped 1..7][run] from the encoder
    1: {0: (1, 1), 1: (1, 0)},
    2: {0: (1, 1), 1: (2, 1), 2: (2, 0)},
    3: {0: (2, 3), 1: (2, 2), 2: (2, 1), 3: (2, 0)},
    4: {0: (2, 3), 1: (2, 2), 2: (2, 1), 3: (3, 1), 4: (3, 0)},
    5: {0: (2, 3), 1: (2, 2), 2: (3, 3), 3: (3, 2), 4: (3, 1), 5: (3, 0)},
    6: {0: (2, 3), 1: (3, 0), 2: (3, 1), 3: (3, 3), 4: (3, 2), 5: (3, 5),
        6: (3, 4)},
    7: {i: (3, 7 - i) if i < 7 else (i - 3, 1) for i in range(13)},
}


def slice_bits(cand_len, cand_code, tz_hyp, tc=4):
    """One-MB I slice: DC block with `tc` +4 levels (t1=0), candidate
    total_zeros code, run hypothesis."""
    bw = BW()
    bw.ue(0)          # first_mb
    bw.ue(7)          # slice_type I
    bw.ue(0)          # pps
    bw.put(0, 4)      # frame_num
    bw.ue(0)          # idr_pic_id
    bw.put(0, 1)
    bw.put(0, 1)
    bw.se(0)          # qp delta
    bw.ue(1)          # deblock off
    # MB: I16x16, DC pred, cbp_luma=0, cbp_chroma=0 -> mb_type 3
    bw.ue(3)
    bw.ue(0)          # chroma pred DC
    bw.se(0)          # mb_qp_delta
    # DC residual block: coeff_token(tc,0)
    _l, _c = ct0(tc, 0)
    bw.put(_c, _l)
    sl = 1 if tc > 10 else 0
    for i in range(tc):
        lc = 2 * 4 - 2
        if i == 0:
            lc -= 2
        if sl == 0:
            bw.put(1, lc + 1)   # prefix<14 terminator form
        else:
            bw.put(1, (lc >> sl) + 1)
            bw.put(lc & ((1 << sl) - 1), sl)
        if sl == 0:
            sl = 1
        if 4 > (3 << (sl - 1)) and sl < 6:
            sl += 1
    # candidate total_zeros code
    bw.put(cand_code, cand_len)
    # run_before: high-freq coeff takes the whole run = tz_hyp
    zl = tz_hyp
    for _ in range(tc - 1):  # tc-1 coeffs read runs while zerosLeft > 0
        if zl <= 0:
            break
        ln, cd = RUN[min(zl, 7)][zl] if zl <= 6 else RUN[7][zl]
        bw.put(cd, ln)
        zl = 0  # we gave the entire run to the first one
    return bw.bytes_rbsp()


WORKER = r'''
import sys, json, os, contextlib
import numpy as np, cv2
d = sys.argv[1]
out = {}
# capture ffmpeg stderr per file via fd redirection
for name in sorted(os.listdir(d)):
    if not name.endswith('.mp4'):
        continue
    errfile = os.path.join(d, name + '.err')
    fd = os.dup(2)
    with open(errfile, 'w') as ef:
        os.dup2(ef.fileno(), 2)
        try:
            cap = cv2.VideoCapture(os.path.join(d, name))
            cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
            ok, raw = cap.read()
            cap.release()
        finally:
            os.dup2(fd, 2)
            os.close(fd)
    if not ok:
        out[name] = None
    else:
        out[name] = raw.reshape(-1, 16)[:16].astype(int).tolist()
with open(os.path.join(d, 'results.json'), 'w') as f:
    json.dump(out, f)
print('done')
'''


def decode_batch(d):
    w = os.path.join(d, 'w.py')
    open(w, 'w').write(WORKER)
    subprocess.run([sys.executable, w, d], capture_output=True,
                   text=True, timeout=600, check=True)
    with open(os.path.join(d, 'results.json')) as f:
        res = json.load(f)
    out = {}
    for name, y in res.items():
        errs = open(os.path.join(d, name + '.err')).read()
        bad = any(k in errs.lower() for k in
                  ('error', 'invalid', 'negative', 'out of range',
                   'corrupted'))
        out[name] = (y, bad)
    return out


def expected_y(tz, tc=4):
    """Recon: DC block, tc quantized +4 DCs at scan 0..tc-2 and tc-1+tz."""
    ZIG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
    V00 = [10, 11, 13, 14, 16, 18][QP % 6]
    dcq = np.zeros(16, int)
    for p in list(range(tc - 1)) + [tc - 1 + tz]:
        dcq[ZIG[p]] = 4
    H = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1],
                  [1, -1, 1, -1]])
    # inverse Hadamard (as in the spec: H*c*H with the basis used by the
    # encoder's hadamard4x4)
    M = dcq.reshape(4, 4)
    # encoder hadamard4x4 row op: p0=s0+s3,p3=s0-s3,p1=s1+s2,p2=s1-s2;
    # out rows [p0+p1, p3+p2, p0-p1, p3-p2] — replicate exactly:
    def had(m):
        t = np.zeros((4, 4), int)
        for i in range(4):
            s = m[i]
            p0, p3 = s[0] + s[3], s[0] - s[3]
            p1, p2 = s[1] + s[2], s[1] - s[2]
            t[i] = [p0 + p1, p3 + p2, p0 - p1, p3 - p2]
        o = np.zeros((4, 4), int)
        for i in range(4):
            s = t[:, i]
            p0, p3 = s[0] + s[3], s[0] - s[3]
            p1, p2 = s[1] + s[2], s[1] - s[2]
            o[:, i] = [p0 + p1, p3 + p2, p0 - p1, p3 - p2]
        return o
    f = had(M)
    dcd = (f * V00) << (QP // 6 - 2)
    y = np.zeros((16, 16), int)
    for b in range(16):
        bx, by = (b % 4) * 4, (b // 4) * 4
        pix = (dcd[b // 4, b % 4] + 32) >> 6
        y[by:by + 4, bx:bx + 4] = np.clip(128 + pix, 0, 255)
    return y


def main():
    tc = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f'reading decoder row for TotalCoeff={tc} (maxNumCoeff 16)')
    td = tempfile.mkdtemp()
    metas = {}
    for L in (2, 3, 4, 5, 6):
        for code in range(2 ** L):
            for hyp in range(0, 17 - tc):
                rbsp = slice_bits(L, code, hyp, tc=tc)
                annexb = (b'\x00\x00\x00\x01' + SPS + b'\x00\x00\x00\x01'
                          + PPS + nal(5, rbsp))
                name = f'c_{L}_{code:03d}_{hyp:02d}.mp4'
                write_mp4(os.path.join(td, name), annexb, 16, 16, 15)
                metas[name] = (L, code, hyp)
    res = decode_batch(td)
    found = {}
    for name, (L, code, hyp) in sorted(metas.items()):
        y, bad = res.get(name.split('/')[-1], (None, True))
        if y is None or bad:
            continue
        if np.array_equal(np.array(y), expected_y(hyp, tc)):
            if (L, code) in found and found[(L, code)] != hyp:
                print(f'  AMBIGUOUS len={L} code={code:0{L}b}')
            found[(L, code)] = hyp
            print(f'  len={L} code={code:0{L}b} -> tz={hyp}')
    print('row:', sorted(found.items(), key=lambda kv: kv[1]))


main()
