// Native H.264 encoder: baseline profile, intra-only (IDR every frame).
//
// Why this exists: the reference re-encodes its annotation/derived videos to
// H.264 with an ffmpeg binary (reference src/data/convert_dicoms.py:100-105,
// src/data/stack_images.py) — this environment ships no ffmpeg binary and
// cv2's linked FFmpeg has no software H.264 encoder (only h264_v4l2m2m,
// which needs a V4L2 device). This file provides the missing encoder as a
// first-class native component: CAVLC entropy coding, I_16x16 DC-predicted
// macroblocks with the 4x4 integer transform + luma/chroma DC Hadamard
// paths, and an I_PCM (lossless) mode used by tests as a bit-exact anchor.
//
// Output is an Annex-B byte stream: SPS+PPS once at stream start, then one
// IDR slice per frame (a cut at a frame boundary therefore needs the stream
// head's parameter sets re-prepended to stay decodable); the MP4 container
// is host-side plumbing and lives in octseg/data/mp4.py.
//
// C API (ctypes): h264enc_create / h264enc_encode_frame(BGR interleaved)
//                 / h264enc_data / h264enc_frame_sizes / h264enc_destroy.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

// OCTSEG_H264_TRACE=1 dumps per-block CAVLC decisions to stderr (debugging).
static bool trace_enabled() {
  static int v = -1;
  if (v < 0) {
    const char* e = getenv("OCTSEG_H264_TRACE");
    v = (e && e[0] == '1') ? 1 : 0;
  }
  return v == 1;
}

namespace {

// ----------------------------- bit writer ---------------------------------

struct BitWriter {
  std::vector<uint8_t> buf;
  uint32_t cache = 0;
  int bits = 0;  // bits currently in cache (from MSB side)

  void put(uint32_t value, int n) {
    // write n bits (MSB first)
    while (n > 0) {
      int take = 8 - bits;
      if (take > n) take = n;
      cache = (cache << take) | ((value >> (n - take)) & ((1u << take) - 1));
      bits += take;
      n -= take;
      if (bits == 8) {
        buf.push_back(static_cast<uint8_t>(cache & 0xFF));
        cache = 0;
        bits = 0;
      }
    }
  }
  void put_bit(int b) { put(b ? 1u : 0u, 1); }

  // unsigned exp-golomb
  void ue(uint32_t v) {
    uint32_t x = v + 1;
    int len = 0;
    for (uint32_t t = x; t > 1; t >>= 1) len++;
    put(0, len);
    put(x, len + 1);
  }
  // signed exp-golomb
  void se(int32_t v) {
    uint32_t m = (v <= 0) ? static_cast<uint32_t>(-2 * v)
                          : static_cast<uint32_t>(2 * v - 1);
    ue(m);
  }
  void rbsp_trailing() {
    put_bit(1);
    if (bits) put(0, 8 - bits);  // align
  }
  bool aligned() const { return bits == 0; }
};

// RBSP -> NAL with emulation prevention, prefixed by a 4-byte start code.
void append_nal(std::vector<uint8_t>& out, int nal_ref_idc, int nal_type,
                const std::vector<uint8_t>& rbsp) {
  out.push_back(0);
  out.push_back(0);
  out.push_back(0);
  out.push_back(1);
  out.push_back(static_cast<uint8_t>((nal_ref_idc << 5) | nal_type));
  int zeros = 0;
  for (uint8_t b : rbsp) {
    if (zeros >= 2 && b <= 3) {
      out.push_back(3);
      zeros = 0;
    }
    out.push_back(b);
    zeros = (b == 0) ? zeros + 1 : 0;
  }
}

// ------------------------------ CAVLC tables -------------------------------
// ITU-T H.264 Table 9-5: coeff_token (length, code) per
// [context][TotalCoeff][TrailingOnes]; contexts 0: 0<=nC<2, 1: 2<=nC<4,
// 2: 4<=nC<8, 3: nC>=8 (6-bit FLC), 4: nC==-1 (chroma DC).

struct VlcCode {
  uint8_t len;
  uint16_t code;
};

// [TotalCoeff 0..16][TrailingOnes 0..3]
static const VlcCode kCoeffToken0[17][4] = {
    {{1, 1}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 5}, {2, 1}, {0, 0}, {0, 0}},
    {{8, 7}, {6, 4}, {3, 1}, {0, 0}},
    {{9, 7}, {8, 6}, {7, 5}, {5, 3}},
    {{10, 7}, {9, 6}, {8, 5}, {6, 3}},
    {{11, 7}, {10, 6}, {9, 5}, {7, 4}},
    {{13, 15}, {11, 6}, {10, 5}, {8, 4}},
    {{13, 11}, {13, 14}, {11, 5}, {9, 4}},
    {{13, 8}, {13, 10}, {13, 13}, {10, 4}},
    {{14, 15}, {14, 14}, {13, 9}, {11, 4}},
    {{14, 11}, {14, 10}, {14, 13}, {13, 12}},
    {{15, 15}, {15, 14}, {14, 9}, {14, 12}},
    {{15, 11}, {15, 10}, {15, 13}, {14, 8}},
    {{16, 15}, {15, 1}, {15, 9}, {15, 12}},
    {{16, 11}, {16, 14}, {16, 13}, {15, 8}},
    {{16, 7}, {16, 10}, {16, 9}, {16, 12}},
    {{16, 4}, {16, 6}, {16, 5}, {16, 8}},
};

static const VlcCode kCoeffToken1[17][4] = {
    {{2, 3}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 11}, {2, 2}, {0, 0}, {0, 0}},
    {{6, 7}, {5, 7}, {3, 3}, {0, 0}},
    {{7, 7}, {6, 10}, {6, 9}, {4, 5}},
    {{8, 7}, {6, 6}, {6, 5}, {4, 4}},
    {{8, 4}, {7, 6}, {7, 5}, {5, 6}},
    {{9, 7}, {8, 6}, {8, 5}, {6, 8}},
    {{11, 15}, {9, 6}, {9, 5}, {6, 4}},
    {{11, 11}, {11, 14}, {11, 13}, {7, 4}},
    {{12, 15}, {11, 10}, {11, 9}, {9, 4}},
    {{12, 11}, {12, 14}, {12, 13}, {11, 12}},
    {{12, 8}, {12, 10}, {12, 9}, {11, 8}},
    {{13, 15}, {13, 14}, {13, 13}, {12, 12}},
    {{13, 11}, {13, 10}, {13, 9}, {13, 12}},
    {{13, 7}, {14, 11}, {13, 6}, {13, 8}},
    {{14, 9}, {14, 8}, {14, 10}, {13, 1}},
    {{14, 7}, {14, 6}, {14, 5}, {14, 4}},
};

static const VlcCode kCoeffToken2[17][4] = {
    {{4, 15}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 15}, {4, 14}, {0, 0}, {0, 0}},
    {{6, 11}, {5, 15}, {4, 13}, {0, 0}},
    {{6, 8}, {5, 12}, {5, 14}, {4, 12}},
    {{7, 15}, {5, 10}, {5, 11}, {4, 11}},
    {{7, 11}, {5, 8}, {5, 9}, {4, 10}},
    {{7, 9}, {6, 14}, {6, 13}, {4, 9}},
    {{7, 8}, {6, 10}, {6, 9}, {4, 8}},
    {{8, 15}, {7, 14}, {7, 13}, {5, 13}},
    {{8, 11}, {8, 14}, {7, 10}, {6, 12}},
    {{9, 15}, {8, 10}, {8, 13}, {7, 12}},
    {{9, 11}, {9, 14}, {8, 9}, {8, 12}},
    {{9, 8}, {9, 10}, {9, 13}, {8, 8}},
    {{10, 13}, {9, 7}, {9, 9}, {9, 12}},
    {{10, 9}, {10, 12}, {10, 11}, {10, 10}},
    {{10, 5}, {10, 8}, {10, 7}, {10, 6}},
    {{10, 1}, {10, 4}, {10, 3}, {10, 2}},
};

// chroma DC (nC == -1), 2x2: TotalCoeff 0..4
static const VlcCode kCoeffTokenChromaDC[5][4] = {
    {{2, 1}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 7}, {1, 1}, {0, 0}, {0, 0}},
    {{6, 4}, {6, 6}, {3, 1}, {0, 0}},
    {{6, 3}, {7, 3}, {7, 2}, {6, 5}},
    {{6, 2}, {8, 3}, {8, 2}, {7, 0}},
};

// Table 9-7/9-8: total_zeros for 4x4 blocks, [TotalCoeff-1][total_zeros]
static const VlcCode kTotalZeros4x4[15][16] = {
    // TotalCoeff==1
    {{1, 1}, {3, 3}, {3, 2}, {4, 3}, {4, 2}, {5, 3}, {5, 2}, {6, 3},
     {6, 2}, {7, 3}, {7, 2}, {8, 3}, {8, 2}, {9, 3}, {9, 2}, {9, 1}},
    // 2
    {{3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {4, 5}, {4, 4}, {4, 3},
     {4, 2}, {5, 3}, {5, 2}, {6, 3}, {6, 2}, {6, 1}, {6, 0}, {0, 0}},
    // 3
    {{4, 5}, {3, 7}, {3, 6}, {3, 5}, {4, 4}, {4, 3}, {3, 4}, {3, 3},
     {4, 2}, {5, 3}, {5, 2}, {6, 1}, {5, 1}, {6, 0}, {0, 0}, {0, 0}},
    // 4  (read out of the ffmpeg decoder bit-by-bit — see
    //     scripts/h264_vlc_readout.py)
    {{5, 3}, {3, 7}, {4, 5}, {4, 4}, {3, 6}, {3, 5}, {3, 4}, {4, 3},
     {3, 3}, {4, 2}, {5, 2}, {5, 1}, {5, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 5
    {{4, 5}, {4, 4}, {4, 3}, {3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3},
     {4, 2}, {5, 1}, {4, 1}, {5, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 6
    {{6, 1}, {5, 1}, {3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {3, 2},
     {4, 1}, {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 7
    {{6, 1}, {5, 1}, {3, 5}, {3, 4}, {3, 3}, {2, 3}, {3, 2}, {4, 1},
     {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 8
    {{6, 1}, {4, 1}, {5, 1}, {3, 3}, {2, 3}, {2, 2}, {3, 2}, {3, 1},
     {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 9
    {{6, 1}, {6, 0}, {4, 1}, {2, 3}, {2, 2}, {3, 1}, {2, 1}, {5, 1},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 10
    {{5, 1}, {5, 0}, {3, 1}, {2, 3}, {2, 2}, {2, 1}, {4, 1}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 11
    {{4, 0}, {4, 1}, {3, 1}, {3, 2}, {1, 1}, {3, 3}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 12
    {{4, 0}, {4, 1}, {2, 1}, {1, 1}, {3, 1}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 13
    {{3, 0}, {3, 1}, {1, 1}, {2, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 14
    {{2, 0}, {2, 1}, {1, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 15
    {{1, 0}, {1, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
};

// Table 9-9(a): total_zeros for chroma DC (2x2), [TotalCoeff-1][total_zeros]
static const VlcCode kTotalZerosChromaDC[3][4] = {
    {{1, 1}, {2, 1}, {3, 1}, {3, 0}},
    {{1, 1}, {2, 1}, {2, 0}, {0, 0}},
    {{1, 1}, {1, 0}, {0, 0}, {0, 0}},
};

// Table 9-10: run_before, [zerosLeft(1..6, >6 uses zerosLeft=7 row)][run]
static const VlcCode kRunBefore[7][15] = {
    // zerosLeft == 1
    {{1, 1}, {1, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 2
    {{1, 1}, {2, 1}, {2, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 3
    {{2, 3}, {2, 2}, {2, 1}, {2, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 4
    {{2, 3}, {2, 2}, {2, 1}, {3, 1}, {3, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 5
    {{2, 3}, {2, 2}, {3, 3}, {3, 2}, {3, 1}, {3, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // 6
    {{2, 3}, {3, 0}, {3, 1}, {3, 3}, {3, 2}, {3, 5}, {3, 4}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    // >6
    {{3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {3, 2}, {3, 1}, {4, 1},
     {5, 1}, {6, 1}, {7, 1}, {8, 1}, {9, 1}, {10, 1}, {11, 1}},
};

// zig-zag scan for 4x4
static const int kZigzag4x4[16] = {0, 1,  4,  8,  5, 2,  3,  6,
                                  9, 12, 13, 10, 7, 11, 14, 15};

// quantization MF (Table derived from spec 8-5.. ) [qp%6][position class]
// class 0: positions (0,0),(0,2),(2,0),(2,2); class 1: (1,1),(1,3),(3,1),(3,3);
// class 2: the rest.
static const int kQuantMF[6][3] = {
    {13107, 5243, 8066}, {11916, 4660, 7490}, {10082, 4194, 6554},
    {9362, 3647, 5825},  {8192, 3355, 5243},  {7282, 2893, 4559},
};
// dequant V (Table 8-15 style) [qp%6][class]
static const int kDequantV[6][3] = {
    {10, 16, 13}, {11, 18, 14}, {13, 20, 16},
    {14, 23, 18}, {16, 25, 20}, {18, 29, 23},
};

inline int pos_class(int idx) {  // idx = raster 0..15 in 4x4
  int r = idx >> 2, c = idx & 3;
  if ((r == 0 || r == 2) && (c == 0 || c == 2)) return 0;
  if ((r == 1 || r == 3) && (c == 1 || c == 3)) return 1;
  return 2;
}

// chroma QP mapping (Table 8-12) for qp 30..51; below 30 QPc == QPy
static const int kChromaQP[22] = {29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
                                  36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39};

inline int chroma_qp(int qp) {
  if (qp < 30) return qp;
  if (qp > 51) qp = 51;
  return kChromaQP[qp - 30];
}

inline uint8_t clip255(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// ------------------------------- transforms -------------------------------

void forward4x4(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; i++) {  // rows
    const int* s = in + 4 * i;
    int p0 = s[0] + s[3], p3 = s[0] - s[3];
    int p1 = s[1] + s[2], p2 = s[1] - s[2];
    tmp[4 * i + 0] = p0 + p1;
    tmp[4 * i + 2] = p0 - p1;
    tmp[4 * i + 1] = 2 * p3 + p2;
    tmp[4 * i + 3] = p3 - 2 * p2;
  }
  for (int i = 0; i < 4; i++) {  // cols
    int s0 = tmp[i], s1 = tmp[4 + i], s2 = tmp[8 + i], s3 = tmp[12 + i];
    int p0 = s0 + s3, p3 = s0 - s3;
    int p1 = s1 + s2, p2 = s1 - s2;
    out[i] = p0 + p1;
    out[8 + i] = p0 - p1;
    out[4 + i] = 2 * p3 + p2;
    out[12 + i] = p3 - 2 * p2;
  }
}

void inverse4x4(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; i++) {  // rows
    const int* s = in + 4 * i;
    int p0 = s[0] + s[2], p1 = s[0] - s[2];
    int p2 = (s[1] >> 1) - s[3], p3 = s[1] + (s[3] >> 1);
    tmp[4 * i + 0] = p0 + p3;
    tmp[4 * i + 3] = p0 - p3;
    tmp[4 * i + 1] = p1 + p2;
    tmp[4 * i + 2] = p1 - p2;
  }
  for (int i = 0; i < 4; i++) {  // cols
    int s0 = tmp[i], s1 = tmp[4 + i], s2 = tmp[8 + i], s3 = tmp[12 + i];
    int p0 = s0 + s2, p1 = s0 - s2;
    int p2 = (s1 >> 1) - s3, p3 = s1 + (s3 >> 1);
    out[i] = (p0 + p3 + 32) >> 6;
    out[12 + i] = (p0 - p3 + 32) >> 6;
    out[4 + i] = (p1 + p2 + 32) >> 6;
    out[8 + i] = (p1 - p2 + 32) >> 6;
  }
}

void hadamard4x4(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; i++) {
    const int* s = in + 4 * i;
    int p0 = s[0] + s[3], p3 = s[0] - s[3];
    int p1 = s[1] + s[2], p2 = s[1] - s[2];
    tmp[4 * i + 0] = p0 + p1;
    tmp[4 * i + 2] = p0 - p1;
    tmp[4 * i + 1] = p3 + p2;
    tmp[4 * i + 3] = p3 - p2;
  }
  for (int i = 0; i < 4; i++) {
    int s0 = tmp[i], s1 = tmp[4 + i], s2 = tmp[8 + i], s3 = tmp[12 + i];
    int p0 = s0 + s3, p3 = s0 - s3;
    int p1 = s1 + s2, p2 = s1 - s2;
    out[i] = p0 + p1;
    out[8 + i] = p0 - p1;
    out[4 + i] = p3 + p2;
    out[12 + i] = p3 - p2;
  }
}

// ------------------------------ CAVLC writer ------------------------------

struct Coeffs {
  int level[16];  // zig-zag order, DC first
  int n;          // number of coefficients in scan (16, 15, or 4)
  int total_coeff = 0;
};

// Encode one residual block with CAVLC. `nC` selects the coeff_token table
// (-1 for chroma DC). Returns TotalCoeff (for neighbor context tracking).
int cavlc_block(BitWriter& bw, const int* zz, int n, int nC) {
  int levels[16], runs[16];
  int total_coeff = 0, total_zeros = 0, trailing_ones = 0;
  int last = -1;
  for (int i = 0; i < n; i++)
    if (zz[i]) last = i;
  if (last >= 0) {
    int run = 0;
    for (int i = 0; i <= last; i++) {
      if (zz[i] == 0) {
        run++;
      } else {
        levels[total_coeff] = zz[i];
        runs[total_coeff] = run;
        total_coeff++;
        run = 0;
      }
    }
    total_zeros = last + 1 - total_coeff;
    // trailing ones: up to 3 consecutive +-1 at the end of the scan
    for (int i = total_coeff - 1; i >= 0 && trailing_ones < 3; i--) {
      if (levels[i] == 1 || levels[i] == -1)
        trailing_ones++;
      else
        break;
    }
  }

  if (trace_enabled()) {
    fprintf(stderr, "[cavlc] nC=%d n=%d tc=%d t1=%d tz=%d levels:", nC, n,
            total_coeff, trailing_ones, total_zeros);
    for (int i = 0; i < total_coeff; i++)
      fprintf(stderr, " %d(r%d)", levels[i], runs[i]);
    fprintf(stderr, "\n");
  }

  // coeff_token
  if (nC == -1) {
    const VlcCode& c = kCoeffTokenChromaDC[total_coeff][trailing_ones];
    bw.put(c.code, c.len);
  } else if (nC < 2) {
    const VlcCode& c = kCoeffToken0[total_coeff][trailing_ones];
    bw.put(c.code, c.len);
  } else if (nC < 4) {
    const VlcCode& c = kCoeffToken1[total_coeff][trailing_ones];
    bw.put(c.code, c.len);
  } else if (nC < 8) {
    const VlcCode& c = kCoeffToken2[total_coeff][trailing_ones];
    bw.put(c.code, c.len);
  } else {
    // 6-bit FLC: xxxxyy with xxxx=TotalCoeff-1 (0 coeffs -> 000011)
    if (total_coeff == 0)
      bw.put(3, 6);
    else
      bw.put(static_cast<uint32_t>(((total_coeff - 1) << 2) | trailing_ones),
             6);
  }
  if (total_coeff == 0) return 0;

  // trailing one signs (reverse scan order)
  for (int i = 0; i < trailing_ones; i++) {
    int lv = levels[total_coeff - 1 - i];
    bw.put_bit(lv < 0);
  }

  // remaining levels, reverse order, adaptive suffixLength
  int suffix_len = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
  for (int i = total_coeff - 1 - trailing_ones; i >= 0; i--) {
    int level = levels[i];
    int level_code = (level > 0) ? 2 * level - 2 : -2 * level - 1;
    bool first = (i == total_coeff - 1 - trailing_ones);
    if (first && trailing_ones < 3) level_code -= 2;

    if (suffix_len == 0) {
      if (level_code < 14) {
        bw.put(1, level_code + 1);  // level_prefix then 1-bit terminator
      } else if (level_code < 30) {
        bw.put(1, 15);                // prefix 14
        bw.put(level_code - 14, 4);   // 4-bit suffix
      } else {
        bw.put(1, 16);                // prefix 15
        bw.put(level_code - 30, 12);  // 12-bit suffix
      }
    } else {
      int prefix = level_code >> suffix_len;
      if (prefix < 15) {
        bw.put(1, prefix + 1);
        bw.put(level_code & ((1 << suffix_len) - 1), suffix_len);
      } else {
        bw.put(1, 16);
        bw.put(level_code - (15 << suffix_len), 12);
      }
    }
    // adaptation is two SEQUENTIAL updates (a first level with |level| > 3
    // from a zero start bumps suffixLength twice) — read out of the ffmpeg
    // decoder bit-by-bit, scripts/h264_vlc_readout.py mode A vs B
    if (suffix_len == 0) suffix_len = 1;
    int abs_level = level > 0 ? level : -level;
    if (abs_level > (3 << (suffix_len - 1)) && suffix_len < 6) suffix_len++;
  }

  // total_zeros
  if (total_coeff < n) {
    if (nC == -1) {
      const VlcCode& c = kTotalZerosChromaDC[total_coeff - 1][total_zeros];
      bw.put(c.code, c.len);
    } else {
      const VlcCode& c = kTotalZeros4x4[total_coeff - 1][total_zeros];
      bw.put(c.code, c.len);
    }
  }

  // run_before
  int zeros_left = total_zeros;
  for (int i = total_coeff - 1; i > 0 && zeros_left > 0; i--) {
    int run = runs[i];
    int row = zeros_left < 7 ? zeros_left - 1 : 6;
    const VlcCode& c = kRunBefore[row][run];
    bw.put(c.code, c.len);
    zeros_left -= run;
  }
  return total_coeff;
}

// ------------------------------- encoder ----------------------------------

struct Encoder {
  int width, height;      // luma, even (chroma subsampling); mb-padded inside
  int mb_w, mb_h;
  int qp;
  bool pcm;  // I_PCM mode (lossless anchor)
  std::vector<uint8_t> stream;        // annex-b
  std::vector<uint64_t> frame_sizes;  // bytes appended per encoded frame
  int frame_count = 0;
  int idr_pic_id = 0;

  // planes, padded to MB multiples
  std::vector<uint8_t> Y, U, V;        // source
  std::vector<uint8_t> rY, rU, rV;     // reconstructed (intra pred source)
  // per-4x4 nonzero counts for CAVLC nC context (luma: mb grid * 16)
  std::vector<int16_t> nzY, nzU, nzV;  // -1 = unavailable

  Encoder(int w, int h, int qp_, bool pcm_)
      : width(w), height(h), qp(qp_), pcm(pcm_) {
    mb_w = (w + 15) / 16;
    mb_h = (h + 15) / 16;
    Y.resize(mb_w * 16 * mb_h * 16);
    U.resize(mb_w * 8 * mb_h * 8);
    V.resize(mb_w * 8 * mb_h * 8);
    rY.resize(Y.size());
    rU.resize(U.size());
    rV.resize(V.size());
    nzY.resize(mb_w * 4 * mb_h * 4);
    nzU.resize(mb_w * 2 * mb_h * 2);
    nzV.resize(mb_w * 2 * mb_h * 2);
  }

  void write_sps_pps() {
    BitWriter sps;
    sps.put(66, 8);  // profile_idc baseline
    sps.put(0xC0, 8);  // constraint_set0/1 = 1
    sps.put(40, 8);  // level 4.0 (covers 1080p-scale all-intra)
    sps.ue(0);       // sps id
    sps.ue(0);       // log2_max_frame_num_minus4
    sps.ue(2);       // pic_order_cnt_type = 2
    sps.ue(1);       // max_num_ref_frames
    sps.put_bit(0);  // gaps_in_frame_num_value_allowed
    sps.ue(mb_w - 1);
    sps.ue(mb_h - 1);
    sps.put_bit(1);  // frame_mbs_only
    sps.put_bit(1);  // direct_8x8_inference
    int crop_r = mb_w * 16 - width, crop_b = mb_h * 16 - height;
    if (crop_r || crop_b) {
      sps.put_bit(1);
      sps.ue(0);
      sps.ue(crop_r / 2);
      sps.ue(0);
      sps.ue(crop_b / 2);
    } else {
      sps.put_bit(0);
    }
    sps.put_bit(0);  // vui absent
    sps.rbsp_trailing();
    append_nal(stream, 3, 7, sps.buf);

    BitWriter pps;
    pps.ue(0);       // pps id
    pps.ue(0);       // sps id
    pps.put_bit(0);  // CAVLC
    pps.put_bit(0);  // no pic_order_present
    pps.ue(0);       // one slice group
    pps.ue(0);       // num_ref_idx_l0_active_minus1
    pps.ue(0);       // num_ref_idx_l1_active_minus1
    pps.put_bit(0);  // weighted_pred
    pps.put(0, 2);   // weighted_bipred_idc
    pps.se(qp - 26); // pic_init_qp_minus26
    pps.se(0);       // pic_init_qs
    pps.se(0);       // chroma_qp_index_offset
    pps.put_bit(1);  // deblocking_filter_control_present
    pps.put_bit(0);  // constrained_intra_pred
    pps.put_bit(0);  // redundant_pic_cnt_present
    pps.rbsp_trailing();
    append_nal(stream, 3, 8, pps.buf);
  }

  // BGR interleaved (h, w, 3) -> planar YUV420 (BT.601 full->studio swing),
  // replicate-pad to MB multiples.
  void load_bgr(const uint8_t* bgr) {
    int W = mb_w * 16, H = mb_h * 16;
    for (int y = 0; y < H; y++) {
      int sy = y < height ? y : height - 1;
      for (int x = 0; x < W; x++) {
        int sx = x < width ? x : width - 1;
        const uint8_t* p = bgr + 3 * (sy * width + sx);
        int b = p[0], g = p[1], r = p[2];
        int yy = (66 * r + 129 * g + 25 * b + 128) >> 8;
        Y[y * W + x] = static_cast<uint8_t>(yy + 16);
      }
    }
    int Wc = mb_w * 8, Hc = mb_h * 8;
    for (int y = 0; y < Hc; y++) {
      int sy0 = 2 * y < height ? 2 * y : height - 1;
      int sy1 = 2 * y + 1 < height ? 2 * y + 1 : height - 1;
      for (int x = 0; x < Wc; x++) {
        int sx0 = 2 * x < width ? 2 * x : width - 1;
        int sx1 = 2 * x + 1 < width ? 2 * x + 1 : width - 1;
        int r = 0, g = 0, b = 0;
        const int sys[2] = {sy0, sy1}, sxs[2] = {sx0, sx1};
        for (int dy = 0; dy < 2; dy++)
          for (int dx = 0; dx < 2; dx++) {
            const uint8_t* p = bgr + 3 * (sys[dy] * width + sxs[dx]);
            b += p[0];
            g += p[1];
            r += p[2];
          }
        r = (r + 2) >> 2;
        g = (g + 2) >> 2;
        b = (b + 2) >> 2;
        int u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128;
        int v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128;
        U[y * Wc + x] = clip255(u);
        V[y * Wc + x] = clip255(v);
      }
    }
  }

  // --- I_PCM macroblock ---
  void encode_mb_pcm(BitWriter& bw, int mbx, int mby) {
    bw.ue(25);  // mb_type I_PCM
    // pcm_alignment_zero_bit
    while (!bw.aligned()) bw.put_bit(0);
    int W = mb_w * 16, Wc = mb_w * 8;
    for (int y = 0; y < 16; y++)
      for (int x = 0; x < 16; x++) {
        uint8_t s = Y[(mby * 16 + y) * W + mbx * 16 + x];
        bw.put(s, 8);
        rY[(mby * 16 + y) * W + mbx * 16 + x] = s;
      }
    for (int y = 0; y < 8; y++)
      for (int x = 0; x < 8; x++) {
        uint8_t s = U[(mby * 8 + y) * Wc + mbx * 8 + x];
        bw.put(s, 8);
        rU[(mby * 8 + y) * Wc + mbx * 8 + x] = s;
      }
    for (int y = 0; y < 8; y++)
      for (int x = 0; x < 8; x++) {
        uint8_t s = V[(mby * 8 + y) * Wc + mbx * 8 + x];
        bw.put(s, 8);
        rV[(mby * 8 + y) * Wc + mbx * 8 + x] = s;
      }
    // I_PCM: all 4x4 blocks count as 16 nonzero coeffs for CAVLC context
    for (int by = 0; by < 4; by++)
      for (int bx = 0; bx < 4; bx++)
        nzY[(mby * 4 + by) * (mb_w * 4) + mbx * 4 + bx] = 16;
    for (int by = 0; by < 2; by++)
      for (int bx = 0; bx < 2; bx++) {
        nzU[(mby * 2 + by) * (mb_w * 2) + mbx * 2 + bx] = 16;
        nzV[(mby * 2 + by) * (mb_w * 2) + mbx * 2 + bx] = 16;
      }
  }

  int nc_context(const std::vector<int16_t>& nz, int stride, int bx, int by,
                 int first_col, int first_row) {
    int nA = bx > first_col ? nz[by * stride + bx - 1] : -1;
    int nB = by > first_row ? nz[(by - 1) * stride + bx] : -1;
    if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
    if (nA >= 0) return nA;
    if (nB >= 0) return nB;
    return 0;
  }

  // --- I_16x16 DC-predicted macroblock with transform/quant ---
  void encode_mb_i16(BitWriter& bw, int mbx, int mby) {
    int W = mb_w * 16, Wc = mb_w * 8;
    int qpc = chroma_qp(qp);

    // ---- luma: DC prediction from reconstructed neighbors ----
    bool left = mbx > 0, top = mby > 0;
    int dc;
    if (left && top) {
      int s = 0;
      for (int i = 0; i < 16; i++) s += rY[(mby * 16 + i) * W + mbx * 16 - 1];
      for (int i = 0; i < 16; i++) s += rY[(mby * 16 - 1) * W + mbx * 16 + i];
      dc = (s + 16) >> 5;
    } else if (left) {
      int s = 0;
      for (int i = 0; i < 16; i++) s += rY[(mby * 16 + i) * W + mbx * 16 - 1];
      dc = (s + 8) >> 4;
    } else if (top) {
      int s = 0;
      for (int i = 0; i < 16; i++) s += rY[(mby * 16 - 1) * W + mbx * 16 + i];
      dc = (s + 8) >> 4;
    } else {
      dc = 128;
    }

    int qbits = 15 + qp / 6;
    int f_intra = (1 << qbits) / 3;
    const int* mf = kQuantMF[qp % 6];
    const int* vq = kDequantV[qp % 6];

    // forward transform all 16 4x4 blocks; gather DCs
    int acq[16][16];   // quantized AC (raster in-block), [block][idx]
    int dcs[16];       // raw transform DCs per block (block raster order)
    for (int b = 0; b < 16; b++) {
      int bx = (b & 3) * 4, by = (b >> 2) * 4;
      int res[16];
      for (int y = 0; y < 4; y++)
        for (int x = 0; x < 4; x++)
          res[y * 4 + x] =
              static_cast<int>(
                  Y[(mby * 16 + by + y) * W + mbx * 16 + bx + x]) - dc;
      int tr[16];
      forward4x4(res, tr);
      dcs[b] = tr[0];
      for (int i = 1; i < 16; i++) {
        int w = tr[i];
        int aw = w < 0 ? -w : w;
        int q = (aw * mf[pos_class(i)] + f_intra) >> qbits;
        acq[b][i] = w < 0 ? -q : q;
      }
      acq[b][0] = 0;
    }

    // luma DC: 4x4 Hadamard over the block-raster DC grid
    int dct_dc[16], had[16];
    for (int by = 0; by < 4; by++)
      for (int bx = 0; bx < 4; bx++) dct_dc[by * 4 + bx] = dcs[by * 4 + bx];
    hadamard4x4(dct_dc, had);
    // forward luma DC = (H*D*H + 1) >> 1: the decoder's DC rescale divides
    // by 4 relative to the AC path while the 4x4 Hadamard pair contributes
    // gain 16 forward, 1 inverse — the extra /2 lives in the encoder
    for (int i = 0; i < 16; i++) had[i] = (had[i] + 1) >> 1;
    int dcq[16];
    for (int i = 0; i < 16; i++) {
      int aw = had[i] < 0 ? -had[i] : had[i];
      int q = (aw * mf[0] + 2 * f_intra) >> (qbits + 1);
      dcq[i] = had[i] < 0 ? -q : q;
    }

    // dequantize DC: inverse Hadamard then scale. Spec 8.5.10 works in the
    // 16*V LevelScale domain; in the V domain (our inverse transform ends
    // with +32 >> 6, AC dequant is c*V << qp/6) it reduces to
    // f*V00 << (qp/6 - 2) — qp >= 12 is enforced at create().
    int dch[16];
    hadamard4x4(dcq, dch);  // inverse Hadamard == forward (scaled)
    int dcd[16];
    for (int i = 0; i < 16; i++) dcd[i] = (dch[i] * vq[0]) << (qp / 6 - 2);

    // reconstruct luma + detect coded ACs
    bool any_ac = false;
    int16_t block_nz[16];
    for (int b = 0; b < 16; b++) {
      int bx = (b & 3) * 4, by = (b >> 2) * 4;
      int deq[16];
      deq[0] = dcd[(b >> 2) * 4 + (b & 3)];
      int shift = qp / 6;
      for (int i = 1; i < 16; i++)
        deq[i] = (acq[b][i] * vq[pos_class(i)]) << shift;
      int rec[16];
      inverse4x4(deq, rec);
      for (int y = 0; y < 4; y++)
        for (int x = 0; x < 4; x++)
          rY[(mby * 16 + by + y) * W + mbx * 16 + bx + x] =
              clip255(rec[y * 4 + x] + dc);
      int cnt = 0;
      for (int i = 1; i < 16; i++)
        if (acq[b][i]) cnt++;
      block_nz[b] = static_cast<int16_t>(cnt);
      if (cnt) any_ac = true;
    }

    // ---- chroma: DC prediction + transform ----
    int cdcq[2][4];       // quantized 2x2 DC per component
    int cacq[2][4][16];   // quantized AC per component/block
    int16_t cnz[2][4];
    bool chroma_ac = false, chroma_dc_nz = false;
    int cqbits = 15 + qpc / 6;
    int cf_intra = (1 << cqbits) / 3;
    const int* cmf = kQuantMF[qpc % 6];
    const int* cvq = kDequantV[qpc % 6];
    for (int comp = 0; comp < 2; comp++) {
      std::vector<uint8_t>& S = comp ? V : U;
      std::vector<uint8_t>& R = comp ? rV : rU;
      // Chroma DC prediction is PER 4x4 QUADRANT (spec 8.3.4.1), not one
      // mean over the 8x8: corner quadrants combine a 4-sample top run and
      // a 4-sample left run; edge quadrants prefer their own side (top for
      // the top-right block, left for the bottom-left block).
      auto sum_left = [&](int y0) {
        int s = 0;
        for (int i = 0; i < 4; i++)
          s += R[(mby * 8 + y0 + i) * Wc + mbx * 8 - 1];
        return s;
      };
      auto sum_top = [&](int x0) {
        int s = 0;
        for (int i = 0; i < 4; i++)
          s += R[(mby * 8 - 1) * Wc + mbx * 8 + x0 + i];
        return s;
      };
      int cdc4[4];  // quadrant raster: (0,0) (1,0) (0,1) (1,1)
      for (int qy = 0; qy < 2; qy++)
        for (int qx = 0; qx < 2; qx++) {
          int p;
          if (qx == qy) {  // corner quadrants (0,0) and (1,1): combine
            if (left && top)
              p = (sum_left(qy * 4) + sum_top(qx * 4) + 4) >> 3;
            else if (left)
              p = (sum_left(qy * 4) + 2) >> 2;
            else if (top)
              p = (sum_top(qx * 4) + 2) >> 2;
            else
              p = 128;
          } else if (qx == 1) {  // top-right: prefer top
            if (top)
              p = (sum_top(4) + 2) >> 2;
            else if (left)
              p = (sum_left(0) + 2) >> 2;
            else
              p = 128;
          } else {  // bottom-left: prefer left
            if (left)
              p = (sum_left(4) + 2) >> 2;
            else if (top)
              p = (sum_top(0) + 2) >> 2;
            else
              p = 128;
          }
          cdc4[qy * 2 + qx] = p;
        }
      int dcs2[4];
      int trs[4][16];
      for (int b = 0; b < 4; b++) {
        int bx = (b & 1) * 4, by = (b >> 1) * 4;
        int cdc = cdc4[b];
        int res[16];
        for (int y = 0; y < 4; y++)
          for (int x = 0; x < 4; x++)
            res[y * 4 + x] =
                static_cast<int>(
                    S[(mby * 8 + by + y) * Wc + mbx * 8 + bx + x]) - cdc;
        forward4x4(res, trs[b]);
        dcs2[b] = trs[b][0];
        for (int i = 1; i < 16; i++) {
          int w = trs[b][i];
          int aw = w < 0 ? -w : w;
          int q = (aw * cmf[pos_class(i)] + cf_intra) >> cqbits;
          cacq[comp][b][i] = w < 0 ? -q : q;
          if (cacq[comp][b][i]) chroma_ac = true;
        }
        cacq[comp][b][0] = 0;
      }
      // 2x2 Hadamard
      int h0 = dcs2[0] + dcs2[1] + dcs2[2] + dcs2[3];
      int h1 = dcs2[0] - dcs2[1] + dcs2[2] - dcs2[3];
      int h2 = dcs2[0] + dcs2[1] - dcs2[2] - dcs2[3];
      int h3 = dcs2[0] - dcs2[1] - dcs2[2] + dcs2[3];
      int hh[4] = {h0, h1, h2, h3};
      for (int i = 0; i < 4; i++) {
        int aw = hh[i] < 0 ? -hh[i] : hh[i];
        int q = (aw * cmf[0] + 2 * cf_intra) >> (cqbits + 1);
        cdcq[comp][i] = hh[i] < 0 ? -q : q;
        if (cdcq[comp][i]) chroma_dc_nz = true;
      }
      // dequant chroma DC (spec 8.5.11, translated to the V domain):
      // inverse 2x2 Hadamard, then ((f * V00) << (qpc/6)) >> 1
      int f0 = cdcq[comp][0] + cdcq[comp][1] + cdcq[comp][2] + cdcq[comp][3];
      int f1 = cdcq[comp][0] - cdcq[comp][1] + cdcq[comp][2] - cdcq[comp][3];
      int f2 = cdcq[comp][0] + cdcq[comp][1] - cdcq[comp][2] - cdcq[comp][3];
      int f3 = cdcq[comp][0] - cdcq[comp][1] - cdcq[comp][2] + cdcq[comp][3];
      int fd[4] = {f0, f1, f2, f3};
      int dcd2[4];
      for (int i = 0; i < 4; i++)
        dcd2[i] = ((fd[i] * cvq[0]) << (qpc / 6)) >> 1;
      // reconstruct chroma
      for (int b = 0; b < 4; b++) {
        int bx = (b & 1) * 4, by = (b >> 1) * 4;
        int deq[16];
        deq[0] = dcd2[b];
        int shift = qpc / 6;
        for (int i = 1; i < 16; i++)
          deq[i] = (cacq[comp][b][i] * cvq[pos_class(i)]) << shift;
        int rec[16];
        inverse4x4(deq, rec);
        for (int y = 0; y < 4; y++)
          for (int x = 0; x < 4; x++)
            R[(mby * 8 + by + y) * Wc + mbx * 8 + bx + x] =
                clip255(rec[y * 4 + x] + cdc4[b]);
        int cnt = 0;
        for (int i = 1; i < 16; i++)
          if (cacq[comp][b][i]) cnt++;
        cnz[comp][b] = static_cast<int16_t>(cnt);
      }
    }

    // ---- syntax ----
    int cbp_luma = any_ac ? 1 : 0;                      // 0 or 15, as flag
    int cbp_chroma = chroma_ac ? 2 : (chroma_dc_nz ? 1 : 0);
    // I_16x16 mb_type: 1 + pred(2=DC) + 4*cbp_chroma + 12*cbp_luma_flag
    bw.ue(1 + 2 + 4 * cbp_chroma + 12 * cbp_luma);
    bw.ue(0);  // intra_chroma_pred_mode = DC
    bw.se(0);  // mb_qp_delta

    // luma DC coefficients (Intra16x16DCLevel), zig-zag over the DC grid
    int zz[16];
    for (int i = 0; i < 16; i++) zz[i] = dcq[kZigzag4x4[i]];
    int nC = nc_context(nzY, mb_w * 4, mbx * 4, mby * 4, 0, 0);
    cavlc_block(bw, zz, 16, nC);

    // per-4x4 AC (Intra16x16ACLevel) in the standard 8x8-then-4x4 order,
    // only when cbp_luma (all-or-nothing for I_16x16)
    static const int kBlockOrder[16] = {0, 1, 4, 5, 2, 3, 6, 7,
                                        8, 9, 12, 13, 10, 11, 14, 15};
    if (cbp_luma) {
      for (int k = 0; k < 16; k++) {
        int b = kBlockOrder[k];
        int bx = mbx * 4 + (b & 3), by = mby * 4 + (b >> 2);
        int nc = nc_context(nzY, mb_w * 4, bx, by, 0, 0);
        int zz2[15];
        for (int i = 1; i < 16; i++) zz2[i - 1] = acq[b][kZigzag4x4[i]];
        int tc = cavlc_block(bw, zz2, 15, nc);
        nzY[by * (mb_w * 4) + bx] = static_cast<int16_t>(tc);
      }
    } else {
      for (int b = 0; b < 16; b++)
        nzY[(mby * 4 + (b >> 2)) * (mb_w * 4) + mbx * 4 + (b & 3)] = 0;
    }

    // chroma DC (both components) when cbp_chroma > 0
    if (cbp_chroma) {
      for (int comp = 0; comp < 2; comp++) {
        int zz2[4] = {cdcq[comp][0], cdcq[comp][1], cdcq[comp][2],
                      cdcq[comp][3]};
        cavlc_block(bw, zz2, 4, -1);
      }
    }
    // chroma AC when cbp_chroma == 2
    for (int comp = 0; comp < 2; comp++) {
      std::vector<int16_t>& nzc = comp ? nzV : nzU;
      if (cbp_chroma == 2) {
        for (int b = 0; b < 4; b++) {
          int bx = mbx * 2 + (b & 1), by = mby * 2 + (b >> 1);
          int nc = nc_context(nzc, mb_w * 2, bx, by, 0, 0);
          int zz2[15];
          for (int i = 1; i < 16; i++)
            zz2[i - 1] = cacq[comp][b][kZigzag4x4[i]];
          int tc = cavlc_block(bw, zz2, 15, nc);
          nzc[by * (mb_w * 2) + bx] = static_cast<int16_t>(tc);
        }
      } else {
        for (int b = 0; b < 4; b++)
          nzc[(mby * 2 + (b >> 1)) * (mb_w * 2) + mbx * 2 + (b & 1)] = 0;
      }
    }
  }

  void encode_frame(const uint8_t* bgr) {
    size_t start = stream.size();
    if (frame_count == 0) write_sps_pps();
    load_bgr(bgr);
    // mark all nz contexts unavailable at frame start (slice boundary)
    std::fill(nzY.begin(), nzY.end(), static_cast<int16_t>(-1));
    std::fill(nzU.begin(), nzU.end(), static_cast<int16_t>(-1));
    std::fill(nzV.begin(), nzV.end(), static_cast<int16_t>(-1));

    BitWriter sl;
    // slice header (IDR, I slice)
    sl.ue(0);             // first_mb_in_slice
    sl.ue(7);             // slice_type I (all slices in pic)
    sl.ue(0);             // pps id
    sl.put(0, 4);         // frame_num (log2_max_frame_num = 4), 0 for IDR
    sl.ue(idr_pic_id);    // idr_pic_id
    idr_pic_id = (idr_pic_id + 1) & 1;
    sl.put_bit(0);        // no_output_of_prior_pics
    sl.put_bit(0);        // long_term_reference
    sl.se(0);             // slice_qp_delta
    sl.ue(1);             // disable_deblocking_filter_idc = 1 (off)

    for (int mby = 0; mby < mb_h; mby++)
      for (int mbx = 0; mbx < mb_w; mbx++) {
        if (pcm)
          encode_mb_pcm(sl, mbx, mby);
        else
          encode_mb_i16(sl, mbx, mby);
      }
    sl.rbsp_trailing();
    append_nal(stream, 3, 5, sl.buf);
    frame_sizes.push_back(stream.size() - start);
    frame_count++;
  }
};

}  // namespace

extern "C" {

void* h264enc_create(int width, int height, int qp, int pcm) {
  if (width <= 0 || height <= 0 || (width & 1) || (height & 1)) return nullptr;
  if (qp < 12) qp = 12;  // DC dequant path below assumes qp/6 >= 2
  if (qp > 51) qp = 51;
  return new Encoder(width, height, qp, pcm != 0);
}

void h264enc_encode_frame(void* enc, const uint8_t* bgr) {
  static_cast<Encoder*>(enc)->encode_frame(bgr);
}

uint64_t h264enc_size(void* enc) {
  return static_cast<Encoder*>(enc)->stream.size();
}

void h264enc_data(void* enc, uint8_t* out) {
  Encoder* e = static_cast<Encoder*>(enc);
  std::memcpy(out, e->stream.data(), e->stream.size());
}

int h264enc_frame_count(void* enc) {
  return static_cast<Encoder*>(enc)->frame_count;
}

void h264enc_frame_sizes(void* enc, uint64_t* out) {
  Encoder* e = static_cast<Encoder*>(enc);
  std::memcpy(out, e->frame_sizes.data(),
              e->frame_sizes.size() * sizeof(uint64_t));
}

void h264enc_recon(void* enc, uint8_t* y, uint8_t* u, uint8_t* v) {
  // last frame's reconstruction, cropped to width x height (luma) and
  // width/2 x height/2 (chroma). With deblocking disabled a conforming
  // decoder must reproduce these planes bit-exactly — the test oracle.
  Encoder* e = static_cast<Encoder*>(enc);
  int W = e->mb_w * 16, Wc = e->mb_w * 8;
  for (int r = 0; r < e->height; r++)
    std::memcpy(y + r * e->width, e->rY.data() + r * W, e->width);
  for (int r = 0; r < e->height / 2; r++) {
    std::memcpy(u + r * (e->width / 2), e->rU.data() + r * Wc, e->width / 2);
    std::memcpy(v + r * (e->width / 2), e->rV.data() + r * Wc, e->width / 2);
  }
}

void h264enc_destroy(void* enc) { delete static_cast<Encoder*>(enc); }

}  // extern "C"
