// Bitpacked-mask expansion that routes model channels straight into the
// interleaved float32 ensemble buffer in one sequential pass.
//
// The engine downloads binary masks bitpacked 8 pixels/byte (octseg/ops/
// bitpack.py; the relay link is ~11 MB/s down). The numpy host path then
// paid twice: np.unpackbits materializes a full uint8 intermediate, and the
// per-channel `result[..., dst] = pred[..., src]` assignment is a strided
// float32 scatter — measured ~115 s of host work for a 500-frame 1000px
// pullback on this 1-core rig (vs 4.3 s of device compute). This kernel
// expands bits and writes the routed channels of the final float32 buffer
// directly, touching each output row once while it is hot in cache.
//
// No reference counterpart: the reference never batches masks host-ward
// (src/predict.py:85-100 round-trips float tensors per frame).

#include <cstdint>

extern "C" void octseg_unpack_route(
    const uint8_t* packed,  // (n, h, wb, cs), C-contiguous
    int64_t n, int64_t h, int64_t wb, int64_t cs,
    int64_t out_w,          // pixels along W (<= wb*8; rest is pack padding)
    float* out,             // (n, h, out_w, oc), C-contiguous
    int64_t oc,
    const int32_t* routes,  // n_routes pairs (src_ch, dst_ch)
    int64_t n_routes) {
  for (int64_t fr = 0; fr < n * h; ++fr) {  // frame-row fusion
    const uint8_t* row = packed + fr * wb * cs;
    float* orow = out + fr * out_w * oc;
    for (int64_t t = 0; t < n_routes; ++t) {
      const int32_t src = routes[2 * t], dst = routes[2 * t + 1];
      for (int64_t b = 0; b < wb; ++b) {
        const uint8_t byte = row[b * cs + src];
        const int64_t base = b * 8;
        const int64_t lim = (base + 8 <= out_w) ? 8 : (out_w - base);
        float* po = orow + base * oc + dst;
        for (int64_t j = 0; j < lim; ++j)
          po[j * oc] = static_cast<float>((byte >> (7 - j)) & 1);
      }
    }
  }
}
