// Native uint16 fixed-point quantizer for the fleet upload path.
//
// The numpy implementation (train/quantize.py) costs ~2.2 s on an idle
// host but stretches to ~25 s when the axon tunnel agent is concurrently
// streaming geometry bytes on the same single core (measured in-bench) —
// numpy's multiple full-array temporaries lose badly under that memory/CPU
// contention.  This kernel does the minimum: one strided min/max pass and
// one code pass per (member, feature), no temporaries.
//
// Layout contract: X is C-contiguous (T, n, L, C) float32; codes out is
// (T, n, L, C) uint16; lo/scale out are (T, C) float32.  Sentinels match
// train/quantize.py: 0xFFFF NaN, 0xFFFE +inf, 0xFFFD -inf, values<=0xFFFC.
//
// No C++ exception may cross the C ABI (same contract as the other native
// components); the entry returns 0 on success.

#include <cmath>
#include <cstdint>
#include <limits>

namespace {
constexpr uint16_t kSentNan = 0xFFFF;
constexpr uint16_t kSentPinf = 0xFFFE;
constexpr uint16_t kSentNinf = 0xFFFD;
constexpr float kMaxCode = 65532.0f;
}  // namespace

extern "C" int quant_u16(const float* X, int64_t T, int64_t n, int64_t L,
                         int64_t C, uint16_t* codes, float* lo_out,
                         float* scale_out) {
  if (C > 256) return 1;  // caller falls back to the numpy path
  const int64_t rows = n * L;           // (n*L, C) per member
  for (int64_t t = 0; t < T; ++t) {
    const float* base = X + t * rows * C;
    float* lo = lo_out + t * C;
    float* sc = scale_out + t * C;
    // pass 1: per-feature min/max over finite values (row-major sweep so
    // the stream stays sequential; C is small, accumulators stay in cache)
    float mn[64], mx[64];
    // C can exceed the stack block; process features in blocks of 64
    for (int64_t c0 = 0; c0 < C; c0 += 64) {
      const int64_t cb = (C - c0 < 64) ? C - c0 : 64;
      for (int64_t c = 0; c < cb; ++c) {
        mn[c] = std::numeric_limits<float>::infinity();
        mx[c] = -std::numeric_limits<float>::infinity();
      }
      for (int64_t r = 0; r < rows; ++r) {
        const float* p = base + r * C + c0;
        for (int64_t c = 0; c < cb; ++c) {
          const float v = p[c];
          if (std::isfinite(v)) {
            if (v < mn[c]) mn[c] = v;
            if (v > mx[c]) mx[c] = v;
          }
        }
      }
      for (int64_t c = 0; c < cb; ++c) {
        if (!(mn[c] <= mx[c])) {  // no finite values at all
          lo[c0 + c] = 0.0f;
          sc[c0 + c] = 0.0f;
        } else {
          lo[c0 + c] = mn[c];
          sc[c0 + c] = (mx[c] - mn[c]) / kMaxCode;
        }
      }
    }
    // pass 2: codes (round-half-up inside the guaranteed range)
    float inv[256];
    for (int64_t c = 0; c < C && c < 256; ++c)
      inv[c] = sc[c] > 0.0f ? 1.0f / sc[c] : 0.0f;
    uint16_t* out = codes + t * rows * C;
    for (int64_t r = 0; r < rows; ++r) {
      const float* p = base + r * C;
      uint16_t* q = out + r * C;
      for (int64_t c = 0; c < C; ++c) {
        const float v = p[c];
        if (std::isfinite(v)) {
          float f = (v - lo[c]) * inv[c] + 0.5f;
          if (f > kMaxCode) f = kMaxCode;
          if (f < 0.0f) f = 0.0f;
          q[c] = static_cast<uint16_t>(f);
        } else if (std::isnan(v)) {
          q[c] = kSentNan;
        } else {
          q[c] = v > 0.0f ? kSentPinf : kSentNinf;
        }
      }
    }
  }
  return 0;
}
