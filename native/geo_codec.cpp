// Native u16 delta codec + reference-grade torsion for the geometry upload.
//
// The geometry stage is wire-bound: ~141 MB of padded f32 points cross a
// 7-40 MB/s link per cohort run.  The u16 DELTA codec (first point exact
// f32, forward differences quantized per (streamline, axis) range) halves
// those bytes at ~3-8 nm resolution on real tracts.  Torsion is the one
// metric whose conditioning cannot absorb that noise (tau = (b.db)/|b|^2
// amplifies without bound as |b| -> 0 — measured p99 rel shift 4.9e-3 vs
// the f32 path's 2.7e-6, benchmarks/geo_codec_probe.py), so it is computed
// HERE, on the host, from the ORIGINAL points in f64 — i.e. exactly the
// reference formula (tract_geom_proc.py:85-96) — and overwrites the device
// value.  numpy equivalents cost 1.2-2.4 s (encode) + ~5 s (torsion) on
// the contended 1-core bench host; these single-pass kernels run ~10x
// cheaper.
//
// Layout contract: pts is C-contiguous (S, P, 3) float32; lens (S,) int32
// with 2 <= lens[s] <= P.  No C++ exception may cross the C ABI; entries
// return 0 on success.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

// np.gradient along the first axis for an (n, 3) row in f64:
// one-sided at the ends, central differences inside.
inline void gradient3(const double* x, int64_t n, double* g) {
  for (int64_t k = 0; k < 3; ++k) {
    g[k] = x[3 + k] - x[k];
    g[(n - 1) * 3 + k] = x[(n - 1) * 3 + k] - x[(n - 2) * 3 + k];
  }
  for (int64_t i = 1; i + 1 < n; ++i)
    for (int64_t k = 0; k < 3; ++k)
      g[i * 3 + k] = 0.5 * (x[(i + 1) * 3 + k] - x[(i - 1) * 3 + k]);
}

inline void cross3(const double* u, const double* v, double* w) {
  w[0] = u[1] * v[2] - u[2] * v[1];
  w[1] = u[2] * v[0] - u[0] * v[2];
  w[2] = u[0] * v[1] - u[1] * v[0];
}

}  // namespace

// Encode (S, P, 3) f32 points into u16 delta codes.
// Outputs: codes (S, P-1, 3) u16 (pad region zero), p0/lo/sc (S, 3) f32.
// Decode (done on device): d_i = lo + code_i * sc (masked to the first
// lens-1 deltas), x = concat([p0, p0 + cumsum(d)]).
extern "C" int geo_encode_u16(const float* pts, int64_t S, int64_t P,
                              const int32_t* lens, uint16_t* codes,
                              float* p0, float* lo_out, float* sc_out) {
  if (P < 2) return 1;
  const int64_t PD = P - 1;
  for (int64_t s = 0; s < S; ++s) {
    const float* row = pts + s * P * 3;
    const int64_t nd = (lens[s] > 1 ? lens[s] : 1) - 1;  // real deltas
    uint16_t* c = codes + s * PD * 3;
    for (int64_t k = 0; k < 3; ++k) p0[s * 3 + k] = row[k];
    float mn[3], mx[3];
    for (int64_t k = 0; k < 3; ++k) {
      mn[k] = std::numeric_limits<float>::infinity();
      mx[k] = -std::numeric_limits<float>::infinity();
    }
    for (int64_t i = 0; i < nd; ++i) {
      for (int64_t k = 0; k < 3; ++k) {
        const float d = row[(i + 1) * 3 + k] - row[i * 3 + k];
        if (d < mn[k]) mn[k] = d;
        if (d > mx[k]) mx[k] = d;
      }
    }
    float lo[3], sc[3];
    for (int64_t k = 0; k < 3; ++k) {
      lo[k] = (nd > 0 && std::isfinite(mn[k])) ? mn[k] : 0.0f;
      float span = (nd > 0 && std::isfinite(mx[k])) ? mx[k] - lo[k] : 0.0f;
      sc[k] = span > 0.0f ? span / 65535.0f : 1.0f;
      lo_out[s * 3 + k] = lo[k];
      sc_out[s * 3 + k] = sc[k];
    }
    for (int64_t i = 0; i < nd; ++i) {
      for (int64_t k = 0; k < 3; ++k) {
        const float d = row[(i + 1) * 3 + k] - row[i * 3 + k];
        // divide (not multiply-by-reciprocal): bit-identical to the numpy
        // fallback's rint((d - lo) / sc), so codes are interchangeable
        float q = std::nearbyint((d - lo[k]) / sc[k]);
        if (q < 0.0f) q = 0.0f;
        if (q > 65535.0f) q = 65535.0f;
        c[i * 3 + k] = static_cast<uint16_t>(q);
      }
    }
    for (int64_t i = nd; i < PD; ++i)
      for (int64_t k = 0; k < 3; ++k) c[i * 3 + k] = 0;
  }
  return 0;
}

// Reference-exact torsion_mean (tract_geom_proc.py:85-96) in f64 for each
// of S padded streamlines: v = grad(x), a = grad(v), b = v x a,
// db = grad(b), tau = (b.db)/(|b|^2 + 1e-12), mean of finite tau; 0 when
// n < 4.  out is (S,) float64.
extern "C" int geo_torsion_f64(const float* pts, int64_t S, int64_t P,
                               const int32_t* lens, double* out) {
  std::vector<double> x(P * 3), v(P * 3), a(P * 3), b(P * 3), db(P * 3);
  for (int64_t s = 0; s < S; ++s) {
    const int64_t n = lens[s];
    if (n < 4) {
      out[s] = 0.0;
      continue;
    }
    const float* row = pts + s * P * 3;
    for (int64_t i = 0; i < n * 3; ++i) x[i] = static_cast<double>(row[i]);
    gradient3(x.data(), n, v.data());
    gradient3(v.data(), n, a.data());
    for (int64_t i = 0; i < n; ++i) cross3(&v[i * 3], &a[i * 3], &b[i * 3]);
    gradient3(b.data(), n, db.data());
    double sum = 0.0;
    int64_t cnt = 0;
    for (int64_t i = 0; i < n; ++i) {
      const double b2 = b[i * 3] * b[i * 3] + b[i * 3 + 1] * b[i * 3 + 1]
                        + b[i * 3 + 2] * b[i * 3 + 2];
      const double num = b[i * 3] * db[i * 3] + b[i * 3 + 1] * db[i * 3 + 1]
                         + b[i * 3 + 2] * db[i * 3 + 2];
      const double tau = num / (b2 + 1e-12);
      if (std::isfinite(tau)) {
        sum += tau;
        ++cnt;
      }
    }
    out[s] = cnt ? sum / static_cast<double>(cnt) : 0.0;
  }
  return 0;
}
