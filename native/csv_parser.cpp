// Native reader for per-subject tract-profile CSVs.
//
// The reference's VAE data stage re-reads per-subject CSVs every run
// (reference: src/vae/data_loader.py:27-148 via pandas).  On the 1-core
// bench host general-purpose CSV parsers move ~180 MB/s; this specialized
// parser (fixed schema: one string tract column + float columns) runs at
// roughly 2x that by hand-rolling the float scan and exploiting that
// tract_id values come in contiguous runs (only run BOUNDARIES are needed
// downstream, never a per-row string).
//
// Contract mirrors ADVICE r1 on the VTK parser: no C++ exception may cross
// the C ABI — errors are stored on the handle; malformed fields parse as
// NaN and short rows are NaN-padded (skip-and-continue happens upstream).

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parsed {
  std::vector<float> values;       // n_rows * n_want, row-major
  std::vector<int64_t> run_starts; // first row index of each tract run
  std::string run_names;           // NUL-joined names, run_starts.size() entries
  int64_t n_rows = 0;
  std::string error;
};

// Exact powers of ten 10^0..10^22: every entry is exactly representable in
// an IEEE double (5^22 < 2^53), so one multiply/divide by an entry is a
// single correctly-rounded operation.
static const double kPow10[] = {
    1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,  1e10, 1e11,
    1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};

// Decimal float parse: [-]ddd[.ddd][e|E[+-]dd].  Falls back to NaN on empty
// or non-numeric fields ("", "nan" handled below).
//
// Correct rounding: the mantissa accumulates as an exact u64 integer and the
// decimal exponent applies as ONE multiply/divide by an exact power of ten
// (Clinger's fast path: exact when mant < 2^53 and |dexp| <= 22), yielding
// the correctly rounded DOUBLE; longer/wider tokens fall back to strtod.
// The float32 cast of that double matches pandas/pyarrow exactly (both parse
// to float64 then cast), so the three bench reader paths agree bit-for-bit.
inline float parse_float(const char* s0, const char* end) {
  const char* s = s0;
  if (s == end) return NAN;
  bool neg = false;
  if (*s == '-') { neg = true; ++s; }
  else if (*s == '+') ++s;
  if (s == end) return NAN;
  if ((*s < '0' || *s > '9') && *s != '.') {
    // nan / inf spellings (any case)
    if (end - s >= 3) {
      char a = s[0] | 32, b = s[1] | 32, c = s[2] | 32;
      if (a == 'n' && b == 'a' && c == 'n') return NAN;
      if (a == 'i' && b == 'n' && c == 'f')
        return neg ? -INFINITY : INFINITY;
    }
    return NAN;
  }
  uint64_t mant = 0;
  int nd = 0;    // digits folded into mant (cap 19 -> may exceed 2^53)
  int dexp = 0;  // decimal exponent adjustment
  while (s < end && *s >= '0' && *s <= '9') {
    if (nd < 19) { mant = mant * 10 + static_cast<uint64_t>(*s - '0'); ++nd; }
    else ++dexp;  // integer digits beyond capacity shift the exponent
    ++s;
  }
  if (s < end && *s == '.') {
    ++s;
    while (s < end && *s >= '0' && *s <= '9') {
      if (nd < 19) {
        mant = mant * 10 + static_cast<uint64_t>(*s - '0');
        ++nd;
        --dexp;
      }  // fraction digits beyond capacity are dropped -> slow path below
      ++s;
    }
  }
  if (s < end && ((*s | 32) == 'e')) {
    ++s;
    bool eneg = false;
    if (s < end && (*s == '-' || *s == '+')) eneg = (*s++ == '-');
    int exp = 0;
    while (s < end && *s >= '0' && *s <= '9') exp = exp * 10 + (*s++ - '0');
    dexp += eneg ? -exp : exp;
  }
  if (nd < 19 && mant < (1ULL << 53) && dexp >= -22 && dexp <= 22) {
    double v = static_cast<double>(mant);
    v = dexp >= 0 ? v * kPow10[dexp] : v / kPow10[-dexp];
    return static_cast<float>(neg ? -v : v);
  }
  // rare (>18 significant digits or |exp|>22): bounded copy + libc strtod
  char buf[512];
  size_t n = static_cast<size_t>(end - s0);
  if (n > sizeof(buf) - 1) n = sizeof(buf) - 1;
  memcpy(buf, s0, n);
  buf[n] = '\0';
  return static_cast<float>(strtod(buf, nullptr));
}

void parse_impl(const char* data, int64_t len, const int32_t* want,
                int32_t n_want, int32_t tract_col, Parsed* out) {
  const char* p = data;
  const char* end = data + len;
  // skip the header line (caller resolved column indices from it)
  const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
  if (!nl) { out->error = "no data rows (missing newline)"; return; }
  p = nl + 1;

  // column index -> slot in the output row (-1 = skip)
  int32_t max_col = tract_col;
  for (int32_t i = 0; i < n_want; ++i)
    if (want[i] > max_col) max_col = want[i];
  std::vector<int32_t> slot(static_cast<size_t>(max_col) + 1, -1);
  for (int32_t i = 0; i < n_want; ++i) slot[want[i]] = i;

  // rows ~ newline count; reserve to avoid growth reallocs
  int64_t approx_rows = 1;
  for (const char* q = p; (q = static_cast<const char*>(
           memchr(q, '\n', end - q))) != nullptr; ++q)
    ++approx_rows;
  out->values.reserve(static_cast<size_t>(approx_rows) * n_want);

  std::string prev_tract;
  std::vector<float> row(n_want, NAN);
  while (p < end) {
    const char* line_end = static_cast<const char*>(
        memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    if (line_end == p) { p = line_end + 1; continue; }  // blank line

    std::fill(row.begin(), row.end(), NAN);
    int32_t col = 0;
    const char* f = p;
    while (f <= line_end && col <= max_col) {
      const char* fe = static_cast<const char*>(
          memchr(f, ',', line_end - f));
      if (!fe) fe = line_end;
      const char* ve = fe;
      if (ve > f && ve[-1] == '\r') --ve;
      if (col == tract_col) {
        if (prev_tract.size() != static_cast<size_t>(ve - f) ||
            memcmp(prev_tract.data(), f, ve - f) != 0) {
          prev_tract.assign(f, ve);
          out->run_starts.push_back(out->n_rows);
          out->run_names.append(f, ve);
          out->run_names.push_back('\0');
        }
      } else if (col < static_cast<int32_t>(slot.size()) &&
                 slot[col] >= 0) {
        row[slot[col]] = parse_float(f, ve);
      }
      f = fe + 1;
      ++col;
    }
    out->values.insert(out->values.end(), row.begin(), row.end());
    ++out->n_rows;
    p = line_end + 1;
  }
}

}  // namespace

extern "C" {

void* csvp_parse(const char* data, int64_t len, const int32_t* want,
                 int32_t n_want, int32_t tract_col) {
  auto* out = new (std::nothrow) Parsed();
  if (!out) return nullptr;
  if (len < 0 || n_want <= 0 || tract_col < 0) {
    out->error = "invalid arguments";
    return out;
  }
  try {
    parse_impl(data, len, want, n_want, tract_col, out);
  } catch (const std::exception& e) {
    out->error = e.what();
  } catch (...) {
    out->error = "unknown parse failure";
  }
  return out;
}

const char* csvp_error(void* h) {
  auto* o = static_cast<Parsed*>(h);
  return o->error.empty() ? nullptr : o->error.c_str();
}
int64_t csvp_n_rows(void* h) { return static_cast<Parsed*>(h)->n_rows; }
int32_t csvp_n_runs(void* h) {
  return static_cast<int32_t>(static_cast<Parsed*>(h)->run_starts.size());
}
const float* csvp_values(void* h) {
  return static_cast<Parsed*>(h)->values.data();
}
const int64_t* csvp_run_starts(void* h) {
  return static_cast<Parsed*>(h)->run_starts.data();
}
const char* csvp_run_names(void* h) {
  return static_cast<Parsed*>(h)->run_names.c_str();
}
void csvp_free(void* h) { delete static_cast<Parsed*>(h); }

}  // extern "C"
