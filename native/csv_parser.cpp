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

// Fast decimal float: [-]ddd[.ddd][e|E[+-]dd].  Falls back to NaN on empty
// or non-numeric fields ("", "nan" handled below).
inline float parse_float(const char* s, const char* end) {
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
  double v = 0.0;
  while (s < end && *s >= '0' && *s <= '9') v = v * 10.0 + (*s++ - '0');
  if (s < end && *s == '.') {
    ++s;
    double scale = 0.1;
    while (s < end && *s >= '0' && *s <= '9') {
      v += (*s++ - '0') * scale;
      scale *= 0.1;
    }
  }
  if (s < end && ((*s | 32) == 'e')) {
    ++s;
    bool eneg = false;
    if (s < end && (*s == '-' || *s == '+')) eneg = (*s++ == '-');
    int exp = 0;
    while (s < end && *s >= '0' && *s <= '9') exp = exp * 10 + (*s++ - '0');
    v *= std::pow(10.0, eneg ? -exp : exp);
  }
  return static_cast<float>(neg ? -v : v);
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
