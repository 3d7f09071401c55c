// Native legacy-VTK POLYDATA parser (points + lines) with a C ABI for ctypes.
//
// Host-side I/O is the single-core bottleneck of the geometry stage (the TPU
// kernel is orders of magnitude faster than parsing); this parser replaces
// the Python tokenizer for both ASCII and BINARY legacy files, handling the
// classic v4 cell layout ([npts ids...] packed) and the v5.1
// OFFSETS/CONNECTIVITY layout.  Gzip decompression stays in Python (zlib is
// already C there); this receives a decompressed buffer.
//
// Contract mirrors lesionvae_tpu/io/vtk.py:read_vtk_polydata — returns CSR
// (points, offsets, connectivity).

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parsed {
  std::vector<double> points;        // 3*n_points
  std::vector<int64_t> offsets;      // n_cells + 1
  std::vector<int64_t> connectivity; // total ids
  std::string error;
};

struct Cursor {
  const char* data;
  size_t len;
  size_t pos = 0;

  bool eof() const { return pos >= len; }

  // read one line (without newline), trimmed
  std::string line() {
    size_t start = pos;
    while (pos < len && data[pos] != '\n') pos++;
    size_t end = pos;
    if (pos < len) pos++;  // skip newline
    while (start < end && isspace((unsigned char)data[start])) start++;
    while (end > start && isspace((unsigned char)data[end - 1])) end--;
    return std::string(data + start, end - start);
  }

  // parse `count` ASCII floats spanning lines
  bool ascii_doubles(size_t count, std::vector<double>& out) {
    // Declared counts are untrusted: each ASCII number occupies >= 1 byte, so
    // any count exceeding the remaining buffer is malformed.  Rejecting here
    // (before reserve) prevents bad_alloc on absurd headers like
    // "POINTS 999999999999999 float".
    if (count > len - pos) return false;
    out.reserve(out.size() + count);
    const char* p = data + pos;
    const char* lim = data + len;
    for (size_t i = 0; i < count; i++) {
      char* next = nullptr;
      double v = strtod(p, &next);
      if (next == p) return false;
      out.push_back(v);
      p = next;
    }
    // advance past the trailing newline
    while (p < lim && *p != '\n') p++;
    if (p < lim) p++;
    pos = (size_t)(p - data);
    return true;
  }

  bool ascii_ints(size_t count, std::vector<int64_t>& out) {
    if (count > len - pos) return false;  // see ascii_doubles
    out.reserve(out.size() + count);
    const char* p = data + pos;
    const char* lim = data + len;
    for (size_t i = 0; i < count; i++) {
      char* next = nullptr;
      long long v = strtoll(p, &next, 10);
      if (next == p) return false;
      out.push_back((int64_t)v);
      p = next;
    }
    while (p < lim && *p != '\n') p++;
    if (p < lim) p++;
    pos = (size_t)(p - data);
    return true;
  }

  // big-endian binary scalars
  template <typename T>
  bool binary(size_t count, std::vector<T>& out, size_t elem_size,
              bool is_float) {
    // count*elem_size can wrap size_t for hostile declared counts, bypassing
    // a pos+nbytes bounds check; divide instead of multiplying.
    if (elem_size == 0 || count > (len - pos) / elem_size) return false;
    size_t nbytes = count * elem_size;
    const unsigned char* p = (const unsigned char*)(data + pos);
    out.reserve(out.size() + count);
    for (size_t i = 0; i < count; i++, p += elem_size) {
      uint64_t raw = 0;
      for (size_t b = 0; b < elem_size; b++) raw = (raw << 8) | p[b];
      if (is_float) {
        if (elem_size == 4) {
          uint32_t r32 = (uint32_t)raw;
          float f;
          memcpy(&f, &r32, 4);
          out.push_back((T)f);
        } else {
          double d;
          memcpy(&d, &raw, 8);
          out.push_back((T)d);
        }
      } else {
        if (elem_size == 4) {
          out.push_back((T)(int32_t)(uint32_t)raw);
        } else {
          out.push_back((T)(int64_t)raw);
        }
      }
    }
    pos += nbytes;
    if (pos < len && data[pos] == '\n') pos++;
    return true;
  }
};

size_t dtype_size(const std::string& name) {
  if (name == "float" || name == "int" || name == "unsigned_int" ||
      name == "vtktypeint32" || name == "vtktypeuint32")
    return 4;
  if (name == "double" || name == "long" || name == "unsigned_long" ||
      name == "vtktypeint64" || name == "vtktypeuint64")
    return 8;
  if (name == "short" || name == "unsigned_short") return 2;
  if (name == "char" || name == "unsigned_char") return 1;
  return 4;
}

std::string upper(std::string s) {
  for (auto& c : s) c = (char)toupper((unsigned char)c);
  return s;
}

std::vector<std::string> tokens(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && isspace((unsigned char)s[i])) i++;
    size_t j = i;
    while (j < s.size() && !isspace((unsigned char)s[j])) j++;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

void parse_impl(const char* buf, size_t len, Parsed* out) {
  Cursor cur{buf, len};

  std::string header = cur.line();
  if (header.find("vtk") == std::string::npos &&
      header.find("VTK") == std::string::npos) {
    out->error = "not a legacy VTK file";
    return;
  }
  cur.line();  // title
  std::string fmt = upper(cur.line());
  bool binary = fmt == "BINARY";
  if (!binary && fmt != "ASCII") {
    out->error = "unsupported encoding: " + fmt;
    return;
  }
  std::string dataset = upper(cur.line());
  if (dataset.find("POLYDATA") == std::string::npos) {
    out->error = "expected DATASET POLYDATA";
    return;
  }

  while (!cur.eof()) {
    std::string ln = cur.line();
    if (ln.empty()) continue;
    auto tok = tokens(ln);
    std::string kw = upper(tok[0]);

    if (kw == "POINTS" && tok.size() >= 3) {
      size_t n = (size_t)strtoll(tok[1].c_str(), nullptr, 10);
      std::string dt = tok[2];
      for (auto& c : dt) c = (char)tolower((unsigned char)c);
      if (binary) {
        if (!cur.binary<double>(3 * n, out->points, dtype_size(dt), true)) {
          out->error = "truncated POINTS";
          return;
        }
      } else if (!cur.ascii_doubles(3 * n, out->points)) {
        out->error = "bad ASCII POINTS";
        return;
      }
    } else if (kw == "LINES" && tok.size() >= 3) {
      size_t n_a = (size_t)strtoll(tok[1].c_str(), nullptr, 10);
      size_t n_b = (size_t)strtoll(tok[2].c_str(), nullptr, 10);
      size_t save = cur.pos;
      std::string nxt = cur.line();
      auto ntok = tokens(nxt);
      if (!ntok.empty() && upper(ntok[0]) == "OFFSETS") {
        std::string dt = ntok.size() > 1 ? ntok[1] : "vtktypeint64";
        for (auto& c : dt) c = (char)tolower((unsigned char)c);
        if (binary) {
          if (!cur.binary<int64_t>(n_a, out->offsets, dtype_size(dt), false)) {
            out->error = "truncated OFFSETS";
            return;
          }
        } else if (!cur.ascii_ints(n_a, out->offsets)) {
          out->error = "bad OFFSETS";
          return;
        }
        std::string cline = cur.line();
        while (cline.empty() && !cur.eof()) cline = cur.line();
        auto ctok = tokens(cline);
        if (ctok.empty() || upper(ctok[0]) != "CONNECTIVITY") {
          out->error = "expected CONNECTIVITY";
          return;
        }
        std::string cdt = ctok.size() > 1 ? ctok[1] : "vtktypeint64";
        for (auto& c : cdt) c = (char)tolower((unsigned char)c);
        if (binary) {
          if (!cur.binary<int64_t>(n_b, out->connectivity, dtype_size(cdt),
                                   false)) {
            out->error = "truncated CONNECTIVITY";
            return;
          }
        } else if (!cur.ascii_ints(n_b, out->connectivity)) {
          out->error = "bad CONNECTIVITY";
          return;
        }
      } else {
        // classic v4 packed layout
        cur.pos = save;
        std::vector<int64_t> flat;
        if (binary) {
          if (!cur.binary<int64_t>(n_b, flat, 4, false)) {
            out->error = "truncated LINES";
            return;
          }
        } else if (!cur.ascii_ints(n_b, flat)) {
          out->error = "bad LINES";
          return;
        }
        out->offsets.push_back(0);
        size_t i = 0;
        while (i < flat.size() && out->offsets.size() <= n_a) {
          int64_t npts = flat[i];
          if (npts < 0) {  // hostile cell size would wrap the index advance
            out->error = "negative cell size in LINES";
            return;
          }
          for (int64_t k = 0; k < npts && i + 1 + (size_t)k < flat.size(); k++)
            out->connectivity.push_back(flat[i + 1 + k]);
          out->offsets.push_back((int64_t)out->connectivity.size());
          i += 1 + (size_t)npts;
        }
      }
    } else if (kw == "POINT_DATA" || kw == "CELL_DATA" || kw == "FIELD") {
      break;
    }
  }
  if (out->offsets.empty()) out->offsets.push_back(0);
}

// No C++ exception may cross the C ABI (ctypes would see std::terminate);
// any throw (e.g. bad_alloc on a huge well-formed file) becomes a stored
// error string the Python side raises as ValueError.
Parsed* parse(const char* buf, size_t len) {
  auto* out = new Parsed();
  try {
    parse_impl(buf, len, out);
  } catch (const std::exception& e) {
    out->points.clear();
    out->offsets.assign(1, 0);
    out->connectivity.clear();
    out->error = std::string("parse failure: ") + e.what();
  } catch (...) {
    out->error = "parse failure";
  }
  return out;
}

}  // namespace

extern "C" {

void* vtk_parse(const char* buf, int64_t len) {
  return parse(buf, (size_t)len);
}

const char* vtk_error(void* h) {
  auto* p = (Parsed*)h;
  return p->error.empty() ? nullptr : p->error.c_str();
}

int64_t vtk_n_points(void* h) { return (int64_t)((Parsed*)h)->points.size() / 3; }
int64_t vtk_n_cells(void* h) { return (int64_t)((Parsed*)h)->offsets.size() - 1; }
int64_t vtk_n_conn(void* h) { return (int64_t)((Parsed*)h)->connectivity.size(); }

const double* vtk_points(void* h) { return ((Parsed*)h)->points.data(); }
const int64_t* vtk_offsets(void* h) { return ((Parsed*)h)->offsets.data(); }
const int64_t* vtk_connectivity(void* h) {
  return ((Parsed*)h)->connectivity.data();
}

void vtk_free(void* h) { delete (Parsed*)h; }

}  // extern "C"
