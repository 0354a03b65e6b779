// Native data-loader: fast COLMAP binary / PLY parsing.
//
// The reference's native layer is CUDA kernels; its data loading is pure
// Python (scene/colmap_loader.py struct.unpack loops — O(seconds) on big
// models). This module is the TPU framework's native runtime counterpart:
// single-pass C++ parsers exposed through a C ABI (ctypes on the Python
// side, materialrefgs_tpu/data/native_io.py), with NumPy-compatible output
// buffers owned by the caller.
//
// Build: cc -O3 -shared -fPIC -o libfastio.so fastio.cpp (see build.sh).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

extern "C" {

struct Buffer {
  void* data;
  int64_t size;  // element count
};

static char g_err[256] = {0};

const char* fastio_last_error() { return g_err; }

static void set_err(const char* msg) {
  snprintf(g_err, sizeof(g_err), "%s", msg);
}

static std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> out;
  FILE* f = fopen(path, "rb");
  if (!f) {
    set_err("cannot open file");
    return out;
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(n);
  if (fread(out.data(), 1, n, f) != (size_t)n) out.clear();
  fclose(f);
  return out;
}

// ---------------------------------------------------------------- COLMAP ----

// points3D.bin -> xyz (N,3) f64, rgb (N,3) u8, error (N,) f64.
// Returns N, or -1 on failure. Caller frees via fastio_free.
int64_t fastio_read_points3d(const char* path, double** xyz_out,
                             uint8_t** rgb_out, double** err_out) {
  auto buf = read_file(path);
  if (buf.empty()) return -1;
  const uint8_t* p = buf.data();
  const uint8_t* end = p + buf.size();
  if (p + 8 > end) { set_err("truncated header"); return -1; }
  uint64_t n;
  memcpy(&n, p, 8);
  p += 8;
  // A hostile/corrupt count would overflow malloc sizes and the per-row
  // pointer checks (p + k > end wraps); each row is >= 51 bytes, so n is
  // bounded by the remaining file size.
  if (n > (uint64_t)(end - p) / 51) { set_err("bad point count"); return -1; }
  double* xyz = (double*)malloc(n * 3 * sizeof(double));
  uint8_t* rgb = (uint8_t*)malloc(n * 3);
  double* err = (double*)malloc(n * sizeof(double));
  if ((n && !xyz) || (n && !rgb) || (n && !err)) {
    set_err("oom");
    free(xyz); free(rgb); free(err);
    return -1;
  }
  for (uint64_t i = 0; i < n; i++) {
    // point3D_id(u64) xyz(3d) rgb(3u8) error(d) track_len(u64) track(2*i32 each)
    if (p + 8 + 24 + 3 + 8 + 8 > end) { set_err("truncated point"); goto fail; }
    p += 8;
    memcpy(xyz + i * 3, p, 24);
    p += 24;
    memcpy(rgb + i * 3, p, 3);
    p += 3;
    memcpy(err + i, p, 8);
    p += 8;
    uint64_t tl;
    memcpy(&tl, p, 8);
    p += 8;
    if (tl > (uint64_t)(end - p) / 8) { set_err("truncated track"); goto fail; }
    p += tl * 8;
  }
  *xyz_out = xyz;
  *rgb_out = rgb;
  *err_out = err;
  return (int64_t)n;
fail:
  free(xyz); free(rgb); free(err);
  return -1;
}

// images.bin -> per-image qvec(4d) tvec(3d) camera_id(i32) + names packed.
// names_out: NUL-joined string buffer; names_len its byte length.
int64_t fastio_read_images(const char* path, double** qvec_out,
                           double** tvec_out, int32_t** camid_out,
                           char** names_out, int64_t* names_len) {
  auto buf = read_file(path);
  if (buf.empty()) return -1;
  const uint8_t* p = buf.data();
  const uint8_t* end = p + buf.size();
  if (p + 8 > end) { set_err("truncated header"); return -1; }
  uint64_t n;
  memcpy(&n, p, 8);
  p += 8;
  if (n > (uint64_t)(end - p) / 64) { set_err("bad image count"); return -1; }
  double* qv = (double*)malloc(n * 4 * sizeof(double));
  double* tv = (double*)malloc(n * 3 * sizeof(double));
  int32_t* cid = (int32_t*)malloc(n * sizeof(int32_t));
  if ((n && !qv) || (n && !tv) || (n && !cid)) {
    set_err("oom");
    free(qv); free(tv); free(cid);
    return -1;
  }
  std::string names;
  for (uint64_t i = 0; i < n; i++) {
    if (p + 4 + 32 + 24 + 4 > end) { set_err("truncated image"); goto fail; }
    p += 4;  // image_id
    memcpy(qv + i * 4, p, 32);
    p += 32;
    memcpy(tv + i * 3, p, 24);
    p += 24;
    memcpy(cid + i, p, 4);
    p += 4;
    while (p < end && *p != 0) names.push_back((char)*p++);
    if (p >= end) { set_err("truncated name"); goto fail; }
    names.push_back('\0');
    p++;  // NUL
    if (p + 8 > end) { set_err("truncated npts"); goto fail; }
    uint64_t npts;
    memcpy(&npts, p, 8);
    p += 8;
    if (npts > (uint64_t)(end - p) / 24) { set_err("truncated 2d points"); goto fail; }
    p += npts * 24;  // skip xys + point3D ids
  }
  {
    char* nb = (char*)malloc(names.size());
    memcpy(nb, names.data(), names.size());
    *names_out = nb;
    *names_len = (int64_t)names.size();
  }
  *qvec_out = qv;
  *tvec_out = tv;
  *camid_out = cid;
  return (int64_t)n;
fail:
  free(qv); free(tv); free(cid);
  return -1;
}

// cameras.bin -> per-camera model_id(i32) w(u64) h(u64) params(<=12 d).
int64_t fastio_read_cameras(const char* path, int32_t** ids_out,
                            int32_t** model_out, int64_t** wh_out,
                            double** params_out, int32_t** nparams_out) {
  static const int NUM_PARAMS[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  auto buf = read_file(path);
  if (buf.empty()) return -1;
  const uint8_t* p = buf.data();
  const uint8_t* end = p + buf.size();
  if (p + 8 > end) { set_err("truncated header"); return -1; }
  uint64_t n;
  memcpy(&n, p, 8);
  p += 8;
  if (n > (uint64_t)(end - p) / 24) { set_err("bad camera count"); return -1; }
  int32_t* ids = (int32_t*)malloc(n * 4);
  int32_t* mid = (int32_t*)malloc(n * 4);
  int64_t* wh = (int64_t*)malloc(n * 16);
  double* prm = (double*)malloc(n * 12 * sizeof(double));
  int32_t* npar = (int32_t*)malloc(n * 4);
  if (n && (!ids || !mid || !wh || !prm || !npar)) {
    set_err("oom");
    free(ids); free(mid); free(wh); free(prm); free(npar);
    return -1;
  }
  memset(prm, 0, n * 12 * sizeof(double));
  for (uint64_t i = 0; i < n; i++) {
    if (p + 24 > end) { set_err("truncated camera"); goto fail; }
    memcpy(ids + i, p, 4);
    p += 4;
    memcpy(mid + i, p, 4);
    p += 4;
    memcpy(wh + i * 2, p, 16);
    p += 16;
    int m = mid[i];
    if (m < 0 || m > 10) { set_err("bad camera model"); goto fail; }
    int np = NUM_PARAMS[m];
    npar[i] = np;
    if (p + np * 8 > end) { set_err("truncated params"); goto fail; }
    memcpy(prm + i * 12, p, np * 8);
    p += np * 8;
  }
  *ids_out = ids;
  *model_out = mid;
  *wh_out = wh;
  *params_out = prm;
  *nparams_out = npar;
  return (int64_t)n;
fail:
  free(ids); free(mid); free(wh); free(prm); free(npar);
  return -1;
}

// ------------------------------------------------------------------- PLY ----

// Binary-little-endian PLY with all-float vertex properties (the gaussian
// checkpoint layout): returns row-major (N, C) floats + property names.
int64_t fastio_read_ply_f32(const char* path, float** data_out,
                            int64_t* ncols_out, char** names_out,
                            int64_t* names_len) {
  auto buf = read_file(path);
  if (buf.empty()) return -1;
  const char* p = (const char*)buf.data();
  const char* end = p + buf.size();
  // Parse header lines.
  int64_t n = -1;
  std::string names;
  int64_t ncols = 0;
  const char* body = nullptr;
  {
    const char* line = p;
    while (line < end) {
      const char* nl = (const char*)memchr(line, '\n', end - line);
      if (!nl) { set_err("no end_header"); return -1; }
      std::string l(line, nl - line);
      // CRLF files: property names would otherwise keep a trailing '\r'
      // and crash the Python caller with a KeyError on "x".
      while (!l.empty() && l.back() == '\r') l.pop_back();
      if (l.rfind("element vertex ", 0) == 0) {
        n = atoll(l.c_str() + 15);
      } else if (l.rfind("element ", 0) == 0 && n >= 0 && ncols > 0) {
        set_err("multiple elements unsupported");
        return -1;
      } else if (l.rfind("property float ", 0) == 0) {
        names += l.substr(15);
        names.push_back('\0');
        ncols++;
      } else if (l.rfind("property float32 ", 0) == 0) {
        // Standard alias for float; MUST be counted (silently skipping a
        // declared column misaligns every later column).
        names += l.substr(17);
        names.push_back('\0');
        ncols++;
      } else if (l.rfind("property ", 0) == 0) {
        // Any other type (float64, uchar, lists, ...): the fixed 4-byte
        // stride below cannot parse it — error so Python falls back.
        set_err("non-float32 property");
        return -1;
      } else if (l == "end_header") {
        body = nl + 1;
        break;
      } else if (l.rfind("format ", 0) == 0 &&
                 l.find("binary_little_endian") == std::string::npos) {
        set_err("not binary_little_endian");
        return -1;
      }
      line = nl + 1;
    }
  }
  if (!body || n < 0 || ncols == 0) { set_err("bad header"); return -1; }
  // Overflow-safe truncation check: n*ncols*4 can wrap for hostile counts,
  // making `body + size > end` pass and the memcpy read OOB.
  uint64_t avail = (uint64_t)(end - body);
  if ((uint64_t)n > avail / 4 / (uint64_t)ncols) {
    set_err("truncated body");
    return -1;
  }
  float* data = (float*)malloc((size_t)n * ncols * 4);
  if (!data) { set_err("oom"); return -1; }
  memcpy(data, body, (size_t)n * ncols * 4);
  char* nb = (char*)malloc(names.size());
  memcpy(nb, names.data(), names.size());
  *data_out = data;
  *ncols_out = ncols;
  *names_out = nb;
  *names_len = (int64_t)names.size();
  return n;
}

void fastio_free(void* p) { free(p); }

}  // extern "C"
