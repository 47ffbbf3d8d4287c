// Minimal NIfTI-1 I/O for the registration tools.
//
// Same byte-format subset as subcort_tpu/io/nifti.py (the two
// implementations are pinned together by tests/test_registration.py):
// single-file .nii / .nii.gz plus two-file .hdr/.img pairs (either member
// may be named, either/both gzipped), 3D/4D volumes, little-endian, the
// common datatype codes, sform/qform affines, scl_slope/inter applied on
// read.
// All volumes are held as float32 in x-fastest (Fortran) order.
#pragma once

#include <zlib.h>

#include <array>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace nifti {

#pragma pack(push, 1)
struct Header {            // 348-byte NIfTI-1 header
  int32_t sizeof_hdr;      // 0
  char data_type[10];      // 4
  char db_name[18];        // 14
  int32_t extents;         // 32
  int16_t session_error;   // 36
  char regular;            // 38
  char dim_info;           // 39
  int16_t dim[8];          // 40
  float intent_p1, intent_p2, intent_p3;  // 56
  int16_t intent_code;     // 68
  int16_t datatype;        // 70
  int16_t bitpix;          // 72
  int16_t slice_start;     // 74
  float pixdim[8];         // 76
  float vox_offset;        // 108
  float scl_slope;         // 112
  float scl_inter;         // 116
  int16_t slice_end;       // 120
  char slice_code;         // 122
  char xyzt_units;         // 123
  float cal_max, cal_min;  // 124
  float slice_duration;    // 132
  float toffset;           // 136
  int32_t glmax, glmin;    // 140
  char descrip[80];        // 148
  char aux_file[24];       // 228
  int16_t qform_code;      // 252
  int16_t sform_code;      // 254
  float quatern_b, quatern_c, quatern_d;  // 256
  float qoffset_x, qoffset_y, qoffset_z;  // 268
  float srow_x[4];         // 280
  float srow_y[4];         // 296
  float srow_z[4];         // 312
  char intent_name[16];    // 328
  char magic[4];           // 344
};
#pragma pack(pop)
static_assert(sizeof(Header) == 348, "NIfTI-1 header must be 348 bytes");

using Affine = std::array<std::array<double, 4>, 4>;

inline Affine identity_affine() {
  Affine a{};
  for (int i = 0; i < 4; ++i) a[i][i] = 1.0;
  return a;
}

struct Image {
  std::vector<int64_t> shape;   // (X, Y, Z[, T])
  std::vector<float> data;      // Fortran order, x fastest
  Affine affine = identity_affine();

  int64_t nx() const { return shape.size() > 0 ? shape[0] : 1; }
  int64_t ny() const { return shape.size() > 1 ? shape[1] : 1; }
  int64_t nz() const { return shape.size() > 2 ? shape[2] : 1; }
  int64_t nt() const { return shape.size() > 3 ? shape[3] : 1; }
  int64_t nvox() const { return nx() * ny() * nz(); }

  float& at(int64_t x, int64_t y, int64_t z, int64_t t = 0) {
    return data[x + nx() * (y + ny() * (z + nz() * t))];
  }
  float at(int64_t x, int64_t y, int64_t z, int64_t t = 0) const {
    return data[x + nx() * (y + ny() * (z + nz() * t))];
  }

  // Trilinear sample at a (possibly fractional) voxel coordinate; voxels
  // outside the grid contribute `background`.
  float sample(double x, double y, double z, int64_t t = 0,
               float background = 0.0f) const {
    const int64_t x0 = (int64_t)std::floor(x), y0 = (int64_t)std::floor(y),
                  z0 = (int64_t)std::floor(z);
    const double fx = x - x0, fy = y - y0, fz = z - z0;
    float acc = 0.0f;
    for (int dz = 0; dz < 2; ++dz)
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          const int64_t xi = x0 + dx, yi = y0 + dy, zi = z0 + dz;
          const double w = (dx ? fx : 1 - fx) * (dy ? fy : 1 - fy) *
                           (dz ? fz : 1 - fz);
          const float v = (xi >= 0 && yi >= 0 && zi >= 0 && xi < nx() &&
                           yi < ny() && zi < nz())
                              ? at(xi, yi, zi, t)
                              : background;
          acc += (float)(w * v);
        }
    return acc;
  }
};

// ----------------------------------------------------------------- gz helpers
inline bool ends_with(const std::string& s, const std::string& suf) {
  return s.size() >= suf.size() &&
         s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
}

inline bool file_exists(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (f) std::fclose(f);
  return f != nullptr;
}

// If `path` names one member of a .hdr/.img pair, fill (hdr_path, img_path)
// — the sibling looked up plain then gzipped, like the Python twin — and
// return true. Single-file .nii(.gz) returns false.
inline bool pair_paths(const std::string& path, std::string& hdr_path,
                       std::string& img_path) {
  std::string stem = ends_with(path, ".gz")
                         ? path.substr(0, path.size() - 3) : path;
  if (stem.size() < 4) return false;
  const std::string raw_ext = stem.substr(stem.size() - 4);
  std::string ext = raw_ext;
  for (char& c : ext) c = (char)std::tolower((unsigned char)c);
  if (ext != ".hdr" && ext != ".img") return false;
  const std::string base = stem.substr(0, stem.size() - 4);
  // legacy ANALYZE datasets are often all-uppercase SCAN.HDR/SCAN.IMG —
  // probe the named member's case style first, then the other spellings.
  // "uppercase style" means the extension is FULLY uppercase (mixed case
  // like .Img follows the lowercase convention) — the same rule as the
  // Python twin's str.isupper(), so both runtimes name siblings alike.
  std::string ext_up = raw_ext;
  for (char& c : ext_up) c = (char)std::toupper((unsigned char)c);
  const bool upper = raw_ext == ext_up;
  auto find = [&](std::string e) {
    std::string eu = e;
    for (char& c : eu) c = (char)std::toupper((unsigned char)c);
    const std::string styled = upper ? eu : e;
    const std::string cands[4] = {base + styled, base + styled + ".gz",
                                  base + (upper ? e : eu),
                                  base + (upper ? e : eu) + ".gz"};
    for (const auto& cand : cands)
      if (file_exists(cand)) return cand;
    return base + styled;  // let read_file raise the natural open error
  };
  hdr_path = (ext == ".hdr") ? path : find(".hdr");
  img_path = (ext == ".img") ? path : find(".img");
  return true;
}

inline std::vector<char> read_file(const std::string& path) {
  std::vector<char> out;
  if (ends_with(path, ".gz")) {
    gzFile f = gzopen(path.c_str(), "rb");
    if (!f) throw std::runtime_error("cannot open " + path);
    char buf[1 << 16];
    int n;
    while ((n = gzread(f, buf, sizeof buf)) > 0) out.insert(out.end(), buf, buf + n);
    if (n < 0) {  // gzread returns -1 on a corrupt deflate stream, not EOF
      gzclose(f);
      throw std::runtime_error("corrupt gzip stream " + path);
    }
    gzclose(f);
  } else {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) throw std::runtime_error("cannot open " + path);
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(sz);
    if (std::fread(out.data(), 1, sz, f) != (size_t)sz) {
      std::fclose(f);
      throw std::runtime_error("short read " + path);
    }
    std::fclose(f);
  }
  return out;
}

inline void write_file(const std::string& path, const std::vector<char>& bytes) {
  if (ends_with(path, ".gz")) {
    gzFile f = gzopen(path.c_str(), "wb");
    if (!f) throw std::runtime_error("cannot write " + path);
    size_t off = 0;
    while (off < bytes.size()) {
      int n = gzwrite(f, bytes.data() + off,
                      (unsigned)std::min<size_t>(bytes.size() - off, 1 << 24));
      if (n <= 0) { gzclose(f); throw std::runtime_error("gzwrite failed " + path); }
      off += (size_t)n;
    }
    // gzclose flushes zlib's buffer: a disk-full failure surfaces HERE, not
    // in gzwrite — ignoring it would hand the next pipeline stage a
    // truncated file with exit status 0
    if (gzclose(f) != Z_OK)
      throw std::runtime_error("gzclose (flush) failed " + path);
  } else {
    FILE* f = std::fopen(path.c_str(), "wb");
    if (!f) throw std::runtime_error("cannot write " + path);
    if (std::fwrite(bytes.data(), 1, bytes.size(), f) != bytes.size()) {
      std::fclose(f);
      throw std::runtime_error("short write " + path);
    }
    if (std::fclose(f) != 0)
      throw std::runtime_error("fclose (flush) failed " + path);
  }
}

// --------------------------------------------------------------------- load
template <typename T>
inline void convert_to_float(const char* src, int64_t n, float slope,
                             float inter, std::vector<float>& dst) {
  const T* p = reinterpret_cast<const T*>(src);
  for (int64_t i = 0; i < n; ++i) dst[i] = (float)p[i] * slope + inter;
}

inline Image load(const std::string& path) {
  std::string hdr_path, img_path;
  const bool pair = pair_paths(path, hdr_path, img_path);
  std::vector<char> raw = read_file(pair ? hdr_path : path);
  if (raw.size() < sizeof(Header)) throw std::runtime_error(path + ": truncated");
  Header h;
  std::memcpy(&h, raw.data(), sizeof h);
  if (h.sizeof_hdr != 348)
    throw std::runtime_error(path + ": not little-endian NIfTI-1");
  int ndim = h.dim[0];
  if (ndim < 1 || ndim > 7) throw std::runtime_error(path + ": bad ndim");
  Image img;
  int64_t n = 1;
  for (int i = 1; i <= ndim; ++i) {
    if (h.dim[i] < 1)
      throw std::runtime_error(path + ": bad dim");
    img.shape.push_back(h.dim[i]);
    if (n > (int64_t{1} << 40) / h.dim[i])  // cap well before i64 overflow
      throw std::runtime_error(path + ": dim product too large");
    n *= h.dim[i];
  }
  float slope = (h.scl_slope == 0.0f) ? 1.0f : h.scl_slope;
  float inter = h.scl_inter;
  size_t off;
  if (pair) {
    // two-file form: voxel data lives in the .img; vox_offset (usually 0)
    // is an offset into that file
    raw = read_file(img_path);
    off = (size_t)std::max(h.vox_offset, 0.0f);
  } else {
    off = (size_t)std::max(h.vox_offset, 348.0f);
  }
  size_t esize;
  switch (h.datatype) {
    case 2: case 256: esize = 1; break;
    case 4: case 512: esize = 2; break;
    case 8: case 16: case 768: esize = 4; break;
    case 64: esize = 8; break;
    default: throw std::runtime_error(path + ": unsupported datatype");
  }
  if (raw.size() < off || raw.size() - off < (size_t)n * esize)
    throw std::runtime_error(path + ": truncated voxel data");
  img.data.resize(n);
  const char* src = raw.data() + off;
  switch (h.datatype) {
    case 2: convert_to_float<uint8_t>(src, n, slope, inter, img.data); break;
    case 4: convert_to_float<int16_t>(src, n, slope, inter, img.data); break;
    case 8: convert_to_float<int32_t>(src, n, slope, inter, img.data); break;
    case 16: convert_to_float<float>(src, n, slope, inter, img.data); break;
    case 64: convert_to_float<double>(src, n, slope, inter, img.data); break;
    case 256: convert_to_float<int8_t>(src, n, slope, inter, img.data); break;
    case 512: convert_to_float<uint16_t>(src, n, slope, inter, img.data); break;
    case 768: convert_to_float<uint32_t>(src, n, slope, inter, img.data); break;
    default: throw std::runtime_error(path + ": unsupported datatype");
  }
  if (h.sform_code > 0) {
    for (int j = 0; j < 4; ++j) {
      img.affine[0][j] = h.srow_x[j];
      img.affine[1][j] = h.srow_y[j];
      img.affine[2][j] = h.srow_z[j];
    }
    img.affine[3] = {0, 0, 0, 1};
  } else if (h.qform_code > 0) {
    double b = h.quatern_b, c = h.quatern_c, d = h.quatern_d;
    double a2 = 1.0 - (b * b + c * c + d * d);
    double a = std::sqrt(std::max(a2, 0.0));
    double R[3][3] = {
        {a * a + b * b - c * c - d * d, 2 * (b * c - a * d), 2 * (b * d + a * c)},
        {2 * (b * c + a * d), a * a + c * c - b * b - d * d, 2 * (c * d - a * b)},
        {2 * (b * d - a * c), 2 * (c * d + a * b), a * a + d * d - b * b - c * c}};
    double qfac = h.pixdim[0] < 0 ? -1.0 : 1.0;
    double zx = h.pixdim[1], zy = h.pixdim[2], zz = qfac * h.pixdim[3];
    for (int i = 0; i < 3; ++i) {
      img.affine[i][0] = R[i][0] * zx;
      img.affine[i][1] = R[i][1] * zy;
      img.affine[i][2] = R[i][2] * zz;
    }
    img.affine[0][3] = h.qoffset_x;
    img.affine[1][3] = h.qoffset_y;
    img.affine[2][3] = h.qoffset_z;
    img.affine[3] = {0, 0, 0, 1};
  } else {
    img.affine = identity_affine();
    img.affine[0][0] = h.pixdim[1] ? h.pixdim[1] : 1.0;
    img.affine[1][1] = h.pixdim[2] ? h.pixdim[2] : 1.0;
    img.affine[2][2] = h.pixdim[3] ? h.pixdim[3] : 1.0;
  }
  return img;
}

// --------------------------------------------------------------------- save
inline void save(const Image& img, const std::string& path,
                 const char* intent_name = nullptr) {
  Header h{};
  h.sizeof_hdr = 348;
  h.regular = 'r';
  int ndim = (int)img.shape.size();
  h.dim[0] = (int16_t)ndim;
  for (int i = 0; i < 7; ++i)
    h.dim[i + 1] = (int16_t)(i < ndim ? img.shape[i] : 1);
  h.datatype = 16;  // float32
  h.bitpix = 32;
  // voxel sizes from affine columns
  h.pixdim[0] = 1.0f;
  for (int j = 0; j < 3; ++j) {
    double s = std::sqrt(img.affine[0][j] * img.affine[0][j] +
                         img.affine[1][j] * img.affine[1][j] +
                         img.affine[2][j] * img.affine[2][j]);
    h.pixdim[j + 1] = (float)(s ? s : 1.0);
  }
  h.vox_offset = 352.0f;
  h.scl_slope = 1.0f;
  h.scl_inter = 0.0f;
  h.xyzt_units = 10;  // mm | sec
  h.qform_code = 0;
  h.sform_code = 1;
  for (int j = 0; j < 4; ++j) {
    h.srow_x[j] = (float)img.affine[0][j];
    h.srow_y[j] = (float)img.affine[1][j];
    h.srow_z[j] = (float)img.affine[2][j];
  }
  if (intent_name) std::strncpy(h.intent_name, intent_name, 15);

  std::string stem = ends_with(path, ".gz")
                         ? path.substr(0, path.size() - 3) : path;
  const std::string raw_ext = stem.size() >= 4 ? stem.substr(stem.size() - 4) : "";
  std::string ext = raw_ext;
  for (char& c : ext) c = (char)std::tolower((unsigned char)c);
  if (ext == ".hdr" || ext == ".img") {
    // two-file pair: header (ni1 magic, vox_offset into the .img) + raw
    // voxels, each member with the same compression as the named path.
    // Keep the exact name the caller passed; the sibling follows its case
    // style (SCAN.IMG -> SCAN.HDR, scan.img -> scan.hdr). Uppercase style
    // requires a FULLY uppercase extension (mixed case like .Img gets a
    // lowercase sibling) — the same rule as the Python twin's
    // str.isupper(), so both runtimes produce identical file sets.
    const std::string base = stem.substr(0, stem.size() - 4);
    const std::string gz = ends_with(path, ".gz") ? ".gz" : "";
    std::string ext_up = raw_ext;
    for (char& c : ext_up) c = (char)std::toupper((unsigned char)c);
    const bool upper = raw_ext == ext_up;
    const std::string hdr_ext = (ext == ".hdr") ? raw_ext : (upper ? ".HDR" : ".hdr");
    const std::string img_ext = (ext == ".img") ? raw_ext : (upper ? ".IMG" : ".img");
    h.vox_offset = 0.0f;
    std::memcpy(h.magic, "ni1", 4);
    std::vector<char> hbytes(sizeof h);
    std::memcpy(hbytes.data(), &h, sizeof h);
    write_file(base + hdr_ext + gz, hbytes);
    std::vector<char> vbytes(img.data.size() * 4);
    std::memcpy(vbytes.data(), img.data.data(), img.data.size() * 4);
    write_file(base + img_ext + gz, vbytes);
    return;
  }

  std::memcpy(h.magic, "n+1", 4);
  std::vector<char> bytes(352 + img.data.size() * 4, 0);
  std::memcpy(bytes.data(), &h, sizeof h);
  std::memcpy(bytes.data() + 352, img.data.data(), img.data.size() * 4);
  write_file(path, bytes);
}

}  // namespace nifti
