// Shared geometry for the registration tools: 4x4 affine algebra, the
// affine text-file contract, image pyramids, and the control-point-grid
// (CPP) deformation model.
//
// Transform conventions (documented contract, consumed by
// subcort_tpu/registration/):
//  * transf.txt — 4x4 row-major world-coordinate affine A with
//      flo_world = A * ref_world
//    (pull semantics: resampling evaluates the floating image at A*x for
//    each reference-space point x). Same file contract as the reference's
//    reg_aladin -aff output (base.py:510-513).
//  * transform.nii — control-point grid: 5D float32 (ncx, ncy, ncz, 1, 3),
//    intent_name "SUBCORT_CPP". Value at control point c is the TOTAL
//    world-space displacement d(c) (affine included), so the mapping is
//      flo_world = ref_world + bspline3(d)(ref_world).
//    The grid's sform places control points in reference world space
//    (uniform spacing; cubic B-spline support of 4 per axis, one extra
//    control point beyond each edge).
#pragma once

#include <array>
#include <cmath>
#include <cstdio>
#include <stdexcept>
#include <string>
#include <vector>

#include "nifti.hpp"

namespace geom {

using nifti::Affine;
using nifti::Image;

struct Vec3 {
  double x = 0, y = 0, z = 0;
};

inline Vec3 apply(const Affine& a, const Vec3& p) {
  return {a[0][0] * p.x + a[0][1] * p.y + a[0][2] * p.z + a[0][3],
          a[1][0] * p.x + a[1][1] * p.y + a[1][2] * p.z + a[1][3],
          a[2][0] * p.x + a[2][1] * p.y + a[2][2] * p.z + a[2][3]};
}

inline Affine matmul(const Affine& a, const Affine& b) {
  Affine c{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a[i][k] * b[k][j];
      c[i][j] = s;
    }
  return c;
}

// Gauss-Jordan inverse (4x4, pivoting). Affines here are well-conditioned.
inline Affine inverse(const Affine& m) {
  double a[4][8];
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) a[i][j] = m[i][j];
    for (int j = 0; j < 4; ++j) a[i][4 + j] = (i == j) ? 1.0 : 0.0;
  }
  for (int col = 0; col < 4; ++col) {
    int piv = col;
    for (int r = col + 1; r < 4; ++r)
      if (std::fabs(a[r][col]) > std::fabs(a[piv][col])) piv = r;
    if (std::fabs(a[piv][col]) < 1e-12) throw std::runtime_error("singular affine");
    if (piv != col)
      for (int j = 0; j < 8; ++j) std::swap(a[piv][j], a[col][j]);
    double d = a[col][col];
    for (int j = 0; j < 8; ++j) a[col][j] /= d;
    for (int r = 0; r < 4; ++r) {
      if (r == col) continue;
      double f = a[r][col];
      for (int j = 0; j < 8; ++j) a[r][j] -= f * a[col][j];
    }
  }
  Affine out{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) out[i][j] = a[i][4 + j];
  return out;
}

// ------------------------------------------------------- affine text file IO
inline void save_affine_txt(const Affine& a, const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "w");
  if (!f) throw std::runtime_error("cannot write " + path);
  for (int i = 0; i < 4; ++i)
    std::fprintf(f, "%.10g %.10g %.10g %.10g\n", a[i][0], a[i][1], a[i][2], a[i][3]);
  std::fclose(f);
}

inline Affine load_affine_txt(const std::string& path) {
  FILE* f = std::fopen(path.c_str(), "r");
  if (!f) throw std::runtime_error("cannot read " + path);
  Affine a{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j)
      if (std::fscanf(f, "%lf", &a[i][j]) != 1) {
        std::fclose(f);
        throw std::runtime_error("bad affine file " + path);
      }
  std::fclose(f);
  return a;
}

// ----------------------------------------------------------------- pyramid
// 2x box-downsample of a 3D volume; affine scaled accordingly.
inline Image downsample2(const Image& in) {
  Image out;
  out.shape = {(in.nx() + 1) / 2, (in.ny() + 1) / 2, (in.nz() + 1) / 2};
  out.data.assign(out.nvox(), 0.0f);
  for (int64_t z = 0; z < out.nz(); ++z)
    for (int64_t y = 0; y < out.ny(); ++y)
      for (int64_t x = 0; x < out.nx(); ++x) {
        double acc = 0;
        int n = 0;
        for (int dz = 0; dz < 2; ++dz)
          for (int dy = 0; dy < 2; ++dy)
            for (int dx = 0; dx < 2; ++dx) {
              int64_t xi = 2 * x + dx, yi = 2 * y + dy, zi = 2 * z + dz;
              if (xi < in.nx() && yi < in.ny() && zi < in.nz()) {
                acc += in.at(xi, yi, zi);
                ++n;
              }
            }
        out.at(x, y, z) = (float)(acc / std::max(n, 1));
      }
  // voxel (i,j,k) of `out` sits at voxel (2i+0.5, 2j+0.5, 2k+0.5)-ish of
  // `in`; use the standard scale-columns + half-voxel shift.
  out.affine = in.affine;
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) out.affine[i][j] = in.affine[i][j] * 2.0;
    out.affine[i][3] = in.affine[i][3] + 0.5 * (in.affine[i][0] +
                                                in.affine[i][1] +
                                                in.affine[i][2]);
  }
  return out;
}

// ----------------------------------------------------------- cubic B-spline
// Uniform cubic B-spline basis, t in [0,1): weights for control points
// floor(u)-1 .. floor(u)+2.
inline void bspline_weights(double t, double w[4]) {
  const double t2 = t * t, t3 = t2 * t;
  w[0] = (1 - 3 * t + 3 * t2 - t3) / 6.0;
  w[1] = (4 - 6 * t2 + 3 * t3) / 6.0;
  w[2] = (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0;
  w[3] = t3 / 6.0;
}

// Control-point displacement grid over reference space.
//
// Spacing is PER AXIS in reference voxel units (NiftyReg's -sx is
// millimetres per axis: on an anisotropic 1x1x3 mm scan a single scalar
// would make the lattice 3x denser along z than requested). The
// transform.nii sform encodes it column-wise: grid column j = ref column j
// scaled by spacing[j] — the same contract registration/jax_backend.py
// reads and registration/jax_ffd.py writes.
struct CppGrid {
  int64_t ncx = 0, ncy = 0, ncz = 0;
  double spacing[3] = {0, 0, 0};    // per axis, reference *voxel* units
  std::vector<float> disp;          // (ncx, ncy, ncz, 3) Fortran order
  Affine ref_affine = nifti::identity_affine();  // world placement of ref voxels

  float get(int64_t i, int64_t j, int64_t k, int c) const {
    i = std::min(std::max<int64_t>(i, 0), ncx - 1);
    j = std::min(std::max<int64_t>(j, 0), ncy - 1);
    k = std::min(std::max<int64_t>(k, 0), ncz - 1);
    return disp[i + ncx * (j + ncy * (k + ncz * c))];
  }
  float& set(int64_t i, int64_t j, int64_t k, int c) {
    return disp[i + ncx * (j + ncy * (k + ncz * c))];
  }

  // World displacement at a reference voxel coordinate (vx, vy, vz).
  // Control point (i,j,k) sits at ref voxel ((i-1)*spacing, ...): one
  // extra control point beyond each edge for full cubic support.
  Vec3 displacement(double vx, double vy, double vz) const {
    const double ux = vx / spacing[0], uy = vy / spacing[1],
                 uz = vz / spacing[2];
    const int64_t ix = (int64_t)std::floor(ux), iy = (int64_t)std::floor(uy),
                  iz = (int64_t)std::floor(uz);
    double wx[4], wy[4], wz[4];
    bspline_weights(ux - ix, wx);
    bspline_weights(uy - iy, wy);
    bspline_weights(uz - iz, wz);
    Vec3 out;
    for (int c = 0; c < 3; ++c) {
      double acc = 0;
      for (int a = 0; a < 4; ++a)
        for (int b = 0; b < 4; ++b)
          for (int g = 0; g < 4; ++g)
            acc += wx[a] * wy[b] * wz[g] *
                   get(ix + a, iy + b, iz + g, c);  // grid index = floor(u)-1+a +1
      (&out.x)[c] = acc;
    }
    return out;
  }
};

// Build an empty grid covering a reference image with the given per-axis
// spacing (reference voxel units).
inline CppGrid make_grid(const Image& ref, const double spacing_vox[3]) {
  CppGrid g;
  for (int j = 0; j < 3; ++j) g.spacing[j] = spacing_vox[j];
  g.ref_affine = ref.affine;
  // control index i corresponds to ref voxel (i-1)*spacing; need coverage
  // of [0, n-1] with cubic support -> indices -1 .. ceil((n-1)/sp)+2, i.e.
  // count = ceil((n-1)/sp) + 4, with index shift of +1 built into eval.
  g.ncx = (int64_t)std::ceil((ref.nx() - 1) / spacing_vox[0]) + 4;
  g.ncy = (int64_t)std::ceil((ref.ny() - 1) / spacing_vox[1]) + 4;
  g.ncz = (int64_t)std::ceil((ref.nz() - 1) / spacing_vox[2]) + 4;
  g.disp.assign(g.ncx * g.ncy * g.ncz * 3, 0.0f);
  return g;
}

inline CppGrid make_grid(const Image& ref, double spacing_vox) {
  const double sp[3] = {spacing_vox, spacing_vox, spacing_vox};
  return make_grid(ref, sp);
}

// NOTE on indexing: displacement() uses get(ix + a, ...) where ix =
// floor(v/spacing) and a in 0..3, i.e. control indices ix..ix+3 — these
// correspond to lattice sites (ix-1..ix+2)+1: the +1 shift (one phantom
// point before the volume) is baked into storage so all indices stay >= 0.

inline void save_cpp(const CppGrid& g, const std::string& path) {
  Image img;
  img.shape = {g.ncx, g.ncy, g.ncz, 1, 3};
  img.data.assign(g.disp.begin(), g.disp.end());
  // sform: control grid placement in world space = ref_affine composed
  // with (voxel -> (i-1)*spacing_j) scaling, per axis.
  img.affine = g.ref_affine;
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j)
      img.affine[i][j] = g.ref_affine[i][j] * g.spacing[j];
    img.affine[i][3] = g.ref_affine[i][3] -
                       (g.spacing[0] * g.ref_affine[i][0] +
                        g.spacing[1] * g.ref_affine[i][1] +
                        g.spacing[2] * g.ref_affine[i][2]);
  }
  // stash spacing where the Python side can read it back: pixdim via affine
  nifti::save(img, path, "SUBCORT_CPP");
}

inline CppGrid load_cpp(const std::string& path, const Image& ref) {
  Image img = nifti::load(path);
  if (img.shape.size() != 5 || img.shape[3] != 1 || img.shape[4] != 3)
    throw std::runtime_error(path + ": not a SUBCORT_CPP grid");
  CppGrid g;
  g.ncx = img.shape[0];
  g.ncy = img.shape[1];
  g.ncz = img.shape[2];
  g.disp.assign(img.data.begin(), img.data.end());
  g.ref_affine = ref.affine;
  // recover per-axis spacing: grid column norm / ref column norm
  for (int j = 0; j < 3; ++j) {
    double gs = std::sqrt(img.affine[0][j] * img.affine[0][j] +
                          img.affine[1][j] * img.affine[1][j] +
                          img.affine[2][j] * img.affine[2][j]);
    double rs = std::sqrt(ref.affine[0][j] * ref.affine[0][j] +
                          ref.affine[1][j] * ref.affine[1][j] +
                          ref.affine[2][j] * ref.affine[2][j]);
    g.spacing[j] = gs / (rs ? rs : 1.0);
    // a 5D NIfTI that is not a control grid (or a zeroed sform column)
    // would yield spacing 0 -> division by zero in displacement() and a
    // silently all-background resample; fail loudly instead
    if (!(g.spacing[j] > 0.0))
      throw std::runtime_error(path + ": not a SUBCORT_CPP grid "
                               "(zero spacing along axis " +
                               std::to_string(j) + ")");
  }
  return g;
}

}  // namespace geom
