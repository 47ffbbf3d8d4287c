// reg_f3d — cubic B-spline free-form deformable registration. CLI contract
// mirrors the reference's NiftyReg usage (cnn_cort/base.py:516-521):
//
//   reg_f3d -ref <ref> -flo <flo> [-aff <transf.txt>] -cpp <transform.nii>
//           -res <resampled> [-sx <spacing_mm>] [-maxit <n>] [-be <w>]
//
// Model: total world displacement d(x) on a uniform cubic B-spline control
// grid over the reference (geometry.hpp SUBCORT_CPP contract; the affine
// initialization is baked into the control values, so downstream resampling
// needs only the grid). Cost = SSD(ref, flo∘T) + be * ||Δ(d - d_affine)||²
// (second-difference bending-energy surrogate that leaves the affine part
// free), optimized by gradient descent on a 2-level pyramid. Written from
// the FFD method description (Rueckert et al.), not from NiftyReg sources.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "geometry.hpp"
#include "nifti.hpp"

using geom::Affine;
using geom::CppGrid;
using geom::Vec3;
using nifti::Image;

namespace {

// Precompute per-axis B-spline weights for every voxel coordinate.
struct AxisWeights {
  std::vector<int64_t> base;   // floor(v / spacing) per voxel index
  std::vector<double> w;       // (n, 4) weights
};

AxisWeights axis_weights(int64_t n, double spacing) {
  AxisWeights aw;
  aw.base.resize(n);
  aw.w.resize(n * 4);
  for (int64_t v = 0; v < n; ++v) {
    double u = v / spacing;
    int64_t b = (int64_t)std::floor(u);
    aw.base[v] = b;
    geom::bspline_weights(u - b, &aw.w[v * 4]);
  }
  return aw;
}

// Image gradient (central differences), per component, in voxel units.
void gradient_volumes(const Image& img, std::vector<float> g[3]) {
  for (int c = 0; c < 3; ++c) g[c].assign(img.nvox(), 0.0f);
  for (int64_t z = 0; z < img.nz(); ++z)
    for (int64_t y = 0; y < img.ny(); ++y)
      for (int64_t x = 0; x < img.nx(); ++x) {
        int64_t i = x + img.nx() * (y + img.ny() * z);
        g[0][i] = 0.5f * (img.at(std::min(x + 1, img.nx() - 1), y, z) -
                          img.at(std::max<int64_t>(x - 1, 0), y, z));
        g[1][i] = 0.5f * (img.at(x, std::min(y + 1, img.ny() - 1), z) -
                          img.at(x, std::max<int64_t>(y - 1, 0), z));
        g[2][i] = 0.5f * (img.at(x, y, std::min(z + 1, img.nz() - 1)) -
                          img.at(x, y, std::max<int64_t>(z - 1, 0)));
      }
}

double trilinear(const std::vector<float>& vol, const Image& like,
                 double x, double y, double z) {
  Image tmp;  // sample via a lightweight view
  const int64_t nx = like.nx(), ny = like.ny(), nz = like.nz();
  const int64_t x0 = (int64_t)std::floor(x), y0 = (int64_t)std::floor(y),
                z0 = (int64_t)std::floor(z);
  const double fx = x - x0, fy = y - y0, fz = z - z0;
  double acc = 0;
  for (int dz = 0; dz < 2; ++dz)
    for (int dy = 0; dy < 2; ++dy)
      for (int dx = 0; dx < 2; ++dx) {
        int64_t xi = x0 + dx, yi = y0 + dy, zi = z0 + dz;
        if (xi < 0 || yi < 0 || zi < 0 || xi >= nx || yi >= ny || zi >= nz)
          continue;
        double w = (dx ? fx : 1 - fx) * (dy ? fy : 1 - fy) * (dz ? fz : 1 - fz);
        acc += w * vol[xi + nx * (yi + ny * zi)];
      }
  (void)tmp;
  return acc;
}

// One optimization run at a given resolution level.
void optimize_level(const Image& ref, const Image& flo, CppGrid& grid,
                    const std::vector<float>& d_affine, int iters, double be) {
  const Affine flo_w2v = geom::inverse(flo.affine);
  std::vector<float> fgrad[3];
  gradient_volumes(flo, fgrad);

  AxisWeights awx = axis_weights(ref.nx(), grid.spacing);
  AxisWeights awy = axis_weights(ref.ny(), grid.spacing);
  AxisWeights awz = axis_weights(ref.nz(), grid.spacing);

  const int64_t ncx = grid.ncx, ncy = grid.ncy, ncz = grid.ncz;
  std::vector<double> g(ncx * ncy * ncz * 3);
  double prev_cost = 1e300;

  for (int it = 0; it < iters; ++it) {
    std::fill(g.begin(), g.end(), 0.0);
    double cost = 0;

    for (int64_t z = 0; z < ref.nz(); ++z) {
      const double* wz = &awz.w[z * 4];
      int64_t bz = awz.base[z];
      for (int64_t y = 0; y < ref.ny(); ++y) {
        const double* wy = &awy.w[y * 4];
        int64_t by = awy.base[y];
        for (int64_t x = 0; x < ref.nx(); ++x) {
          const double* wx = &awx.w[x * 4];
          int64_t bx = awx.base[x];

          // displacement at this voxel
          double dx = 0, dy = 0, dz = 0;
          for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b)
              for (int c = 0; c < 4; ++c) {
                double w = wx[a] * wy[b] * wz[c];
                dx += w * grid.get(bx + a, by + b, bz + c, 0);
                dy += w * grid.get(bx + a, by + b, bz + c, 1);
                dz += w * grid.get(bx + a, by + b, bz + c, 2);
              }
          Vec3 w0 = geom::apply(ref.affine, {(double)x, (double)y, (double)z});
          Vec3 fw = {w0.x + dx, w0.y + dy, w0.z + dz};
          Vec3 fv = geom::apply(flo_w2v, fw);

          double wv = flo.sample(fv.x, fv.y, fv.z);
          double r = wv - ref.at(x, y, z);
          cost += r * r;
          if (r == 0.0) continue;

          // d(warped)/d(world displacement) = grad_vox(flo) * d(vox)/d(world)
          double gx = trilinear(fgrad[0], flo, fv.x, fv.y, fv.z);
          double gy = trilinear(fgrad[1], flo, fv.x, fv.y, fv.z);
          double gz = trilinear(fgrad[2], flo, fv.x, fv.y, fv.z);
          double gw[3];
          for (int c = 0; c < 3; ++c)
            gw[c] = gx * flo_w2v[0][c] + gy * flo_w2v[1][c] + gz * flo_w2v[2][c];

          const double f = 2.0 * r;
          for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b)
              for (int c = 0; c < 4; ++c) {
                double w = wx[a] * wy[b] * wz[c] * f;
                int64_t ci = (bx + a) + ncx * ((by + b) + ncy * (bz + c));
                if (bx + a >= ncx || by + b >= ncy || bz + c >= ncz) continue;
                g[ci] += w * gw[0];
                g[ci + ncx * ncy * ncz] += w * gw[1];
                g[ci + 2 * ncx * ncy * ncz] += w * gw[2];
              }
        }
      }
    }

    // bending-energy surrogate on (d - d_affine): second differences
    if (be > 0) {
      auto at = [&](int64_t i, int64_t j, int64_t k, int c) -> double {
        int64_t ci = i + ncx * (j + ncy * (k + ncz * c));
        return grid.disp[ci] - d_affine[ci];
      };
      for (int c = 0; c < 3; ++c)
        for (int64_t k = 1; k + 1 < ncz; ++k)
          for (int64_t j = 1; j + 1 < ncy; ++j)
            for (int64_t i = 1; i + 1 < ncx; ++i) {
              double lap = at(i - 1, j, k, c) + at(i + 1, j, k, c) +
                           at(i, j - 1, k, c) + at(i, j + 1, k, c) +
                           at(i, j, k - 1, c) + at(i, j, k + 1, c) -
                           6.0 * at(i, j, k, c);
              cost += be * lap * lap;
              // gradient: distribute -2*be*lap with the Laplacian stencil
              int64_t ci = i + ncx * (j + ncy * (k + ncz * c));
              g[ci] += -12.0 * be * lap;
              g[ci - 1] += 2.0 * be * lap;
              g[ci + 1] += 2.0 * be * lap;
              g[ci - ncx] += 2.0 * be * lap;
              g[ci + ncx] += 2.0 * be * lap;
              g[ci - ncx * ncy] += 2.0 * be * lap;
              g[ci + ncx * ncy] += 2.0 * be * lap;
            }
    }

    double gmax = 0;
    for (double v : g) gmax = std::max(gmax, std::fabs(v));
    if (gmax < 1e-12) break;
    // step: a fraction of the control spacing in world units
    double vox_mm = std::sqrt(ref.affine[0][0] * ref.affine[0][0] +
                              ref.affine[1][0] * ref.affine[1][0] +
                              ref.affine[2][0] * ref.affine[2][0]);
    double step = 0.4 * grid.spacing * vox_mm / gmax;
    for (size_t i = 0; i < grid.disp.size(); ++i)
      grid.disp[i] = (float)(grid.disp[i] - step * g[i]);

    if (cost > prev_cost * 0.9999 && it > 4) break;  // converged/stalled
    prev_cost = cost;
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string ref_path, flo_path, aff_path, cpp_path, res_path;
  double sx_mm = 10.0, be = 0.01;
  int maxit = 25;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) { std::fprintf(stderr, "missing value for %s\n", a.c_str()); std::exit(1); }
      return argv[++i];
    };
    if (a == "-ref") ref_path = next();
    else if (a == "-flo") flo_path = next();
    else if (a == "-aff") aff_path = next();
    else if (a == "-cpp") cpp_path = next();
    else if (a == "-res") res_path = next();
    else if (a == "-sx") sx_mm = std::atof(next().c_str());
    else if (a == "-maxit") maxit = std::atoi(next().c_str());
    else if (a == "-be") be = std::atof(next().c_str());
    else if (a == "-voff") { }
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 1; }
  }
  if (ref_path.empty() || flo_path.empty() || cpp_path.empty()) {
    std::fprintf(stderr,
                 "usage: reg_f3d -ref R -flo F [-aff A.txt] -cpp OUT.nii "
                 "[-res OUT] [-sx mm] [-maxit n] [-be w]\n");
    return 1;
  }

  try {
    Image ref0 = nifti::load(ref_path);
    Image flo0 = nifti::load(flo_path);
    Affine A = nifti::identity_affine();
    if (!aff_path.empty()) A = geom::load_affine_txt(aff_path);

    double vox_mm = std::sqrt(ref0.affine[0][0] * ref0.affine[0][0] +
                              ref0.affine[1][0] * ref0.affine[1][0] +
                              ref0.affine[2][0] * ref0.affine[2][0]);
    double spacing_vox = std::max(2.0, sx_mm / (vox_mm ? vox_mm : 1.0));

    // full-resolution grid, affine baked into the initial control values
    CppGrid grid = geom::make_grid(ref0, spacing_vox);
    std::vector<float> d_affine(grid.disp.size());
    for (int64_t k = 0; k < grid.ncz; ++k)
      for (int64_t j = 0; j < grid.ncy; ++j)
        for (int64_t i = 0; i < grid.ncx; ++i) {
          // control (i,j,k) sits at ref voxel ((i-1)*s, (j-1)*s, (k-1)*s)
          Vec3 w = geom::apply(ref0.affine, {(i - 1) * grid.spacing,
                                             (j - 1) * grid.spacing,
                                             (k - 1) * grid.spacing});
          Vec3 aw = geom::apply(A, w);
          grid.set(i, j, k, 0) = (float)(aw.x - w.x);
          grid.set(i, j, k, 1) = (float)(aw.y - w.y);
          grid.set(i, j, k, 2) = (float)(aw.z - w.z);
          int64_t ci = i + grid.ncx * (j + grid.ncy * k);
          d_affine[ci] = grid.get(i, j, k, 0);
          d_affine[ci + grid.ncx * grid.ncy * grid.ncz] = grid.get(i, j, k, 1);
          d_affine[ci + 2 * grid.ncx * grid.ncy * grid.ncz] = grid.get(i, j, k, 2);
        }

    // coarse level: half-resolution images, same world-space grid (spacing
    // halves in voxel units of the downsampled image)
    Image ref1 = geom::downsample2(ref0);
    Image flo1 = geom::downsample2(flo0);
    CppGrid coarse = grid;
    coarse.spacing = grid.spacing / 2.0;
    coarse.ref_affine = ref1.affine;
    optimize_level(ref1, flo1, coarse, d_affine, maxit, be);
    grid.disp = coarse.disp;

    optimize_level(ref0, flo0, grid, d_affine, std::max(4, maxit / 3), be);

    geom::save_cpp(grid, cpp_path);

    if (!res_path.empty()) {
      const Affine flo_w2v = geom::inverse(flo0.affine);
      Image out;
      out.shape = {ref0.nx(), ref0.ny(), ref0.nz()};
      out.affine = ref0.affine;
      out.data.assign(ref0.nvox(), 0.0f);
      for (int64_t z = 0; z < ref0.nz(); ++z)
        for (int64_t y = 0; y < ref0.ny(); ++y)
          for (int64_t x = 0; x < ref0.nx(); ++x) {
            Vec3 d = grid.displacement((double)x, (double)y, (double)z);
            Vec3 w = geom::apply(ref0.affine, {(double)x, (double)y, (double)z});
            Vec3 fv = geom::apply(flo_w2v, {w.x + d.x, w.y + d.y, w.z + d.z});
            out.at(x, y, z) = flo0.sample(fv.x, fv.y, fv.z);
          }
      nifti::save(out, res_path);
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "reg_f3d: %s\n", e.what());
    return 1;
  }
  return 0;
}
