// reg_f3d — cubic B-spline free-form deformable registration. CLI contract
// mirrors the reference's NiftyReg usage (cnn_cort/base.py:516-521):
//
//   reg_f3d -ref <ref> -flo <flo> [-aff <transf.txt>] -cpp <transform.nii>
//           -res <resampled> [-sx <spacing_mm>] [-maxit <n>] [-be <w>]
//           [-nmi | -ssd]
//
// Model: total world displacement d(x) on a uniform cubic B-spline control
// grid over the reference (geometry.hpp SUBCORT_CPP contract; the affine
// initialization is baked into the control values, so downstream resampling
// needs only the grid). Cost = D(ref, flo∘T) + be * ||Δ(d - d_affine)||²
// where D is, by default, 2 - NMI from a Parzen-window
// (cubic B-spline kernel) joint histogram — the reference's NiftyReg reg_f3d is
// NMI-driven, which survives nonlinear intensity remaps between template
// and subject where SSD does not; -ssd opts into plain SSD for
// same-protocol pairs. The bending term is a second-difference
// surrogate that leaves the affine part free. Optimized by gradient descent
// on a 2-level pyramid. Written from the FFD method description (Rueckert
// et al.) and the standard Parzen-NMI gradient derivation, not from
// NiftyReg sources.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

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

AxisWeights axis_weights(int64_t n, double spacing, double vox_offset = 0.0) {
  AxisWeights aw;
  aw.base.resize(n);
  aw.w.resize(n * 4);
  for (int64_t v = 0; v < n; ++v) {
    // vox_offset shifts this level's voxel coordinates into the canonical
    // (finest-level) lattice frame: downsample2 maps coarse voxel v to fine
    // voxel 2v+0.5, so the coarse level evaluates at u=(v+0.25)/(sp/2) —
    // without it, the coarse lattice sits half a fine voxel off the frame
    // the fine stage (and save_cpp) interprets the same control values in.
    double u = (v + vox_offset) / spacing;
    int64_t b = (int64_t)std::floor(u);
    aw.base[v] = b;
    geom::bspline_weights(u - b, &aw.w[v * 4]);
  }
  return aw;
}

// Trilinear sample of img at voxel coords (x,y,z) plus the EXACT derivative
// of the interpolant wrt the coords (what autodiff of a trilinear gather
// gives). A precomputed central-difference gradient volume is too far off
// the interpolant's true local slope for the NMI gradient to stay usable.
double sample_with_grad(const Image& img, double x, double y, double z,
                        double g[3]) {
  const int64_t nx = img.nx(), ny = img.ny(), nz = img.nz();
  const int64_t x0 = (int64_t)std::floor(x), y0 = (int64_t)std::floor(y),
                z0 = (int64_t)std::floor(z);
  const double fx = x - x0, fy = y - y0, fz = z - z0;
  double acc = 0;
  g[0] = g[1] = g[2] = 0;
  for (int dz = 0; dz < 2; ++dz)
    for (int dy = 0; dy < 2; ++dy)
      for (int dx = 0; dx < 2; ++dx) {
        int64_t xi = x0 + dx, yi = y0 + dy, zi = z0 + dz;
        if (xi < 0 || yi < 0 || zi < 0 || xi >= nx || yi >= ny || zi >= nz)
          continue;
        double wx = dx ? fx : 1 - fx, wy = dy ? fy : 1 - fy,
               wz = dz ? fz : 1 - fz;
        double v = img.data[xi + nx * (yi + ny * zi)];
        acc += wx * wy * wz * v;
        g[0] += (dx ? 1.0 : -1.0) * wy * wz * v;
        g[1] += wx * (dy ? 1.0 : -1.0) * wz * v;
        g[2] += wx * wy * (dz ? 1.0 : -1.0) * v;
      }
  return acc;
}

constexpr int kBins = 32;  // Parzen joint-histogram bins per image (NMI)

// Cubic B-spline Parzen window (NiftyReg's choice): a linear hat kernel
// makes the NMI landscape kinky enough that descent stalls (measured ~65%
// gradient sign agreement with finite differences; the cubic is smooth).
// Map a [0,1] intensity to bin coordinate t = x*(kBins-3)+1 so the 4-bin
// support stays inside [0, kBins-1]; returns the first bin index, fills
// w[4] (and dw[4] = d(weight)/dt when non-null).
inline int parzen_bins(double x01, double* w, double* dw) {
  double t = x01 * (kBins - 3) + 1.0;
  int ft = std::clamp((int)t, 1, kBins - 3);
  double u = t - ft;
  geom::bspline_weights(u, w);
  if (dw) {
    dw[0] = -0.5 * (1 - u) * (1 - u);
    dw[1] = -2.0 * u + 1.5 * u * u;
    dw[2] = 0.5 + u - 1.5 * u * u;
    dw[3] = 0.5 * u * u;
  }
  return ft - 1;
}

// One optimization run at a given resolution level.
void optimize_level(const Image& ref, const Image& flo, CppGrid& grid,
                    const std::vector<float>& d_affine, int iters, double be,
                    bool use_nmi, double vox_offset = 0.0) {
  const Affine flo_w2v = geom::inverse(flo.affine);

  AxisWeights awx = axis_weights(ref.nx(), grid.spacing[0], vox_offset);
  AxisWeights awy = axis_weights(ref.ny(), grid.spacing[1], vox_offset);
  AxisWeights awz = axis_weights(ref.nz(), grid.spacing[2], vox_offset);

  const int64_t ncx = grid.ncx, ncy = grid.ncy, ncz = grid.ncz;
  std::vector<double> g(ncx * ncy * ncz * 3);
  double prev_cost = 1e300, best_cost = 1e300;
  double step_scale = 0.4;
  int stall = 0;
  std::vector<float> best_disp = grid.disp;
  std::vector<double> best_g;  // gradient at best_disp (SSD trust region)
  std::vector<double> adam_m, adam_v;
  if (use_nmi) {
    adam_m.assign(ncx * ncy * ncz * 3, 0.0);
    adam_v.assign(ncx * ncy * ncz * 3, 0.0);
  }

  // Fixed intensity normalizations for the NMI histogram: ref's own range;
  // flo's range extended to 0 (out-of-volume samples are 0). Matches the
  // JAX twin (registration/jax_ffd.py) for cross-backend comparability.
  double rmin = 0, rrange = 1, fmin = 0, frange = 1;
  std::vector<float> fvbuf, wvbuf;  // per-voxel warp state for pass 2
  if (use_nmi) {
    double rmax = -1e300, fmax = -1e300;
    rmin = 1e300;
    double flo_min = 1e300;
    for (float v : ref.data) { rmin = std::min(rmin, (double)v); rmax = std::max(rmax, (double)v); }
    for (float v : flo.data) { flo_min = std::min(flo_min, (double)v); fmax = std::max(fmax, (double)v); }
    fmin = std::min(flo_min, 0.0);
    fmax = std::max(fmax, 0.0);
    rrange = std::max(rmax - rmin, 1e-8);
    frange = std::max(fmax - fmin, 1e-8);
    fvbuf.resize(ref.nvox() * 3);
    wvbuf.resize(ref.nvox());
  }

#ifdef _OPENMP
  const int n_threads = omp_get_max_threads();
#else
  const int n_threads = 1;
#endif

  // Evaluate cost (and, when want_grad, the gradient into g) at grid.disp.
  // The voxel passes are OpenMP-parallel over z-slices with per-thread
  // accumulators merged in thread order (deterministic for a fixed
  // OMP_NUM_THREADS).
  auto evaluate = [&](bool want_grad) -> double {
    if (want_grad) std::fill(g.begin(), g.end(), 0.0);
    double hist[kBins][kBins];
    if (use_nmi) std::memset(hist, 0, sizeof(hist));

    std::vector<std::vector<double>> gbufs(n_threads);
    std::vector<std::vector<double>> hbufs(n_threads);
    std::vector<double> costs(n_threads, 0.0);

    // Distribute dCost/d(warped value) = f at a voxel into a gradient
    // buffer; gvox is the exact interpolant gradient at the flo coordinate.
    auto distribute = [&](std::vector<double>& gt,
                          int64_t bx, int64_t by, int64_t bz,
                          const double* wx, const double* wy, const double* wz,
                          const double gvox[3], double f) {
      // d(warped)/d(world displacement) = grad_vox(flo) * d(vox)/d(world)
      double gw[3];
      for (int c = 0; c < 3; ++c)
        gw[c] = gvox[0] * flo_w2v[0][c] + gvox[1] * flo_w2v[1][c] +
                gvox[2] * flo_w2v[2][c];
      for (int a = 0; a < 4; ++a)
        for (int b = 0; b < 4; ++b)
          for (int c = 0; c < 4; ++c) {
            if (bx + a >= ncx || by + b >= ncy || bz + c >= ncz) continue;
            double w = wx[a] * wy[b] * wz[c] * f;
            int64_t ci = (bx + a) + ncx * ((by + b) + ncy * (bz + c));
            gt[ci] += w * gw[0];
            gt[ci + ncx * ncy * ncz] += w * gw[1];
            gt[ci + 2 * ncx * ncy * ncz] += w * gw[2];
          }
    };
    auto thread_gbuf = [&](int tid) -> std::vector<double>& {
      if (gbufs[tid].empty()) gbufs[tid].assign(g.size(), 0.0);
      return gbufs[tid];
    };
    auto merge_buffers = [&](bool merge_hist) {
      for (int t = 0; t < n_threads; ++t) {  // thread order: deterministic
        if (want_grad && !gbufs[t].empty())
          for (size_t i = 0; i < g.size(); ++i) g[i] += gbufs[t][i];
        gbufs[t].clear();
        if (merge_hist && !hbufs[t].empty())
          for (int a = 0; a < kBins; ++a)
            for (int b = 0; b < kBins; ++b)
              hist[a][b] += hbufs[t][a * kBins + b];
        hbufs[t].clear();
      }
    };

    // Pass 1: warp every voxel. SSD accumulates its gradient inline; NMI
    // stores the warp state and builds the joint histogram first (its
    // per-voxel gradient needs the full histogram).
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t z = 0; z < ref.nz(); ++z) {
#ifdef _OPENMP
      const int tid = omp_get_thread_num();
#else
      const int tid = 0;
#endif
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

          double gvox[3];
          double wv = sample_with_grad(flo, fv.x, fv.y, fv.z, gvox);
          int64_t vi = x + ref.nx() * (y + ref.ny() * z);

          if (use_nmi) {
            fvbuf[vi * 3 + 0] = (float)fv.x;
            fvbuf[vi * 3 + 1] = (float)fv.y;
            fvbuf[vi * 3 + 2] = (float)fv.z;
            wvbuf[vi] = (float)wv;
            double wa[4], wb[4];
            int a0 = parzen_bins((ref.at(x, y, z) - rmin) / rrange, wa, nullptr);
            int b0 = parzen_bins(std::clamp((wv - fmin) / frange, 0.0, 1.0),
                                 wb, nullptr);
            if (hbufs[tid].empty()) hbufs[tid].assign(kBins * kBins, 0.0);
            for (int a = 0; a < 4; ++a)
              for (int b = 0; b < 4; ++b)
                hbufs[tid][(a0 + a) * kBins + b0 + b] += wa[a] * wb[b];
            continue;
          }

          double r = wv - ref.at(x, y, z);
          costs[tid] += r * r;
          if (r == 0.0 || !want_grad) continue;
          distribute(thread_gbuf(tid), bx, by, bz, wx, wy, wz, gvox, 2.0 * r);
        }
      }
    }
    merge_buffers(use_nmi);
    double cost = 0;
    for (int t = 0; t < n_threads; ++t) cost += costs[t];

    if (use_nmi) {
      // Entropies of the Parzen joint histogram; NMI = (Hr+Hw)/Hrw in [1,2].
      const double n = (double)ref.nvox();
      double pr[kBins] = {0}, pw[kBins] = {0};
      for (int a = 0; a < kBins; ++a)
        for (int b = 0; b < kBins; ++b) {
          pr[a] += hist[a][b] / n;
          pw[b] += hist[a][b] / n;
        }
      const double eps = 1e-12;
      double hr = 0, hw = 0, hrw = 0;
      for (int a = 0; a < kBins; ++a) {
        if (pr[a] > 0) hr -= pr[a] * std::log(pr[a] + eps);
        if (pw[a] > 0) hw -= pw[a] * std::log(pw[a] + eps);
        for (int b = 0; b < kBins; ++b) {
          double p = hist[a][b] / n;
          if (p > 0) hrw -= p * std::log(p + eps);
        }
      }
      hrw = std::max(hrw, eps);
      const double nmi = (hr + hw) / hrw;
      cost += (2.0 - nmi) * n;  // scaled so the step heuristic behaves like SSD

      // Q[a][b] = dCost/dH_ab (per histogram count).
      // dHr/dP = -(log pr + 1); dHw/dP = -(log pw + 1); dHrw/dP = -(log P + 1);
      // dNMI/dP = (dHr + dHw)/Hrw - NMI/Hrw * dHrw; Cost = (2-NMI)*n, P = H/n.
      double Q[kBins][kBins];
      for (int a = 0; a < kBins; ++a)
        for (int b = 0; b < kBins; ++b) {
          double p = std::max(hist[a][b] / n, eps);
          double dhr = -(std::log(std::max(pr[a], eps)) + 1.0);
          double dhw = -(std::log(std::max(pw[b], eps)) + 1.0);
          double dhrw = -(std::log(p) + 1.0);
          double dnmi = (dhr + dhw) / hrw - nmi / hrw * dhrw;
          Q[a][b] = -dnmi;  // times n (from cost scale) times 1/n (dP/dH)
        }

      // Pass 2: per-voxel f = dCost/d(warped) via the Parzen-window
      // derivative, then the same control-grid distribution as SSD.
      const double dtw_dwv = (kBins - 3) / frange;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
      for (int64_t z = 0; z < (want_grad ? ref.nz() : 0); ++z) {
#ifdef _OPENMP
        const int tid = omp_get_thread_num();
#else
        const int tid = 0;
#endif
        const double* wz = &awz.w[z * 4];
        int64_t bz = awz.base[z];
        for (int64_t y = 0; y < ref.ny(); ++y) {
          const double* wy = &awy.w[y * 4];
          int64_t by = awy.base[y];
          for (int64_t x = 0; x < ref.nx(); ++x) {
            int64_t vi = x + ref.nx() * (y + ref.ny() * z);
            double wv = wvbuf[vi];
            // boundary voxels (wv at the range edge, e.g. the huge
            // background/out-of-volume mass at 0) keep their derivative —
            // dropping them loses the dominant signal (the JAX twin's
            // clip() passes gradient at the boundary inclusively too)
            double wa[4], wb[4], dwb[4];
            int a0 = parzen_bins((ref.at(x, y, z) - rmin) / rrange, wa, nullptr);
            int b0 = parzen_bins(std::clamp((wv - fmin) / frange, 0.0, 1.0),
                                 wb, dwb);
            double f = 0;
            for (int a = 0; a < 4; ++a)
              for (int b = 0; b < 4; ++b)
                f += wa[a] * Q[a0 + a][b0 + b] * dwb[b];
            f *= dtw_dwv;
            if (f == 0.0) continue;
            double gvox[3];
            sample_with_grad(flo, fvbuf[vi * 3], fvbuf[vi * 3 + 1],
                             fvbuf[vi * 3 + 2], gvox);
            distribute(thread_gbuf(tid), awx.base[x], by, bz, &awx.w[x * 4],
                       wy, wz, gvox, f);
          }
        }
      }
      merge_buffers(false);
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
              if (!want_grad) continue;
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
    return cost;
  };

  for (int it = 0; it < iters; ++it) {
    double cost = evaluate(true);

    if (std::getenv("SUBCORT_REG_GRADCHECK") && it == 0) {
      // FD-check: single component + directional derivative along -g.
      size_t imax = 0;
      double gmax0 = 0;
      for (size_t i = 0; i < g.size(); ++i) {
        if (std::fabs(g[i]) > std::fabs(g[imax])) imax = i;
        gmax0 = std::max(gmax0, std::fabs(g[i]));
      }
      std::vector<double> gsave = g;
      std::vector<float> dsave = grid.disp;
      const double h = 1e-3;
      grid.disp[imax] = (float)(dsave[imax] + h);
      double cplus = evaluate(false);
      grid.disp = dsave;
      std::fprintf(stderr, "[gradcheck] i=%zu analytic=%.8g fd=%.8g\n",
                   imax, gsave[imax], (cplus - cost) / h);
      int agree = 0, checked = 0;
      for (size_t i = 7; i < g.size(); i += g.size() / 24) {
        if (std::fabs(gsave[i]) < 1e-6) continue;
        grid.disp[i] = (float)(dsave[i] + h);
        double cp = evaluate(false);
        grid.disp[i] = dsave[i];
        double fd = (cp - cost) / h;
        ++checked;
        if ((fd > 0) == (gsave[i] > 0)) ++agree;
        std::fprintf(stderr, "[gradcheck]   i=%zu analytic=%+.6g fd=%+.6g\n",
                     i, gsave[i], fd);
      }
      std::fprintf(stderr, "[gradcheck] sign agreement %d/%d\n", agree, checked);
      for (double t : {1e-4, 1e-3, 1e-2}) {
        for (size_t i = 0; i < grid.disp.size(); ++i)
          grid.disp[i] = (float)(dsave[i] - t / gmax0 * gsave[i]);
        double cstep = evaluate(false);
        std::fprintf(stderr, "[gradcheck] maxmove=%g dcost=%.8g\n", t,
                     cstep - cost);
        grid.disp = dsave;
      }
      g = gsave;
    }

    if (std::getenv("SUBCORT_REG_DEBUG"))
      std::fprintf(stderr, "[f3d] it=%d cost=%.8g scale=%g\n", it, cost,
                   step_scale);

    if (cost < best_cost) {
      best_cost = cost;
      best_disp = grid.disp;
      best_g = g;  // both cost modes: the trust-region revert reuses it
    }

    double vox_mm = std::sqrt(ref.affine[0][0] * ref.affine[0][0] +
                              ref.affine[1][0] * ref.affine[1][0] +
                              ref.affine[2][0] * ref.affine[2][0]);

    if (use_nmi && !std::getenv("SUBCORT_F3D_NMI_TRUST")) {
      // Adam with a linearly decaying step (mirrors the JAX twin's
      // optimizer for the identical cost).
      const double b1 = 0.9, b2 = 0.999, aeps = 1e-8;
      const double lr = 0.4 * vox_mm * (1.0 - 0.9 * it / std::max(iters - 1, 1));
      for (size_t i = 0; i < g.size(); ++i) {
        adam_m[i] = b1 * adam_m[i] + (1 - b1) * g[i];
        adam_v[i] = b2 * adam_v[i] + (1 - b2) * g[i] * g[i];
        double mh = adam_m[i] / (1 - std::pow(b1, it + 1));
        double vh = adam_v[i] / (1 - std::pow(b2, it + 1));
        grid.disp[i] = (float)(grid.disp[i] - lr * mh / (std::sqrt(vh) + aeps));
      }
      prev_cost = cost;
      continue;
    }

    // SSD: adaptive normalized step — on a cost increase, revert the last
    // step and halve the trust region. The gradient at the reverted point
    // is already cached in best_g (re-running the full cost+gradient
    // evaluation there would cost one extra whole-volume pass per
    // trust-region halving), so fall straight through to the halved step.
    if (it > 0 && cost > prev_cost) {
      grid.disp = best_disp;
      g = best_g;
      cost = best_cost;
      step_scale *= 0.5;
      if (step_scale < 1e-3) break;
    }
    if (it > 4 && prev_cost - cost < 1e-7 * std::fabs(prev_cost)) {
      if (++stall >= 3) break;  // three consecutive negligible improvements
    } else {
      stall = 0;
    }
    prev_cost = cost;

    double gmax = 0;
    for (double v : g) gmax = std::max(gmax, std::fabs(v));
    if (gmax < 1e-12) break;
    // step: a fraction of the (smallest per-axis) control spacing in world
    // units
    double sp_min = std::min({grid.spacing[0], grid.spacing[1],
                              grid.spacing[2]});
    double step = step_scale * sp_min * vox_mm / gmax;
    for (size_t i = 0; i < grid.disp.size(); ++i)
      grid.disp[i] = (float)(grid.disp[i] - step * g[i]);
  }
  if (best_cost < 1e300) grid.disp = best_disp;
}

}  // namespace

// Fold diagnostics (NiftyReg's reg_f3d penalizes negative Jacobians; the
// rebuilt optimizer regularizes with bending energy instead, so report
// whether the fitted warp stayed diffeomorphic): relative Jacobian
// determinant det(d T/dx)/det(A) of T(x) = world(x) + d(x) via central
// differences of the dense displacement over the reference interior.
static void jacobian_stats(const Image& ref, const CppGrid& grid,
                           double* min_j, double* neg_frac) {
  const auto& A = ref.affine;
  const double detA =
      A[0][0] * (A[1][1] * A[2][2] - A[1][2] * A[2][1]) -
      A[0][1] * (A[1][0] * A[2][2] - A[1][2] * A[2][0]) +
      A[0][2] * (A[1][0] * A[2][1] - A[1][1] * A[2][0]);
  double mn = 1e300;
  int64_t neg = 0, total = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) reduction(min : mn) \
    reduction(+ : neg, total)
#endif
  for (int64_t z = 1; z < ref.nz() - 1; ++z)
    for (int64_t y = 1; y < ref.ny() - 1; ++y)
      for (int64_t x = 1; x < ref.nx() - 1; ++x) {
        double J[3][3];
        for (int ax = 0; ax < 3; ++ax) {
          double p[3] = {(double)x, (double)y, (double)z};
          double m[3] = {(double)x, (double)y, (double)z};
          p[ax] += 1.0;
          m[ax] -= 1.0;
          Vec3 dp = grid.displacement(p[0], p[1], p[2]);
          Vec3 dm = grid.displacement(m[0], m[1], m[2]);
          J[0][ax] = A[0][ax] + 0.5 * (dp.x - dm.x);
          J[1][ax] = A[1][ax] + 0.5 * (dp.y - dm.y);
          J[2][ax] = A[2][ax] + 0.5 * (dp.z - dm.z);
        }
        double det = J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1]) -
                     J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0]) +
                     J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0]);
        det /= detA;
        mn = std::min(mn, det);
        if (det <= 0.0) ++neg;
        ++total;
      }
  *min_j = mn;
  *neg_frac = total ? (double)neg / (double)total : 0.0;
}

int main(int argc, char** argv) {
  std::string ref_path, flo_path, aff_path, cpp_path, res_path;
  double sx_mm = 10.0, be = -1.0;  // default resolved per cost below
  int maxit = 25;
  bool use_nmi = true;  // NMI by default — NiftyReg reg_f3d parity (base.py:516-521)
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
    else if (a == "-nmi" || a == "--nmi") use_nmi = true;
    else if (a == "-ssd" || a == "--ssd") use_nmi = false;
    else if (a == "-voff") { }
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 1; }
  }
  if (be < 0.0) {
    // NMI needs a stronger bending prior: its cost is blind to intensity
    // scale, so under-regularized warps can sharpen the histogram while
    // degrading geometry (measured: be=0.1 is no-harm on already-aligned
    // mono-modal pairs and improves the intensity-remapped recovery;
    // be=0.01 matches the long-standing SSD behavior).
    be = use_nmi ? 0.1 : 0.01;
  }
  if (ref_path.empty() || flo_path.empty() || cpp_path.empty()) {
    std::fprintf(stderr,
                 "usage: reg_f3d -ref R -flo F [-aff A.txt] -cpp OUT.nii "
                 "[-res OUT] [-sx mm] [-maxit n] [-be w] [-nmi | -ssd]\n");
    return 1;
  }

  try {
    Image ref0 = nifti::load(ref_path);
    Image flo0 = nifti::load(flo_path);
    Affine A = nifti::identity_affine();
    if (!aff_path.empty()) A = geom::load_affine_txt(aff_path);

    // per-axis control spacing: -sx is millimetres PER AXIS (NiftyReg
    // semantics) — anisotropic voxels get anisotropic voxel-unit spacing
    // so a 1x1x3 mm scan does not get a 3x denser lattice along z
    double spacing_vox[3];
    for (int j = 0; j < 3; ++j) {
      double col_mm = std::sqrt(ref0.affine[0][j] * ref0.affine[0][j] +
                                ref0.affine[1][j] * ref0.affine[1][j] +
                                ref0.affine[2][j] * ref0.affine[2][j]);
      spacing_vox[j] = std::max(2.0, sx_mm / (col_mm ? col_mm : 1.0));
    }

    // full-resolution grid, affine baked into the initial control values
    CppGrid grid = geom::make_grid(ref0, spacing_vox);
    std::vector<float> d_affine(grid.disp.size());
    for (int64_t k = 0; k < grid.ncz; ++k)
      for (int64_t j = 0; j < grid.ncy; ++j)
        for (int64_t i = 0; i < grid.ncx; ++i) {
          // control (i,j,k) sits at ref voxel ((i-1)*sx, (j-1)*sy, (k-1)*sz)
          Vec3 w = geom::apply(ref0.affine, {(i - 1) * grid.spacing[0],
                                             (j - 1) * grid.spacing[1],
                                             (k - 1) * grid.spacing[2]});
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
    for (int j = 0; j < 3; ++j) coarse.spacing[j] = grid.spacing[j] / 2.0;
    coarse.ref_affine = ref1.affine;
    // vox_offset 0.25: coarse voxel v sits at fine voxel 2v+0.5, so the
    // coarse stage must evaluate the lattice at u=(v+0.25)/(sp/2) to keep
    // control points on the same fine-frame positions the fine stage (and
    // the baked d_affine anchors) interpret the values at
    optimize_level(ref1, flo1, coarse, d_affine, maxit, be, use_nmi, 0.25);
    grid.disp = coarse.disp;

    optimize_level(ref0, flo0, grid, d_affine, std::max(4, maxit / 3), be,
                   use_nmi);

    geom::save_cpp(grid, cpp_path);

    double min_j = 0.0, neg_frac = 0.0;
    jacobian_stats(ref0, grid, &min_j, &neg_frac);
    std::printf("[reg_f3d] jacobian min=%.4f neg_fraction=%.6f\n", min_j,
                neg_frac);
    if (min_j <= 0.0)
      std::fprintf(stderr,
                   "[reg_f3d] WARNING: transform folds (min jacobian "
                   "%.4f over %.2f%% of voxels) — warped priors there are "
                   "unreliable; raise -be\n",
                   min_j, 100.0 * neg_frac);

    if (!res_path.empty()) {
      const Affine flo_w2v = geom::inverse(flo0.affine);
      Image out;
      out.shape = {ref0.nx(), ref0.ny(), ref0.nz()};
      out.affine = ref0.affine;
      out.data.assign(ref0.nvox(), 0.0f);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
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
