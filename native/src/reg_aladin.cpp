// reg_aladin — block-matching affine registration. CLI contract mirrors the
// reference's NiftyReg usage (cnn_cort/base.py:510-513):
//
//   reg_aladin -ref <ref> -flo <flo> -aff <transf.txt> -res <resampled>
//              [-ln <levels>] [-lp <levels-to-perform>] [-maxit <iters/level>]
//
// -ln/-lp follow NiftyReg: -ln sets the pyramid depth, -lp how many of the
// coarsest levels to actually run (clamped to -ln, with a note on stderr).
//
// Algorithm (classic Ourselin-style block matching, written from the
// method description, not from NiftyReg sources):
//   multi-resolution pyramid; per level, iterate:
//     1. pick high-variance 4^3 reference blocks (top quartile, nonzero)
//     2. for each block, search the floating image (through the current
//        affine) over integer voxel shifts for the best normalized
//        cross-correlation match -> a (ref_world, flo_world) pair
//     3. least-trimmed-squares affine fit (12 dof) on the pairs, keeping
//        the best 50% residuals, iterated
// Output transf.txt: 4x4 world affine A with flo_world = A * ref_world
// (pull semantics — see geometry.hpp).

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "geometry.hpp"
#include "nifti.hpp"

using geom::Affine;
using geom::Vec3;
using nifti::Image;

namespace {

constexpr int BS = 4;       // block edge (voxels)
constexpr int SEARCH = 3;   // +/- search radius (voxels)

struct Pair {
  Vec3 ref_w, flo_w;
  double score;
};

// Solve the 12-dof least-squares affine flo = A * ref from point pairs.
Affine fit_affine(const std::vector<Pair>& pairs, const std::vector<int>& idx) {
  // normal equations per output row: minimize ||M a_r - b_r||, M rows =
  // [rx ry rz 1]
  double mtm[4][4] = {};
  double mtb[3][4] = {};
  for (int id : idx) {
    const Pair& p = pairs[id];
    double r[4] = {p.ref_w.x, p.ref_w.y, p.ref_w.z, 1.0};
    double f[3] = {p.flo_w.x, p.flo_w.y, p.flo_w.z};
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j) mtm[i][j] += r[i] * r[j];
    for (int c = 0; c < 3; ++c)
      for (int i = 0; i < 4; ++i) mtb[c][i] += f[c] * r[i];
  }
  // solve mtm * x = mtb^T per row via Gauss elimination
  Affine A = nifti::identity_affine();
  for (int c = 0; c < 3; ++c) {
    double m[4][5];
    for (int i = 0; i < 4; ++i) {
      for (int j = 0; j < 4; ++j) m[i][j] = mtm[i][j];
      m[i][4] = mtb[c][i];
    }
    for (int col = 0; col < 4; ++col) {
      int piv = col;
      for (int r = col + 1; r < 4; ++r)
        if (std::fabs(m[r][col]) > std::fabs(m[piv][col])) piv = r;
      if (std::fabs(m[piv][col]) < 1e-12) return A;  // degenerate: identity row
      if (piv != col)
        for (int j = 0; j < 5; ++j) std::swap(m[piv][j], m[col][j]);
      double d = m[col][col];
      for (int j = 0; j < 5; ++j) m[col][j] /= d;
      for (int r = 0; r < 4; ++r) {
        if (r == col) continue;
        double f = m[r][col];
        for (int j = 0; j < 5; ++j) m[r][j] -= f * m[col][j];
      }
    }
    for (int j = 0; j < 4; ++j) A[c][j] = m[j][4];
  }
  return A;
}

// Trimmed translation-only fit: robust at coarse pyramid levels, where too
// few blocks exist to constrain 12 affine dof (a full fit there can invent
// wild scales that push fine-level matches outside the search range).
Affine trans_fit(const std::vector<Pair>& pairs, const Affine& init) {
  if (pairs.empty()) return init;
  std::vector<double> dx, dy, dz;
  for (const Pair& p : pairs) {
    Vec3 q = geom::apply(init, p.ref_w);
    dx.push_back(p.flo_w.x - q.x);
    dy.push_back(p.flo_w.y - q.y);
    dz.push_back(p.flo_w.z - q.z);
  }
  auto median = [](std::vector<double>& v) {
    std::nth_element(v.begin(), v.begin() + v.size() / 2, v.end());
    return v[v.size() / 2];
  };
  Affine A = init;
  A[0][3] += median(dx);
  A[1][3] += median(dy);
  A[2][3] += median(dz);
  return A;
}

Affine lts_fit(std::vector<Pair>& pairs, const Affine& init, int rounds = 4) {
  if (pairs.size() < 64) return trans_fit(pairs, init);
  std::vector<int> idx(pairs.size());
  for (size_t i = 0; i < pairs.size(); ++i) idx[i] = (int)i;
  Affine A = fit_affine(pairs, idx);
  for (int r = 0; r < rounds; ++r) {
    std::vector<std::pair<double, int>> res;
    res.reserve(pairs.size());
    for (size_t i = 0; i < pairs.size(); ++i) {
      Vec3 p = geom::apply(A, pairs[i].ref_w);
      double dx = p.x - pairs[i].flo_w.x, dy = p.y - pairs[i].flo_w.y,
             dz = p.z - pairs[i].flo_w.z;
      res.push_back({dx * dx + dy * dy + dz * dz, (int)i});
    }
    std::sort(res.begin(), res.end());
    size_t keep = pairs.size() / 2;
    idx.clear();
    for (size_t i = 0; i < keep; ++i) idx.push_back(res[i].second);
    A = fit_affine(pairs, idx);
  }
  return A;
}

// One block-matching pass at the current level/affine. Returns pairs.
std::vector<Pair> block_match(const Image& ref, const Image& flo,
                              const Affine& A) {
  const Affine flo_w2v = geom::inverse(flo.affine);
  const int64_t bx = ref.nx() / BS, by = ref.ny() / BS, bz = ref.nz() / BS;

  // block variance ranking
  struct Blk { int64_t x, y, z; double var; };
  std::vector<Blk> blocks;
  blocks.reserve(bx * by * bz);
  for (int64_t kz = 0; kz < bz; ++kz)
    for (int64_t ky = 0; ky < by; ++ky)
      for (int64_t kx = 0; kx < bx; ++kx) {
        double s = 0, s2 = 0;
        int nz_count = 0;
        for (int dz = 0; dz < BS; ++dz)
          for (int dy = 0; dy < BS; ++dy)
            for (int dx = 0; dx < BS; ++dx) {
              float v = ref.at(kx * BS + dx, ky * BS + dy, kz * BS + dz);
              s += v;
              s2 += (double)v * v;
              if (v != 0.0f) ++nz_count;
            }
        const int n = BS * BS * BS;
        if (nz_count < n / 2) continue;  // skip background blocks
        double var = s2 / n - (s / n) * (s / n);
        if (var > 0) blocks.push_back({kx * BS, ky * BS, kz * BS, var});
      }
  if (blocks.empty()) return {};
  size_t want = std::max<size_t>(64, blocks.size() / 4);
  want = std::min(want, blocks.size());
  std::partial_sort(blocks.begin(), blocks.begin() + want, blocks.end(),
                    [](const Blk& a, const Blk& b) { return a.var > b.var; });
  blocks.resize(want);

  const int M = SEARCH;            // margin
  const int L = BS + 2 * M;        // local floating buffer edge

  // one result slot per block, filled in parallel (score<0 = no match),
  // compacted in block order afterwards — deterministic under OpenMP
  std::vector<Pair> slots(blocks.size());
  for (auto& p : slots) p.score = -1.0;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t bi = 0; bi < (int64_t)blocks.size(); ++bi) {
    const Blk& b = blocks[bi];
    std::vector<float> fbuf(L * L * L);
    // reference block stats
    float rv[BS * BS * BS];
    double rs = 0, rs2 = 0;
    int t = 0;
    for (int dz = 0; dz < BS; ++dz)
      for (int dy = 0; dy < BS; ++dy)
        for (int dx = 0; dx < BS; ++dx, ++t) {
          rv[t] = ref.at(b.x + dx, b.y + dy, b.z + dz);
          rs += rv[t];
          rs2 += (double)rv[t] * rv[t];
        }
    const int n = BS * BS * BS;
    double rmean = rs / n;
    double rvar = rs2 / n - rmean * rmean;
    if (rvar <= 0) continue;

    // sample the floating image once over block+margin through A
    Affine T = geom::matmul(flo_w2v, geom::matmul(A, ref.affine));
    for (int dz = 0; dz < L; ++dz)
      for (int dy = 0; dy < L; ++dy)
        for (int dx = 0; dx < L; ++dx) {
          Vec3 fv = geom::apply(
              T, {(double)(b.x + dx - M), (double)(b.y + dy - M),
                  (double)(b.z + dz - M)});
          fbuf[dx + L * (dy + L * dz)] = flo.sample(fv.x, fv.y, fv.z);
        }

    // NCC over integer shifts within the buffer
    double best = -2.0;
    int bsx = 0, bsy = 0, bsz = 0;
    for (int sz = 0; sz <= 2 * M; ++sz)
      for (int sy = 0; sy <= 2 * M; ++sy)
        for (int sx = 0; sx <= 2 * M; ++sx) {
          double fs = 0, fs2 = 0, cross = 0;
          int t2 = 0;
          for (int dz = 0; dz < BS; ++dz)
            for (int dy = 0; dy < BS; ++dy)
              for (int dx = 0; dx < BS; ++dx, ++t2) {
                float f = fbuf[(sx + dx) + L * ((sy + dy) + L * (sz + dz))];
                fs += f;
                fs2 += (double)f * f;
                cross += (double)f * rv[t2];
              }
          double fmean = fs / n;
          double fvar = fs2 / n - fmean * fmean;
          if (fvar <= 1e-12) continue;
          double ncc = (cross / n - rmean * fmean) / std::sqrt(rvar * fvar);
          if (ncc > best) { best = ncc; bsx = sx; bsy = sy; bsz = sz; }
        }
    if (best < 0.5) continue;  // weak match: drop

    // correspondence: block center in ref world -> matched center in flo world
    double cxv = b.x + (BS - 1) / 2.0, cyv = b.y + (BS - 1) / 2.0,
           czv = b.z + (BS - 1) / 2.0;
    Vec3 ref_w = geom::apply(ref.affine, {cxv, cyv, czv});
    // matched position: ref voxel shifted by (s - M) mapped through A
    Vec3 flo_w = geom::apply(
        geom::matmul(A, ref.affine),
        {cxv + (bsx - M), cyv + (bsy - M), czv + (bsz - M)});
    slots[bi] = {ref_w, flo_w, best};
  }
  std::vector<Pair> pairs;
  pairs.reserve(slots.size());
  for (const Pair& p : slots)
    if (p.score >= 0.0) pairs.push_back(p);
  return pairs;
}

}  // namespace

int main(int argc, char** argv) {
  std::string ref_path, flo_path, aff_path, res_path;
  int levels = 3, perform = -1, maxit = 4;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) { std::fprintf(stderr, "missing value for %s\n", a.c_str()); std::exit(1); }
      return argv[++i];
    };
    if (a == "-ref") ref_path = next();
    else if (a == "-flo") flo_path = next();
    else if (a == "-aff") aff_path = next();
    else if (a == "-res") res_path = next();
    // NiftyReg semantics: -ln = pyramid depth, -lp = how many of the
    // COARSEST levels to actually perform (<= ln); "-ln 3 -lp 2" stops
    // before full resolution
    else if (a == "-ln") levels = std::atoi(next().c_str());
    else if (a == "-lp") perform = std::atoi(next().c_str());
    else if (a == "-maxit") maxit = std::atoi(next().c_str());
    else if (a == "-voff") { }
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 1; }
  }
  if (ref_path.empty() || flo_path.empty() || aff_path.empty()) {
    std::fprintf(stderr,
                 "usage: reg_aladin -ref R -flo F -aff OUT.txt [-res OUT.nii] "
                 "[-ln levels] [-lp perform] [-maxit n]\n");
    return 1;
  }

  try {
    Image ref0 = nifti::load(ref_path);
    Image flo0 = nifti::load(flo_path);

    // pyramids, coarse-first
    std::vector<Image> refs{ref0}, flos{flo0};
    for (int l = 1; l < levels; ++l) {
      refs.insert(refs.begin(), geom::downsample2(refs.front()));
      flos.insert(flos.begin(), geom::downsample2(flos.front()));
    }

    // init: align volume centers (translation in world space)
    Affine A = nifti::identity_affine();
    {
      Vec3 rc = geom::apply(ref0.affine, {(ref0.nx() - 1) / 2.0,
                                          (ref0.ny() - 1) / 2.0,
                                          (ref0.nz() - 1) / 2.0});
      Vec3 fc = geom::apply(flo0.affine, {(flo0.nx() - 1) / 2.0,
                                          (flo0.ny() - 1) / 2.0,
                                          (flo0.nz() - 1) / 2.0});
      A[0][3] = fc.x - rc.x;
      A[1][3] = fc.y - rc.y;
      A[2][3] = fc.z - rc.z;
    }

    if (perform > levels)
      std::fprintf(stderr,
                   "[reg_aladin] -lp %d exceeds -ln %d; performing %d "
                   "level(s)\n", perform, levels, levels);
    const int n_perform =
        (perform > 0) ? std::min(perform, levels) : levels;
    for (int l = 0; l < n_perform; ++l) {
      // too-coarse levels have too few blocks to be useful
      if (std::min({refs[l].nx(), refs[l].ny(), refs[l].nz()}) < 24) continue;
      const bool full_dof = (l == n_perform - 1);
      for (int it = 0; it < maxit; ++it) {
        std::vector<Pair> pairs = block_match(refs[l], flos[l], A);
        if (pairs.size() < 8) break;
        A = full_dof ? lts_fit(pairs, A) : trans_fit(pairs, A);
      }
    }

    geom::save_affine_txt(A, aff_path);

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
            Vec3 w = geom::apply(ref0.affine, {(double)x, (double)y, (double)z});
            Vec3 fv = geom::apply(flo_w2v, geom::apply(A, w));
            out.at(x, y, z) = flo0.sample(fv.x, fv.y, fv.z);
          }
      nifti::save(out, res_path);
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "reg_aladin: %s\n", e.what());
    return 1;
  }
  return 0;
}
