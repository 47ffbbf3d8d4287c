// reg_resample — resample a floating image into a reference grid through a
// saved transform. CLI contract mirrors the reference's NiftyReg usage
// (cnn_cort/base.py:533-536):
//
//   reg_resample -ref <ref.nii[.gz]> -flo <flo.nii[.gz]>
//                (-trans <transform.nii> | -aff <transf.txt>)
//                -res <out.nii[.gz]> [-inter 0|1]
//
// -trans takes a SUBCORT_CPP control-point grid (see geometry.hpp for the
// contract: total world displacement, cubic B-spline). -aff takes a 4x4
// world affine text file. -inter 0 = nearest neighbour, 1 = trilinear
// (default, the reference's setting). 4D floating images are resampled
// channel-by-channel in one invocation (the reference loops 15 single-
// channel calls; this tool accepts both).

#include <cstdio>
#include <cstring>
#include <string>

#include "geometry.hpp"
#include "nifti.hpp"

using geom::Affine;
using geom::Vec3;
using nifti::Image;

int main(int argc, char** argv) {
  std::string ref_path, flo_path, trans_path, aff_path, res_path;
  int inter = 1;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) { std::fprintf(stderr, "missing value for %s\n", a.c_str()); std::exit(1); }
      return argv[++i];
    };
    if (a == "-ref") ref_path = next();
    else if (a == "-flo") flo_path = next();
    else if (a == "-trans" || a == "-cpp") trans_path = next();
    else if (a == "-aff") aff_path = next();
    else if (a == "-res") res_path = next();
    else if (a == "-inter") inter = std::atoi(next().c_str());
    else if (a == "-voff") { /* verbosity-off compat flag */ }
    else { std::fprintf(stderr, "unknown arg %s\n", a.c_str()); return 1; }
  }
  if (ref_path.empty() || flo_path.empty() || res_path.empty() ||
      (trans_path.empty() && aff_path.empty())) {
    std::fprintf(stderr,
                 "usage: reg_resample -ref R -flo F (-trans T.nii | -aff A.txt) "
                 "-res OUT [-inter 0|1]\n");
    return 1;
  }

  try {
    Image ref = nifti::load(ref_path);
    Image flo = nifti::load(flo_path);
    const Affine flo_world_to_vox = geom::inverse(flo.affine);

    bool use_cpp = !trans_path.empty();
    geom::CppGrid grid;
    Affine aff = nifti::identity_affine();
    if (use_cpp) grid = geom::load_cpp(trans_path, ref);
    else aff = geom::load_affine_txt(aff_path);

    Image out;
    out.shape = {ref.nx(), ref.ny(), ref.nz()};
    int64_t nt = flo.nt();
    if (nt > 1) out.shape.push_back(nt);
    out.affine = ref.affine;
    out.data.assign(ref.nvox() * nt, 0.0f);

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t z = 0; z < ref.nz(); ++z)
      for (int64_t y = 0; y < ref.ny(); ++y)
        for (int64_t x = 0; x < ref.nx(); ++x) {
          Vec3 w = geom::apply(ref.affine, {(double)x, (double)y, (double)z});
          Vec3 fw;
          if (use_cpp) {
            Vec3 d = grid.displacement((double)x, (double)y, (double)z);
            fw = {w.x + d.x, w.y + d.y, w.z + d.z};
          } else {
            fw = geom::apply(aff, w);
          }
          Vec3 fv = geom::apply(flo_world_to_vox, fw);
          for (int64_t t = 0; t < nt; ++t) {
            float v;
            if (inter == 0) {
              int64_t xi = (int64_t)std::lround(fv.x),
                      yi = (int64_t)std::lround(fv.y),
                      zi = (int64_t)std::lround(fv.z);
              v = (xi >= 0 && yi >= 0 && zi >= 0 && xi < flo.nx() &&
                   yi < flo.ny() && zi < flo.nz())
                      ? flo.at(xi, yi, zi, t)
                      : 0.0f;
            } else {
              v = flo.sample(fv.x, fv.y, fv.z, t);
            }
            out.data[x + ref.nx() * (y + ref.ny() * (z + ref.nz() * t))] = v;
          }
        }

    nifti::save(out, res_path);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "reg_resample: %s\n", e.what());
    return 1;
  }
  return 0;
}
