"""On-device FFD registration backend: recovers a known warp, and its
transform.nii is consumable by both the C++ resampler and the JAX resampler
(cross-runtime file contract)."""

import os
import subprocess

import numpy as np
import pytest
from scipy import ndimage

from subcort_tpu.io import NiftiImage, load_nii, save_nii
from subcort_tpu.registration import load_cpp_grid, resample_through_cpp
from subcort_tpu.registration.jax_ffd import register_ffd_jax, save_cpp_grid

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


@pytest.fixture(scope="module")
def warped_pair():
    rng = np.random.default_rng(7)
    base = ndimage.gaussian_filter(rng.random((36, 36, 32)) * 100, 2).astype(np.float32)
    base[:4] = 0
    base[-4:] = 0
    gx = 1.2 * np.sin(np.linspace(0, np.pi, 36))[:, None, None]
    coords = np.stack(np.meshgrid(*[np.arange(s) for s in base.shape],
                                  indexing="ij"), 0).astype(np.float64)
    coords[0] += gx
    flo = ndimage.map_coordinates(base, coords, order=1).astype(np.float32)
    return base, flo


def test_jax_ffd_reduces_mismatch(warped_pair):
    ref, flo = warped_pair
    grid, losses = register_ffd_jax(ref, flo, spacing_mm=6.0,
                                    iters=(40, 8), be=0.02)
    # optimization made progress at both levels
    assert losses[0][-1] < losses[0][0] * 0.7
    warped = resample_through_cpp(flo, np.eye(4), grid, ref.shape, np.eye(4))
    before = float(((flo - ref) ** 2)[4:-4].mean())
    after = float(((warped - ref) ** 2)[4:-4].mean())
    assert after < before * 0.6


@pytest.mark.skipif(not os.path.exists(os.path.join(TOOLS, "reg_resample")),
                    reason="native tools not built")
def test_jax_ffd_transform_consumable_by_cpp_tool(warped_pair, tmp_path):
    ref, flo = warped_pair
    grid, _ = register_ffd_jax(ref, flo, spacing_mm=6.0, iters=(30, 5),
                               be=0.02)
    cpp = str(tmp_path / "transform.nii")
    save_cpp_grid(grid, cpp)

    ref_p = str(tmp_path / "ref.nii.gz")
    flo_p = str(tmp_path / "flo.nii.gz")
    save_nii(NiftiImage(ref), ref_p)
    save_nii(NiftiImage(flo), flo_p)
    out = str(tmp_path / "out.nii.gz")
    r = subprocess.run([os.path.join(TOOLS, "reg_resample"),
                        "-ref", ref_p, "-flo", flo_p,
                        "-trans", cpp, "-res", out],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    got_cpp = load_nii(out).data

    # same grid through the JAX resampler must agree with the C++ tool
    grid2 = load_cpp_grid(cpp, np.eye(4))
    got_jax = resample_through_cpp(flo, np.eye(4), grid2, ref.shape, np.eye(4))
    np.testing.assert_allclose(got_cpp, got_jax, atol=5e-3, rtol=1e-3)
