"""Atlas asset schema + synthetic generator.

The real assets (MNI T1 template + 15-channel probabilistic subcortical
atlas) are external data: the reference ships them via git-LFS
(cnn_cort/atlases/, absent from this mount — .MISSING_LARGE_BLOBS). Schema:

  T1_template.nii.gz            (X, Y, Z) float, MNI-space T1 intensities
  atlas_subcortical_MNI.nii.gz  (X, Y, Z, 15) float32 probabilities,
                                channels 0..13 = structures, 14 = background

This module generates geometrically consistent *synthetic* assets for tests
and demos: a phantom "template" brain with ellipsoidal structures and the
matching probabilistic atlas, so the whole registration pipeline (affine ->
FFD -> prior warping -> ROI mask) can be validated end-to-end with known
ground truth and no external downloads.
"""

from __future__ import annotations

import os

import numpy as np

from subcort_tpu.io import NiftiImage, load_nii, save_nii


class AtlasValidationError(ValueError):
    """A user-supplied atlas asset does not match the required schema."""


def validate_atlas_assets(template_path: str, atlas_path: str):
    """Validate user-supplied MNI assets against the schema the pipeline
    assumes (consumed at base.py:511,528 in the reference):

      template  (X, Y, Z) scalar T1 intensities
      atlas     (X, Y, Z, 15) probabilities, channels 0..13 = structures,
                channel 14 = background, values in [0, 1], same grid as
                the template

    Returns (template NiftiImage, atlas NiftiImage) on success; raises
    AtlasValidationError with an actionable message otherwise.
    """
    for p in (template_path, atlas_path):
        if not os.path.exists(p):
            raise AtlasValidationError(f"{p}: file not found")
    tmpl = load_nii(template_path)
    atlas = load_nii(atlas_path)

    tdata = np.asarray(tmpl.data)
    adata = np.asarray(atlas.data)
    if tdata.ndim == 4 and tdata.shape[3] == 1:
        # (X, Y, Z, 1) writers: squeeze, and propagate the squeezed volume
        # so install_atlas persists a true-3D template (downstream consumers
        # — e.g. the jax FFD's pyramid reshape — assume exactly 3 dims)
        tdata = tdata[..., 0]
        tmpl = NiftiImage(tdata, tmpl.affine, tmpl.header)
    if tdata.ndim != 3:
        raise AtlasValidationError(
            f"{template_path}: template must be a 3D volume, got shape {tdata.shape}")
    if adata.ndim != 4 or adata.shape[3] != 15:
        raise AtlasValidationError(
            f"{atlas_path}: atlas must be (X, Y, Z, 15) — 14 structure "
            f"channels + background at channel 14 — got shape {adata.shape}")
    if adata.shape[:3] != tdata.shape:
        raise AtlasValidationError(
            f"atlas grid {adata.shape[:3]} does not match template grid "
            f"{tdata.shape}; both must live on the same MNI voxel grid")
    if not np.isfinite(adata).all() or not np.isfinite(tdata).all():
        raise AtlasValidationError("atlas/template contain non-finite values")
    amin, amax = float(adata.min()), float(adata.max())
    if amin < -1e-4 or amax > 1.0 + 1e-4:
        raise AtlasValidationError(
            f"atlas values must be probabilities in [0, 1], got "
            f"[{amin:.4g}, {amax:.4g}]")
    # channel-14 convention: background should dominate OUTSIDE the
    # structures, i.e. carry more total mass than any single structure
    ch_mass = adata.reshape(-1, 15).sum(0)
    if ch_mass[14] < ch_mass[:14].max():
        raise AtlasValidationError(
            "channel 14 carries less mass than a structure channel — it must "
            "be the background channel (reference convention, base.py:392-394); "
            "is the atlas channel order different?")
    if (ch_mass[:14] <= 0).any():
        empty = [int(i) for i in np.where(ch_mass[:14] <= 0)[0]]
        raise AtlasValidationError(
            f"structure channels {empty} are entirely empty")
    return tmpl, atlas


def install_atlas(template_path: str, atlas_path: str,
                  dest_dir: str | None = None) -> str:
    """Validate and install user-supplied atlas assets so the registration
    pipeline finds them (the reference ships them via git-LFS; here they
    are external data — SURVEY.md §2.4). Returns the install directory.

    Assets are written under ``dest_dir`` (default: the package's
    ``atlases/`` directory, the last stop of the resolution order in
    driver._resolve_atlas_dir) with the canonical filenames and float32
    dtype, re-encoded through our own NIfTI writer so downstream readers
    see a uniform encoding.
    """
    from subcort_tpu.registration.driver import (ATLAS_NAME, DEFAULT_ATLAS_DIR,
                                                 TEMPLATE_NAME)
    tmpl, atlas = validate_atlas_assets(template_path, atlas_path)
    dest = dest_dir or DEFAULT_ATLAS_DIR
    os.makedirs(dest, exist_ok=True)
    save_nii(NiftiImage(np.asarray(tmpl.data, np.float32), tmpl.affine),
             os.path.join(dest, TEMPLATE_NAME))
    save_nii(NiftiImage(np.asarray(atlas.data, np.float32), atlas.affine),
             os.path.join(dest, ATLAS_NAME))
    return dest


def make_synthetic_cohort(root: str, n_subjects: int = 4,
                          shape=(64, 72, 60), seed: int = 0,
                          atlas_dir: str | None = None,
                          noise: float = 8.0, intensity_jitter: float = 0.15,
                          max_shift: int = 3, prior_error: int = 1,
                          write_priors: bool = True):
    """Write a phantom training/inference cohort under ``root``.

    Each subject is the synthetic template under a random integer shift,
    global intensity scale and additive Gaussian noise; its 15-class GT
    (classes 1..14 = structures, 15 = 2-voxel boundary-background ring —
    the reference's restricted-sampling convention, base.py:124,162) is
    derived from the identically shifted atlas. When ``write_priors``, the
    per-subject ``tmp/`` prior volume + subcortical mask are also written —
    shifted by an *additional* ±``prior_error`` voxel registration-error
    jitter, so a model cannot solve the task by copying the prior channel —
    letting training/inference run without the registration subsystem
    (which has its own quality gate, bench_reg.py).

    Returns the list of subject directories.
    """
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    # default atlas assets live BESIDE the cohort, not inside it: every
    # subdirectory of a train/inference folder is treated as a subject
    # (list_training_subjects / load_test_names contract)
    atlas_dir = atlas_dir or (os.path.normpath(root) + "_atlases")
    template, atlas = make_synthetic_atlas(atlas_dir, shape=shape, seed=seed)
    subs = []
    for i in range(n_subjects):
        sub = os.path.join(root, f"s{i:02d}")
        os.makedirs(os.path.join(sub, "tmp"), exist_ok=True)
        off = tuple(int(v) for v in rng.integers(-max_shift, max_shift + 1, 3))
        t1 = np.roll(template, off, axis=(0, 1, 2))
        at = np.roll(atlas, off, axis=(0, 1, 2))
        gt = np.zeros(shape, np.uint8)
        for s in range(14):
            gt[at[..., s] > 0.5] = s + 1
        ring = ndimage.binary_dilation(gt > 0, iterations=2) & (gt == 0)
        gt[ring] = 15
        scale = 1.0 + float(rng.uniform(-intensity_jitter, intensity_jitter))
        t1 = t1 * scale + rng.normal(0, noise, shape) * (t1 > 0)
        t1 = np.clip(t1, 0, None).astype(np.float32)
        save_nii(NiftiImage(t1), os.path.join(sub, "T1.nii.gz"))
        save_nii(NiftiImage(gt), os.path.join(sub, "gt_15_classes.nii.gz"))
        if write_priors:
            perr = tuple(int(v) for v in
                         rng.integers(-prior_error, prior_error + 1, 3))
            pri = np.roll(at, perr, axis=(0, 1, 2)).astype(np.float32)
            save_nii(NiftiImage(pri),
                     os.path.join(sub, "tmp", "MNI_sub_probabilities.nii.gz"))
            # reference mask convention (base.py:544-549): dilate(sum 0:13)
            mask = ndimage.binary_dilation(
                pri[..., :13].sum(-1) > 0, iterations=5).astype(np.uint8)
            save_nii(NiftiImage(mask),
                     os.path.join(sub, "tmp", "MNI_subcortical_mask.nii.gz"))
        subs.append(sub)
    return subs


def make_synthetic_atlas(out_dir: str, shape=(64, 72, 60), seed: int = 0,
                         n_structures: int = 14):
    """Write T1_template.nii.gz + atlas_subcortical_MNI.nii.gz to out_dir.

    Returns (template ndarray, atlas ndarray). The template has a bright
    ellipsoidal "brain" with distinct intensity blobs at each structure
    site; the atlas has a smooth probability bump per structure and a
    background channel filling the remainder.
    """
    rng = np.random.default_rng(seed)
    X, Y, Z = shape
    x, y, z = np.ogrid[:X, :Y, :Z]
    cx, cy, cz = (X - 1) / 2, (Y - 1) / 2, (Z - 1) / 2

    brain = (((x - cx) / (0.45 * X)) ** 2 + ((y - cy) / (0.45 * Y)) ** 2 +
             ((z - cz) / (0.45 * Z)) ** 2) < 1.0
    template = np.zeros(shape, np.float32)
    template[brain] = 400.0

    atlas = np.zeros(shape + (15,), np.float32)
    centers = []
    for s in range(n_structures):
        # structure sites on a ring inside the brain
        ang = 2 * np.pi * s / n_structures
        sx = cx + 0.22 * X * np.cos(ang)
        sy = cy + 0.22 * Y * np.sin(ang)
        sz = cz + 0.10 * Z * np.sin(2 * ang)
        centers.append((sx, sy, sz))
        r2 = (((x - sx) / (0.06 * X)) ** 2 + ((y - sy) / (0.06 * Y)) ** 2 +
              ((z - sz) / (0.08 * Z)) ** 2)
        bump = np.exp(-r2).astype(np.float32)
        atlas[..., s] = np.where(bump > 0.05, bump, 0.0)
        template += (150.0 + 30.0 * s) * np.where(r2 < 1.0, 1.0, 0.0).astype(np.float32)

    template += rng.normal(0, 5.0, shape).astype(np.float32) * brain
    template = np.clip(template, 0, None)

    struct_sum = atlas[..., :14].sum(-1)
    atlas[..., 14] = np.where(brain & (struct_sum < 0.5), 1.0 - struct_sum, 0.0)
    # normalize where any mass exists
    tot = atlas.sum(-1, keepdims=True)
    atlas = np.where(tot > 0, atlas / np.maximum(tot, 1e-6), 0.0).astype(np.float32)

    os.makedirs(out_dir, exist_ok=True)
    save_nii(NiftiImage(template), os.path.join(out_dir, "T1_template.nii.gz"))
    save_nii(NiftiImage(atlas), os.path.join(out_dir, "atlas_subcortical_MNI.nii.gz"))
    return template, atlas
