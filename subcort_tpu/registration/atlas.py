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

from subcort_tpu.io import NiftiImage, save_nii


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
