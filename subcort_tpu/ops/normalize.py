"""Intensity normalization.

Reference semantics (train: base.py:146; inference: base.py:358): subtract
the mean and divide by the std of the *nonzero* voxels. numpy reduces in
float64 regardless of input dtype, so we do too, then emit float32 for the
device path.
"""

from __future__ import annotations

import numpy as np


def normalize_nonzero(vol: np.ndarray, dtype=np.float32):
    """(vol - mean(vol[vol!=0])) / std(vol[vol!=0]), stats in float64.

    Returns (normalized volume as ``dtype``, mean, std). Zero voxels are
    *included* in the output (they become ``-mean/std``), exactly as the
    reference does — only the statistics are restricted to nonzero voxels.
    """
    vol = np.asarray(vol)
    nz = vol[vol != 0]
    if nz.size == 0:
        raise ValueError("volume is identically zero; cannot normalize")
    mean = float(nz.mean(dtype=np.float64))
    std = float(nz.std(dtype=np.float64))
    if std == 0.0:
        raise ValueError("nonzero voxels have zero variance; cannot normalize")
    out = ((vol.astype(np.float64) - mean) / std).astype(dtype)
    return out, mean, std
