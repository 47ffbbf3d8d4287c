"""Voxel-coordinate sampling with explicit, reproducible PRNG.

The reference's sampler (base.py:310-331 ``get_mask_voxels``) used an
*unseeded* ``random.shuffle`` for negative subsampling, making training sets
non-deterministic (SURVEY.md §2.3-8: ``random_state`` is accepted at
base.py:120 but never used). Here every random choice takes an explicit
``numpy.random.Generator`` so runs are reproducible; pass ``rng=None`` to get
the reference's non-deterministic behavior ("compat mode").
"""

from __future__ import annotations

import numpy as np


def get_mask_voxels(mask: np.ndarray, size: int | None = None,
                    rng: np.random.Generator | None = None) -> np.ndarray:
    """Coordinates of nonzero voxels as an (N, 3) int32 array.

    Enumeration order is ``np.nonzero`` order (C-order), matching the
    reference. With ``size``, the list is shuffled and truncated — the
    reference's balanced/restricted sampling primitive (base.py:327-329).
    """
    idx = np.stack(np.nonzero(mask), axis=1).astype(np.int32)
    if size is not None:
        if rng is None:
            rng = np.random.default_rng()
        perm = rng.permutation(idx.shape[0])
        idx = idx[perm[:size]]
    return idx


def balanced_negative_sample(labels: np.ndarray, n_positives: int,
                             neg_class: int = 15,
                             rng: np.random.Generator | None = None) -> np.ndarray:
    """Sample ``n_positives`` boundary-background voxels (class 15).

    The GT convention annotates only *boundary* voxels as negatives
    (README.md:13); balancing them 1:1 against positives is the reference's
    ``balance_neg`` path (base.py:163-166).
    """
    return get_mask_voxels(labels == neg_class, size=n_positives, rng=rng)


def shuffle_consistent(arrays, rng: np.random.Generator):
    """One permutation applied to every array (same length each).

    Replaces the reference's same-seed ``np.random.permutation`` x5 dance
    (base.py:92-103) with a single explicit permutation.
    """
    n = len(arrays[0])
    for a in arrays:
        if len(a) != n:
            raise ValueError("arrays must share leading dimension")
    perm = rng.permutation(n)
    return [np.asarray(a)[perm] for a in arrays]
