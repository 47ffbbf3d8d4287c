"""Connected-component labeling.

Reference counterpart: ``scipy.ndimage.label`` inside
``post_process_segmentation`` (base.py:469). Two implementations:

- :func:`label_components_np` — host path via scipy (default; fast enough
  at 14 calls/scan).
- :func:`label_components_device` — TPU path: iterative min-label
  propagation (6-connectivity, matching scipy's default structuring
  element) under ``lax.while_loop``. Each voxel starts with its linear
  index; every sweep takes the min over itself and its 6 in-mask
  neighbors; fixpoint = connected components labeled by their minimum
  linear index, then densified to 1..n on the host. XLA fuses a sweep
  into a handful of shifted-pad ops; convergence needs O(component
  diameter) sweeps, so sweeps are batched (``sweeps_per_check``) between
  convergence checks to amortize the reduction.
"""

from __future__ import annotations

from functools import partial

import numpy as np
from scipy import ndimage

import jax
import jax.numpy as jnp
from jax import lax


def label_components_np(mask: np.ndarray):
    """scipy 6-connectivity labeling: (labels int32, num)."""
    labels, num = ndimage.label(mask)
    return labels.astype(np.int32), int(num)


@partial(jax.jit, static_argnames=("sweeps_per_check", "max_checks"))
def _propagate_min(mask: jnp.ndarray, sweeps_per_check: int = 32,
                   max_checks: int = 64):
    shape = mask.shape
    n = mask.size
    init = jnp.where(
        mask, jnp.arange(n, dtype=jnp.int32).reshape(shape), jnp.int32(n))

    big = jnp.int32(n)

    def sweep(lab):
        def shifted(axis, direction):
            pad = [(0, 0)] * lab.ndim
            if direction > 0:
                pad[axis] = (1, 0)
                sl = [slice(None)] * lab.ndim
                sl[axis] = slice(0, shape[axis])
            else:
                pad[axis] = (0, 1)
                sl = [slice(None)] * lab.ndim
                sl[axis] = slice(1, shape[axis] + 1)
            return jnp.pad(lab, pad, constant_values=big)[tuple(sl)]

        m = lab
        for axis in range(lab.ndim):
            m = jnp.minimum(m, shifted(axis, +1))
            m = jnp.minimum(m, shifted(axis, -1))
        return jnp.where(mask, m, big)

    def body(state):
        lab, _, it = state
        new = lab
        for _ in range(sweeps_per_check):
            new = sweep(new)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_checks)

    lab, _, _ = lax.while_loop(cond, body, (init, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(mask, lab, -1)


def label_components_device(mask: np.ndarray):
    """TPU connected components; same contract as :func:`label_components_np`
    (labels densified to 1..num in scan order of component minimum index)."""
    mask_j = jnp.asarray(np.asarray(mask, bool))
    roots = np.asarray(_propagate_min(mask_j))
    out = np.zeros(mask.shape, np.int32)
    uniq = np.unique(roots[roots >= 0])
    for i, r in enumerate(uniq, start=1):
        out[roots == r] = i
    return out, int(uniq.size)
