"""Device-side scatter of per-voxel predictions back into label/prob volumes.

Reference: base.py:430-431,439-440 scatters on host with fancy indexing.
Here the label volume is built on device with XLA scatters; padded
(sentinel) centers use out-of-range indices, which JAX scatter drops — so
chunk padding needs no masking.
"""

from __future__ import annotations

import jax.numpy as jnp


def scatter_labels(shape, centers: jnp.ndarray, labels: jnp.ndarray,
                   dtype=jnp.uint8) -> jnp.ndarray:
    """Zeros volume of ``shape`` with ``labels`` written at ``centers``.

    Out-of-bounds centers are dropped (JAX scatter default) — used for the
    chunk-padding sentinel (center = volume extent).
    """
    vol = jnp.zeros(shape, dtype=dtype)
    return vol.at[centers[:, 0], centers[:, 1], centers[:, 2]].set(
        labels.astype(dtype), mode="drop")


def scatter_probs(shape, centers: jnp.ndarray, probs: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Zeros (X, Y, Z, C) volume with per-class probabilities scattered in."""
    vol = jnp.zeros(tuple(shape) + (probs.shape[-1],), dtype=dtype)
    return vol.at[centers[:, 0], centers[:, 1], centers[:, 2], :].set(
        probs.astype(dtype), mode="drop")
