"""Voxel-parallel multi-chip inference (SURVEY.md §2.5: the one parallelism
that maps — the candidate-voxel axis sharded across the device mesh).

The per-scan device program (tri-planar gather -> CNN forward) is wrapped in
``jax.shard_map``: the padded volume and parameters are replicated (the
volume is ~60 MB, the model 3.5 MB — both trivial per chip), the centers and
prior vectors are sharded over the ``('data',)`` mesh, and each chip scans
its local shard. No collectives are needed on the hot path; results come
back voxel-sharded and the host (or a final all-gather) assembles the label
volume. Scaling is embarrassingly linear over ICI-connected chips.

Tested on the 8-device virtual CPU mesh in CI; the driver's
``dryrun_multichip`` exercises the training-side equivalent.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from subcort_tpu.models import apply as model_apply
from subcort_tpu.models.triplanar import DEFAULT_SPEC, TriPlanarSpec
from subcort_tpu.ops import gather_triplanar


def _local_forward(params, padded_vol, centers, vecs, chunk: int,
                   spec: TriPlanarSpec):
    """Per-device shard program: scan chunk-wise over the local centers."""
    n_chunks = centers.shape[0] // chunk
    cs = centers.reshape(n_chunks, chunk, 3)
    av = vecs.reshape(n_chunks, chunk, -1)

    def body(carry, inp):
        c, at = inp
        ax, co, sa = gather_triplanar(padded_vol, c)
        probs = model_apply(params, {"axial": ax, "coronal": co,
                                     "sagittal": sa, "atlas": at}, spec=spec)
        return carry, jnp.argmax(probs, axis=1).astype(jnp.uint8)

    _, labels = jax.lax.scan(body, None, (cs, av))
    return labels.reshape(-1)


def predict_labels_sharded(params, padded_vol, centers: np.ndarray,
                           vecs: np.ndarray, mesh: Mesh, chunk: int = 2048,
                           spec: TriPlanarSpec = DEFAULT_SPEC) -> np.ndarray:
    """Classify candidate voxels across all mesh devices.

    centers (N, 3) / vecs (N, 15) are padded to ndev*chunk granularity,
    split over the mesh, and each device runs the jitted local scan.
    Returns (N,) uint8 labels.
    """
    ndev = mesh.devices.size
    n = centers.shape[0]
    gran = ndev * chunk
    pad = (-n) % gran
    centers_p = np.concatenate([np.asarray(centers, np.int32),
                                np.zeros((pad, 3), np.int32)], axis=0)
    vecs_p = np.concatenate([np.asarray(vecs, np.float32),
                             np.zeros((pad, vecs.shape[1]), np.float32)], axis=0)

    fn = jax.jit(
        jax.shard_map(
            partial(_local_forward, chunk=chunk, spec=spec),
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P("data"),
        ),
    )
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    vol_r = jax.device_put(padded_vol, NamedSharding(mesh, P()))
    centers_s = jax.device_put(centers_p, NamedSharding(mesh, P("data")))
    vecs_s = jax.device_put(vecs_p, NamedSharding(mesh, P("data")))
    labels = fn(params_r, vol_r, centers_s, vecs_s)
    return np.asarray(labels)[:n]
