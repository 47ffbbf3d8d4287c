"""Device-mesh and sharding helpers (first-class component with no reference
analogue — SURVEY.md §2.5).

The workload is embarrassingly parallel over patches/voxels, so the one
parallelism that maps is **data parallelism**: the global batch (train) or
the candidate-voxel axis (inference) is sharded over a 1D ``('data',)``
mesh; parameters are replicated; gradient reduction happens inside jit as
XLA-inserted psums over ICI. TP/PP/EP/SP have no counterpart here (883k
params, no MoE, no sequence axis) — the mesh abstraction still keeps model
code pjit-clean so wider meshes are a config change.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch/voxel) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """device_put every leaf with its leading axis split across the mesh.

    Leading dims must be divisible by the mesh size — callers pad
    (inference pads with sentinel centers; the trainer pads/crops batches).
    """
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
