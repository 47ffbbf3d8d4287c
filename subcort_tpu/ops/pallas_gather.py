"""Pallas tri-planar patch gather — DMA-based extraction for the patch path.

XLA lowers per-center patch gathers to near-scalar gathers on TPU (~seconds
per 8192 32x32 patches x3 views — measured). This kernel instead issues one
*tile-aligned* 2D DMA per (patch, view) from HBM-resident, view-optimized
volume layouts into VMEM, then shifts the unaligned 32x32 window into place
with dynamic rolls:

- Mosaic requires HBM slice starts/sizes in the last two (tiled) dims to be
  multiples of the (8, 128) f32 tile, so each patch copies the aligned
  (40, 256) superblock that contains its window (x8 = 8*(x//8),
  y128 = 128*(y//128), hinted with pl.multiple_of);
- inside VMEM, `pltpu.roll(block, extent - offset, axis)` rotates the
  window to the origin and a static [:32, :32] slice reads it out
  (negative/dynamic-start slicing is not supported; positive dynamic roll
  is).

View-optimized layouts (one transpose each, done once per scan on device):
- axial (x, y) patches read from a (Z', X', Y') copy
- coronal (x, z) patches read from a (Y', X', Z') copy
- sagittal (y, z) patches read from the (X', Y', Z') original
with dim1 padded to max_start8 + SUB and dim2 to max_start128 + LANE so
every superblock is in bounds. Centers arrive via scalar prefetch
(pltpu.PrefetchScalarGridSpec) so DMA addresses are known up front.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

PATCH = 32
HALF = 16
# patches per grid program == DMA pipeline depth (BLOCK*3 copies in
# flight). 16 measured best-or-tied on v5e at training batch sizes; env
# override for hardware retuning without a code change.


def _resolve_block() -> int:
    raw = os.environ.get("SUBCORT_PALLAS_BLOCK", "16")
    try:
        val = int(raw)
    except ValueError:
        val = -1
    if val <= 0:
        import warnings

        warnings.warn(
            f"SUBCORT_PALLAS_BLOCK={raw!r} is not a positive integer; "
            "falling back to 16")
        return 16
    return val


BLOCK = _resolve_block()
SUB = 40       # superblock sublanes: 8-aligned start + 32 window
LANE = 256     # superblock lanes: 128-aligned start + 32 window


def _gather_kernel(centers_ref, volA_ref, volC_ref, volS_ref,
                   out_ax, out_co, out_sa, scratch, sems,
                   plane_strides=(0, 0, 0)):
    """centers are stride-4 rows (subject, cx, cy, cz). ``plane_strides``
    (static) are the per-subject dim-0 extents of the axial/coronal/sagittal
    layouts, so multi-subject stacks (training) index plane
    ``c + HALF + subject * stride``; (0, 0, 0) = single-volume (inference)."""
    i = pl.program_id(0)
    strideA, strideC, strideS = plane_strides

    def starts(b, d0, d1):
        """(aligned d1 start, aligned d2 start, window offsets).
        centers are flattened to 1D for SMEM (2D scalar rows pad to a full
        lane each and blow the 1 MB SMEM budget)."""
        c0 = centers_ref[(i * BLOCK + b) * 4 + 1 + d0]
        c1 = centers_ref[(i * BLOCK + b) * 4 + 1 + d1]
        s1 = pl.multiple_of((c0 // 8) * 8, 8)
        s2 = pl.multiple_of((c1 // 128) * 128, 128)
        return s1, s2, c0 - s1, c1 - s2

    def issue(b):
        s = centers_ref[(i * BLOCK + b) * 4 + 0]
        cx = centers_ref[(i * BLOCK + b) * 4 + 1]
        cy = centers_ref[(i * BLOCK + b) * 4 + 2]
        cz = centers_ref[(i * BLOCK + b) * 4 + 3]
        # axial: plane z+HALF in (Z', X', Y'); window (x, y)
        a1, a2, _, _ = starts(b, 0, 1)
        ax = pltpu.make_async_copy(
            volA_ref.at[cz + HALF + s * strideA, pl.ds(a1, SUB), pl.ds(a2, LANE)],
            scratch.at[b, 0], sems.at[b, 0])
        # coronal: plane y+HALF in (Y', X', Z'); window (x, z)
        c1_, c2_, _, _ = starts(b, 0, 2)
        co = pltpu.make_async_copy(
            volC_ref.at[cy + HALF + s * strideC, pl.ds(c1_, SUB), pl.ds(c2_, LANE)],
            scratch.at[b, 1], sems.at[b, 1])
        # sagittal: plane x+HALF in (X', Y', Z'); window (y, z)
        s1_, s2_, _, _ = starts(b, 1, 2)
        sa = pltpu.make_async_copy(
            volS_ref.at[cx + HALF + s * strideS, pl.ds(s1_, SUB), pl.ds(s2_, LANE)],
            scratch.at[b, 2], sems.at[b, 2])
        return ax, co, sa

    copies = [issue(b) for b in range(BLOCK)]
    for cset in copies:
        for c in cset:
            c.start()

    def extract(b, view, out_ref, d0, d1):
        _, _, o1, o2 = starts(b, d0, d1)
        blockv = scratch[b, view]
        r = pltpu.roll(blockv, LANE - o2, 1)
        r = pltpu.roll(r, SUB - o1, 0)
        out_ref[b] = r[:PATCH, :PATCH]

    for b in range(BLOCK):
        for c in copies[b]:
            c.wait()
        extract(b, 0, out_ax, 0, 1)
        extract(b, 1, out_co, 0, 2)
        extract(b, 2, out_sa, 1, 2)


def _pad_aligned(vol: jnp.ndarray, orig1: int, orig2: int) -> jnp.ndarray:
    """Pad dims 1/2 so every aligned superblock is in bounds.

    orig1/orig2: original (pre-halo) extents along dims 1 and 2 — window
    starts range over [0, orig-1].
    """
    need1 = ((orig1 - 1) // 8) * 8 + SUB
    need2 = ((orig2 - 1) // 128) * 128 + LANE
    p1 = max(0, need1 - vol.shape[1])
    p2 = max(0, need2 - vol.shape[2])
    if p1 or p2:
        vol = jnp.pad(vol, ((0, 0), (0, p1), (0, p2)))
    return vol


def make_view_volumes(padded: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """View-optimized, DMA-aligned layouts from one pad_volume() output.

    Returns (vol_sag (X',Y',Z''), vol_ax (Z',X',Y''), vol_co (Y',X',Z''))."""
    X = padded.shape[0] - 2 * HALF
    Y = padded.shape[1] - 2 * HALF
    Z = padded.shape[2] - 2 * HALF
    vol_sag = _pad_aligned(padded, Y, Z)
    vol_ax = _pad_aligned(jnp.transpose(padded, (2, 0, 1)), X, Y)
    vol_co = _pad_aligned(jnp.transpose(padded, (1, 0, 2)), X, Z)
    return vol_sag, vol_ax, vol_co


def make_view_volumes_subjects(volumes: jnp.ndarray):
    """Batched layouts for a stacked (S, X', Y', Z') pre-padded subject array
    (engine.data.TrainingIndex.volumes): subjects are flattened into each
    layout's plane axis, so one kernel call serves the whole cohort.

    Returns ((vol_sag, vol_ax, vol_co), plane_strides) where plane_strides
    are the per-subject dim-0 extents to pass to gather_triplanar_pallas.
    Each subject is halo-padded, so windows never cross subject boundaries.
    """
    S, Xp, Yp, Zp = volumes.shape
    X, Y, Z = Xp - 2 * HALF, Yp - 2 * HALF, Zp - 2 * HALF
    vol_sag = _pad_aligned(volumes.reshape(S * Xp, Yp, Zp), Y, Z)
    vol_ax = _pad_aligned(
        jnp.transpose(volumes, (0, 3, 1, 2)).reshape(S * Zp, Xp, Yp), X, Y)
    vol_co = _pad_aligned(
        jnp.transpose(volumes, (0, 2, 1, 3)).reshape(S * Yp, Xp, Zp), X, Z)
    return (vol_sag, vol_ax, vol_co), (Zp, Yp, Xp)


@partial(jax.jit, static_argnames=("interpret", "plane_strides"))
def gather_triplanar_pallas(vol_sag: jnp.ndarray, vol_ax: jnp.ndarray,
                            vol_co: jnp.ndarray, centers: jnp.ndarray,
                            interpret: bool = False,
                            plane_strides: Tuple[int, int, int] = (0, 0, 0)):
    """Gather (axial, coronal, sagittal) patches with the DMA kernel.

    centers: (N, 3) int32 in original volume space (single volume), or
    (N, 4) (subject, x, y, z) with ``plane_strides`` from
    make_view_volumes_subjects (multi-subject training stack). N must be a
    multiple of BLOCK. Same semantics as ops.patches.gather_triplanar /
    engine.train.gather_triplanar_subjects.
    """
    n = centers.shape[0]
    assert n % BLOCK == 0, "pad centers to a BLOCK multiple"
    if centers.shape[1] == 3:
        centers = jnp.concatenate(
            [jnp.zeros((n, 1), centers.dtype), centers], axis=1)
    grid = (n // BLOCK,)

    out_shape = jax.ShapeDtypeStruct((n, PATCH, PATCH), vol_sag.dtype)
    block = pl.BlockSpec((BLOCK, PATCH, PATCH), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(block, block, block),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, 3, SUB, LANE), vol_sag.dtype),
            pltpu.SemaphoreType.DMA((BLOCK, 3)),
        ],
    )

    return pl.pallas_call(
        partial(_gather_kernel, plane_strides=plane_strides),
        grid_spec=grid_spec,
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(centers.reshape(-1), vol_ax, vol_co, vol_sag)
