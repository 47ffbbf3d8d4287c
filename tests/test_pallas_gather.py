"""Pallas DMA gather kernel: parity with the reference gather semantics
(interpreter mode on the CPU test mesh; the real kernel runs on TPU)."""

import numpy as np
import jax.numpy as jnp

from subcort_tpu.ops import pad_volume
from subcort_tpu.ops.pallas_gather import (BLOCK, gather_triplanar_pallas,
                                           make_view_volumes)
from subcort_tpu.ops.patches import gather_triplanar_np


def test_pallas_gather_matches_reference(rng):
    vol = rng.standard_normal((40, 36, 28)).astype(np.float32)
    n = 8 * BLOCK
    centers = np.stack([rng.integers(0, s, n) for s in vol.shape],
                       axis=1).astype(np.int32)
    padded = pad_volume(jnp.asarray(vol))
    vs, va, vc = make_view_volumes(padded)
    ax, co, sa = gather_triplanar_pallas(vs, va, vc, jnp.asarray(centers),
                                         interpret=True)
    wax, wco, wsa = gather_triplanar_np(vol, centers)
    np.testing.assert_array_equal(np.asarray(ax), wax)
    np.testing.assert_array_equal(np.asarray(co), wco)
    np.testing.assert_array_equal(np.asarray(sa), wsa)


def test_pallas_gather_border_centers(rng):
    vol = rng.standard_normal((34, 33, 35)).astype(np.float32)
    corners = [[0, 0, 0], [33, 32, 34], [0, 32, 17], [33, 0, 0]]
    centers = np.asarray(corners * (BLOCK // 4) * 2, np.int32)
    padded = pad_volume(jnp.asarray(vol))
    vs, va, vc = make_view_volumes(padded)
    ax, co, sa = gather_triplanar_pallas(vs, va, vc, jnp.asarray(centers),
                                         interpret=True)
    wax, wco, wsa = gather_triplanar_np(vol, centers)
    np.testing.assert_array_equal(np.asarray(ax), wax)
    np.testing.assert_array_equal(np.asarray(co), wco)
    np.testing.assert_array_equal(np.asarray(sa), wsa)


def test_pallas_gather_shard_map_mesh_parity(rng):
    """Multi-device training gather (VERDICT r2 weak-3): the DMA kernel
    under jax.shard_map over the 8-device CPU mesh must be bit-identical to
    the XLA gather — each device gathers its local batch shard from the
    replicated view volumes."""
    import jax
    from subcort_tpu.engine.train import (_gather_views,
                                          gather_triplanar_subjects)
    from subcort_tpu.models.triplanar import DEFAULT_SPEC
    from subcort_tpu.ops.pallas_gather import make_view_volumes_subjects
    from subcort_tpu.parallel import make_mesh, replicated, shard_batch

    mesh = make_mesh(8)
    S = 2
    vols = rng.standard_normal((S, 24 + 32, 26 + 32, 22 + 32)).astype(np.float32)
    n = 8 * BLOCK  # BLOCK per device
    centers = np.stack([rng.integers(0, S, n),
                        rng.integers(0, 24, n),
                        rng.integers(0, 26, n),
                        rng.integers(0, 22, n)], 1).astype(np.int32)
    views, strides = make_view_volumes_subjects(jnp.asarray(vols))
    views = jax.device_put(views, replicated(mesh))
    centers_s = shard_batch({"centers": centers}, mesh)["centers"]

    fn = jax.jit(lambda v, c: _gather_views(
        v, c, DEFAULT_SPEC, pallas_strides=strides, mesh=mesh,
        pallas_interpret=True))
    ax, co, sa = fn(views, centers_s)
    wax, wco, wsa = gather_triplanar_subjects(jnp.asarray(vols),
                                              jnp.asarray(centers))
    np.testing.assert_array_equal(np.asarray(ax), np.asarray(wax))
    np.testing.assert_array_equal(np.asarray(co), np.asarray(wco))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(wsa))


def test_pallas_gather_multi_subject_matches_train_gather(rng):
    """Subject-axis mode (training): stride-4 centers against the trainer's
    XLA gather over a stacked pre-padded cohort."""
    from subcort_tpu.engine.train import gather_triplanar_subjects
    from subcort_tpu.ops.pallas_gather import make_view_volumes_subjects

    S = 3
    vols = rng.standard_normal((S, 40 + 32, 36 + 32, 28 + 32)).astype(np.float32)
    n = 4 * BLOCK
    centers = np.stack([rng.integers(0, S, n),
                        rng.integers(0, 40, n),
                        rng.integers(0, 36, n),
                        rng.integers(0, 28, n)], 1).astype(np.int32)
    (vs, va, vc), strides = make_view_volumes_subjects(jnp.asarray(vols))
    ax, co, sa = gather_triplanar_pallas(vs, va, vc, jnp.asarray(centers),
                                         interpret=True,
                                         plane_strides=strides)
    wax, wco, wsa = gather_triplanar_subjects(jnp.asarray(vols),
                                              jnp.asarray(centers))
    np.testing.assert_array_equal(np.asarray(ax), np.asarray(wax))
    np.testing.assert_array_equal(np.asarray(co), np.asarray(wco))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(wsa))
