"""FCN (à-trous) evaluator parity: dense path must equal the patch path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subcort_tpu.models import init_params, load_theano_checkpoint, predict_proba
from subcort_tpu.models.fcn import dense_branch_features, fcn_forward_bbox
from subcort_tpu.models.triplanar import apply_branch
from subcort_tpu.ops import pad_volume
from subcort_tpu.ops.patches import gather_triplanar_np


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(3))


def test_dense_branch_matches_patch_branch(params, rng):
    """Every pixel of the dense feature map == the patch branch at that
    center (the core à-trous equivalence)."""
    H, W = 11, 9
    slab = rng.standard_normal((1, H + 31, W + 31, 1)).astype(np.float32)
    dense = np.asarray(dense_branch_features(params["axial"], jnp.asarray(slab)))
    assert dense.shape == (1, H, W, 180)

    # patch path: for center (i, j) the patch is slab[i:i+32, j:j+32]
    patches = np.stack([slab[0, i:i + 32, j:j + 32, 0]
                        for i in range(H) for j in range(W)])
    feats = np.asarray(apply_branch(params["axial"], jnp.asarray(patches[..., None])))
    np.testing.assert_allclose(dense[0].reshape(H * W, 180), feats,
                               atol=2e-4, rtol=1e-3)


def test_fcn_bbox_matches_patch_path(params, rng):
    vol = rng.standard_normal((30, 34, 28)).astype(np.float32)
    x0, y0, z0 = 4, 6, 3
    bx, by, bz = 7, 6, 8
    atlas = rng.random((bx * by * bz, 15), dtype=np.float32)

    padded = pad_volume(jnp.asarray(vol))
    labels, probs = fcn_forward_bbox(
        params, padded, jnp.asarray([x0, y0, z0], jnp.int32), (bx, by, bz),
        jnp.asarray(atlas), want_probs=True, head_chunk=64)
    labels, probs = np.asarray(labels), np.asarray(probs)

    centers = np.array([[x0 + i, y0 + j, z0 + k]
                        for i in range(bx) for j in range(by) for k in range(bz)],
                       dtype=np.int32)
    ax, co, sa = gather_triplanar_np(vol, centers)
    want = np.asarray(predict_proba(params, {
        "axial": ax, "coronal": co, "sagittal": sa, "atlas": atlas}))

    np.testing.assert_allclose(probs, want, atol=2e-4, rtol=1e-3)
    agreement = (labels.reshape(-1) == want.argmax(1)).mean()
    assert agreement == 1.0


def test_fcn_raw_int16_slab_matches_host_normalized(params, rng):
    """Narrow-integer scans ship the slab RAW with device-side
    normalization (half the wire bytes); results must be identical to the
    host-normalized float path on the same voxel values."""
    from subcort_tpu.engine import segment_volume
    from subcort_tpu.engine.infer import _fcn_slab_inputs
    from subcort_tpu.models.triplanar import DEFAULT_SPEC
    from subcort_tpu.ops import normalize_stats

    image16 = np.zeros((40, 44, 40), np.int16)
    image16[4:-4, 4:-4, 4:-4] = (rng.random((32, 36, 32)) * 800 + 100).astype(np.int16)
    image32 = image16.astype(np.float32)
    atlas = rng.random((40, 44, 40, 15)).astype(np.float32)
    centers = np.unique(np.stack([rng.integers(2, s - 2, 400)
                                  for s in image16.shape], 1).astype(np.int32),
                        axis=0)

    # the int16 input actually takes the raw-wire path
    slab, _, _, _, norm = _fcn_slab_inputs(
        image16, normalize_stats(image16), atlas, np.zeros(3, np.int32),
        (40, 44, 40), image16.shape, DEFAULT_SPEC, np.float32, centers)
    assert norm is not None and slab.dtype == np.int16

    lv16, pv16 = segment_volume(params, image16, atlas, centers,
                                want_probs=True, engine="fcn",
                                probs_dtype=np.float32)
    lv32, pv32 = segment_volume(params, image32, atlas, centers,
                                want_probs=True, engine="fcn",
                                probs_dtype=np.float32)
    np.testing.assert_array_equal(lv16, lv32)
    np.testing.assert_allclose(pv16, pv32, atol=1e-6)

    # the patch engine's raw-wire path (device pad+normalize) likewise
    lp16, _ = segment_volume(params, image16, atlas, centers,
                             engine="patch", chunk=64)
    lp32, _ = segment_volume(params, image32, atlas, centers,
                             engine="patch", chunk=64)
    np.testing.assert_array_equal(lp16, lp32)

    # bfloat16 compute: device normalization must still happen in f32
    # (host-path-exact) before the cast, so int16 and f32 inputs remain
    # bit-identical to each other under bf16 too
    lb16, _ = segment_volume(params, image16, atlas, centers, engine="fcn",
                             compute_dtype="bfloat16")
    lb32, _ = segment_volume(params, image32, atlas, centers, engine="fcn",
                             compute_dtype="bfloat16")
    np.testing.assert_array_equal(lb16, lb32)


def test_fcn_sparse_gather_head_matches_patch_engine(params, rng):
    """Sparse candidates in a big bbox take the gathered-head path (the head
    MLP runs only at candidate voxels); labels and probs must match the
    patch engine exactly / to float tolerance."""
    from subcort_tpu.engine import segment_volume
    from subcort_tpu.engine.infer import _fcn_slab_inputs
    from subcort_tpu.models.triplanar import DEFAULT_SPEC

    image = (rng.random((40, 44, 40)) * 800 + 100).astype(np.float32)
    atlas = rng.random((40, 44, 40, 15)).astype(np.float32)
    centers = np.unique(np.stack([rng.integers(0, s, 300)
                                  for s in image.shape], 1).astype(np.int32),
                        axis=0)
    # confirm this configuration actually selects the sparse path
    from subcort_tpu.ops import normalize_stats
    _, _, cs, wire, _ = _fcn_slab_inputs(
        image, normalize_stats(image), atlas, np.zeros(3, np.int32),
        (40, 44, 40), image.shape, DEFAULT_SPEC, np.float32, centers)
    assert wire is not None and len(cs) == len(centers)

    lv_f, pv_f = segment_volume(params, image, atlas, centers,
                                want_probs=True, engine="fcn",
                                prior_dtype=np.float32,
                                probs_dtype=np.float32)
    lv_p, pv_p = segment_volume(params, image, atlas, centers,
                                want_probs=True, engine="patch", chunk=64,
                                probs_dtype=np.float32)
    np.testing.assert_array_equal(lv_f, lv_p)
    sel = centers[:, 0], centers[:, 1], centers[:, 2]
    np.testing.assert_allclose(pv_f[sel], pv_p[sel], atol=2e-4, rtol=1e-3)


def test_fcn_prior_wire_compaction_contract(params, rng):
    """Background-heavy candidate shells ship only the NON-background prior
    rows plus a packed candidate bitmask over the bbox and packed per-
    candidate bg flags; the device recovers the gather indices (nonzero =
    ascending lex order == cs order) and rebuilds the bg rows as the
    constant e14 pattern. Pins the host-side wire contract: reconstructing
    the full row set from the wire must equal the uncompacted quantized
    priors, row-aligned with cs."""
    from subcort_tpu.engine.infer import (_atlas_vectors_host,
                                          _fcn_slab_inputs, _quantize_priors,
                                          _round_up_pow2)
    from subcort_tpu.models.triplanar import DEFAULT_SPEC
    from subcort_tpu.ops import normalize_stats

    shape = (40, 40, 24)
    image = (rng.random(shape) * 800 + 100).astype(np.float32)
    atlas = np.zeros(shape + (15,), np.float32)
    atlas[..., 14] = 1.0                       # pure background...
    pri = rng.random((8, 8, 6, 15)).astype(np.float32)
    atlas[10:18, 10:18, 6:12] = pri / pri.sum(-1, keepdims=True)  # dense blob
    atlas[0:2] = 0.0                           # all-zero rows: bg after fix-up

    centers = np.unique(np.stack([rng.integers(0, s, 14000)
                                  for s in shape], 1).astype(np.int32), axis=0)
    m = len(centers)
    assert m > 8192                # needs a rung gap for compaction to open

    _, vecs, cs, wire, _ = _fcn_slab_inputs(
        image, normalize_stats(image), atlas, np.zeros(3, np.int32), shape,
        shape, DEFAULT_SPEC, np.uint16, centers)
    m_pad = _round_up_pow2(m)
    assert wire is not None and wire.m_pad == m_pad
    assert vecs.shape[0] < m_pad   # the wire actually shrank

    # candidate bitmask: nonzero (ascending) order must equal cs order
    cb = np.unpackbits(wire.cand_bits, bitorder="little")
    want_lin = ((cs[:, 0].astype(np.int64) * shape[1] + cs[:, 1])
                * shape[2] + cs[:, 2])
    np.testing.assert_array_equal(np.nonzero(cb)[0], want_lin)

    # bg flags + shipped non-bg rows reconstruct the full quantized set
    isb = np.unpackbits(wire.isbg_bits, bitorder="little").astype(bool)
    assert len(isb) == m_pad and isb[m:].all()   # padding rows are bg
    pat = np.zeros((1, 15), np.float32)
    pat[0, 14] = 1.0
    pat = _quantize_priors(pat, np.uint16)[0]
    nb = int((~isb).sum())
    assert nb <= vecs.shape[0]
    full = np.empty((m_pad, 15), np.uint16)
    full[isb] = pat
    full[~isb] = vecs[:nb]
    want = _quantize_priors(_atlas_vectors_host(atlas, cs), np.uint16)
    np.testing.assert_array_equal(full[:m], want)


def test_fcn_forward_slab_bg_reconstruction_bitexact(params, rng):
    """fcn_forward_slab with the packed bitmask wire (compacted non-bg prior
    rows + cand/isbg bitmasks) must produce outputs bit-identical to the
    explicit gather_idx path with the full uncompacted row set, for every
    wire dtype: recovered indices equal the sorted candidate list and the
    rebuilt bg rows are exactly the e_{C-1} pattern."""
    from subcort_tpu.models.fcn import RF, fcn_forward_slab

    bx, by, bz = 10, 8, 6
    n = bx * by * bz
    slab = (rng.random((bx + RF, by + RF, bz + RF)) * 4 - 2).astype(np.float32)
    m, m_pad = 200, 256            # 56 rows of all-bg padding
    lin = np.sort(rng.choice(n, size=m, replace=False)).astype(np.int32)
    # device recovery: nonzero(cand)[:m] == lin, fill rows gather voxel 0
    idx = np.concatenate([lin, np.zeros(m_pad - m, np.int32)])
    is_bg = rng.random(m) < 0.7
    is_bg[0] = False               # at least one shipped row
    isb = np.concatenate([is_bg, np.ones(m_pad - m, np.bool_)])
    cand = np.zeros(n, np.bool_)
    cand[lin] = True
    cand_bits = np.packbits(cand, bitorder="little")
    isbg_bits = np.packbits(isb, bitorder="little")
    dense = rng.random((m_pad, 15)).astype(np.float32)
    dense /= dense.sum(1, keepdims=True)
    for dtype, one in ((np.uint16, 65535), (np.uint8, 255),
                       (np.float32, 1.0), (np.float16, 1.0)):
        full = (np.round(dense * one).astype(dtype)
                if np.dtype(dtype).kind == "u" else dense.astype(dtype))
        full[isb] = 0
        full[isb, 14] = one        # bg rows = the e14 pattern
        lab_full, pr_full = fcn_forward_slab(
            params, jnp.asarray(slab), jnp.asarray(full), True,
            gather_idx=jnp.asarray(idx))
        lab_wire, pr_wire = fcn_forward_slab(
            params, jnp.asarray(slab), jnp.asarray(full[~isb]), True,
            cand_bits=jnp.asarray(cand_bits), isbg_bits=jnp.asarray(isbg_bits))
        np.testing.assert_array_equal(np.asarray(lab_full), np.asarray(lab_wire))
        np.testing.assert_array_equal(np.asarray(pr_full), np.asarray(pr_wire))


def test_fcn_compacted_wire_matches_patch_engine(params, rng):
    """End-to-end: a bg-heavy scan (compaction active, previous test's
    geometry) through segment_volume must stay label-identical to the patch
    engine and prob-close (uint16 prior wire is label-identical by design)."""
    from subcort_tpu.engine import segment_volume

    shape = (40, 40, 24)
    image = (rng.random(shape) * 800 + 100).astype(np.float32)
    atlas = np.zeros(shape + (15,), np.float32)
    atlas[..., 14] = 1.0
    pri = rng.random((8, 8, 6, 15)).astype(np.float32)
    atlas[10:18, 10:18, 6:12] = pri / pri.sum(-1, keepdims=True)
    centers = np.unique(np.stack([rng.integers(0, s, 14000)
                                  for s in shape], 1).astype(np.int32), axis=0)
    assert len(centers) > 8192
    lv_f, pv_f = segment_volume(params, image, atlas, centers,
                                want_probs=True, engine="fcn",
                                probs_dtype=np.float32)
    lv_p, pv_p = segment_volume(params, image, atlas, centers,
                                want_probs=True, engine="patch", chunk=2048,
                                probs_dtype=np.float32)
    np.testing.assert_array_equal(lv_f, lv_p)
    sel = centers[:, 0], centers[:, 1], centers[:, 2]
    np.testing.assert_allclose(pv_f[sel], pv_p[sel], atol=5e-4, rtol=1e-3)


def test_fcn_sparse_unsorted_duplicate_centers(params, rng):
    """The packed-bitmask sparse wire recovers candidate indices in
    ascending (lexicographic) order on device; caller-supplied center lists
    that are unsorted or contain duplicates must still scatter correctly
    (the host reorders/dedups cs to the device order). Pins the guard in
    _fcn_slab_inputs against silent misalignment."""
    from subcort_tpu.engine import segment_volume
    from subcort_tpu.engine.infer import _fcn_slab_inputs
    from subcort_tpu.models.triplanar import DEFAULT_SPEC
    from subcort_tpu.ops import normalize_stats

    image = (rng.random((40, 44, 40)) * 800 + 100).astype(np.float32)
    atlas = rng.random((40, 44, 40, 15)).astype(np.float32)
    uniq = np.unique(np.stack([rng.integers(0, s, 300)
                               for s in image.shape], 1).astype(np.int32),
                     axis=0)
    scrambled = uniq[rng.permutation(len(uniq))]
    dup = np.concatenate([scrambled, scrambled[:37]])   # dups too

    # the scrambled list takes the sparse path and comes back sorted+unique
    _, _, cs, wire, _ = _fcn_slab_inputs(
        image, normalize_stats(image), atlas, np.zeros(3, np.int32),
        (40, 44, 40), image.shape, DEFAULT_SPEC, np.float32, dup)
    assert wire is not None
    np.testing.assert_array_equal(cs, uniq)

    lv_ref, _ = segment_volume(params, image, atlas, uniq, engine="fcn")
    lv_scr, _ = segment_volume(params, image, atlas, dup, engine="fcn")
    np.testing.assert_array_equal(lv_scr, lv_ref)


def test_uint8_probs_readback(params, rng):
    """probs_dtype='uint8' quantizes the readback to 1/255 steps on device;
    labels must be unchanged and dequantized probs within half a step."""
    from subcort_tpu.engine import segment_volume

    image = (rng.random((30, 34, 28)) * 800 + 100).astype(np.float32)
    atlas = rng.random((30, 34, 28, 15)).astype(np.float32)
    centers = np.unique(np.stack([rng.integers(0, s, 400)
                                  for s in image.shape], 1).astype(np.int32),
                        axis=0)
    sel = centers[:, 0], centers[:, 1], centers[:, 2]
    for engine in ("fcn", "patch"):
        lv32, pv32 = segment_volume(params, image, atlas, centers,
                                    want_probs=True, engine=engine,
                                    probs_dtype=np.float32)
        lv8, pv8 = segment_volume(params, image, atlas, centers,
                                  want_probs=True, engine=engine,
                                  probs_dtype=np.uint8)
        np.testing.assert_array_equal(lv8, lv32)
        assert np.abs(pv8[sel] - pv32[sel]).max() <= 0.5 / 255 + 1e-6


def test_fcn_with_reference_checkpoint(reference_ckpt_path, rng):
    """Same check against the real miccai2012_v1 weights (border included)."""
    params = load_theano_checkpoint(reference_ckpt_path)
    vol = (rng.random((26, 24, 25)) * 4 - 2).astype(np.float32)
    x0, y0, z0 = 0, 0, 0          # bbox touching the zero-padded border
    bx, by, bz = 10, 8, 6
    atlas = rng.random((bx * by * bz, 15), dtype=np.float32)

    padded = pad_volume(jnp.asarray(vol))
    labels, probs = fcn_forward_bbox(
        params, padded, jnp.asarray([x0, y0, z0], jnp.int32), (bx, by, bz),
        jnp.asarray(atlas), want_probs=True, head_chunk=128)

    centers = np.array([[x0 + i, y0 + j, z0 + k]
                        for i in range(bx) for j in range(by) for k in range(bz)],
                       dtype=np.int32)
    ax, co, sa = gather_triplanar_np(vol, centers)
    want = np.asarray(predict_proba(params, {
        "axial": ax, "coronal": co, "sagittal": sa, "atlas": atlas}))
    np.testing.assert_allclose(np.asarray(probs), want, atol=2e-4, rtol=1e-3)
    assert (np.asarray(labels).reshape(-1) == want.argmax(1)).mean() == 1.0


def test_fcn_slab_inputs_shard_overhang_past_volume_end(params, rng):
    """SPMD shard origins on large meshes can land more than patch_half
    voxels past the volume end (fcn_run_spmd splits the bbox largest axis
    into ndev equal steps without clamping). The slab cut must degrade to
    an empty copy + all-zero slab there — a negative dst start used to wrap
    around numpy's negative-index semantics into a non-empty destination
    slice and raise a broadcast ValueError."""
    from subcort_tpu.engine.infer import _fcn_slab_inputs
    from subcort_tpu.models.triplanar import DEFAULT_SPEC
    from subcort_tpu.ops import normalize_stats

    image = (rng.random((40, 44, 40)) * 800 + 100).astype(np.float32)
    atlas = rng.random((40, 44, 40, 15)).astype(np.float32)
    centers = np.unique(np.stack([rng.integers(0, s, 50)
                                  for s in image.shape], 1).astype(np.int32),
                        axis=0)
    stats = normalize_stats(image)

    # origin 30 voxels past the volume end on axis 0 (> patch_half = 16)
    for lo in (np.array([70, 0, 0], np.int32),
               np.array([70, 60, 55], np.int32),   # past the end everywhere
               np.array([39, 0, 0], np.int32)):    # partial overlap control
        slab, vecs, cs, wire, norm = _fcn_slab_inputs(
            image, stats, atlas, lo, (16, 44, 40), image.shape,
            DEFAULT_SPEC, np.float32, centers, force_sparse=True)
        inside = np.all((centers >= lo) &
                        (centers < lo + np.array([16, 44, 40])), axis=1)
        if not inside.any():
            assert slab is None and len(cs) == 0
        else:
            assert len(cs) == int(inside.sum())

    # int16 raw-wire flavor: the same overhang must also keep the device
    # normalization bounds (dst start/stop) valid slice indices
    image16 = image.astype(np.int16)
    slab, _, cs, _, norm = _fcn_slab_inputs(
        image16, normalize_stats(image16), atlas,
        np.array([70, 0, 0], np.int32), (16, 44, 40), image16.shape,
        DEFAULT_SPEC, np.float32, None)
    assert norm is not None
    los, his = np.asarray(norm[1]), np.asarray(norm[2])
    assert (los >= 0).all() and (his >= los).all()
    assert not np.asarray(slab).any()  # nothing of the volume lands here
