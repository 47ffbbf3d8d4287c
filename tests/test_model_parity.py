"""Golden-parity tests: JAX model vs the shipped Theano checkpoint.

The shipped ``miccai2012_v1.pkl`` is the exact functional oracle
(SURVEY.md §4): we run fixed synthetic batches through (a) a slow numpy
implementation of the Lasagne graph semantics and (b) the imported JAX
model, and require matching probabilities and 100% argmax agreement.
"""

import numpy as np
import pytest

import lasagne_oracle as oracle
from subcort_tpu.models import (apply, init_params, load_theano_checkpoint,
                                num_params, predict, predict_proba)
from subcort_tpu.models.importer import save_theano_checkpoint


def _batch(rng, n=64):
    axial = rng.standard_normal((n, 32, 32), dtype=np.float32)
    coronal = rng.standard_normal((n, 32, 32), dtype=np.float32)
    sagittal = rng.standard_normal((n, 32, 32), dtype=np.float32)
    atlas = rng.random((n, 15), dtype=np.float32)
    atlas /= atlas.sum(axis=1, keepdims=True)
    return axial, coronal, sagittal, atlas


def test_param_count(reference_ckpt_path):
    params = load_theano_checkpoint(reference_ckpt_path)
    assert num_params(params) == 883455  # BASELINE.md model size


def test_forward_parity_vs_oracle(reference_ckpt_path, rng):
    raw = oracle.load_raw(reference_ckpt_path)
    params = load_theano_checkpoint(reference_ckpt_path)
    axial, coronal, sagittal, atlas = _batch(rng)

    want = oracle.forward(raw, axial[:, None], coronal[:, None],
                          sagittal[:, None], atlas)
    got = np.asarray(predict_proba(
        params, {"axial": axial, "coronal": coronal,
                 "sagittal": sagittal, "atlas": atlas}))

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    assert (got.argmax(1) == want.argmax(1)).mean() == 1.0


def test_reference_input_names_accepted(reference_ckpt_path, rng):
    """net.predict({'in1'..'in4'}) calling convention (base.py:425-428)."""
    params = load_theano_checkpoint(reference_ckpt_path)
    axial, coronal, sagittal, atlas = _batch(rng, n=8)
    # reference layout: (N, 1, ps, ps)
    ref_batch = {"in1": axial[:, None], "in2": coronal[:, None],
                 "in3": sagittal[:, None], "in4": atlas}
    new_batch = {"axial": axial, "coronal": coronal,
                 "sagittal": sagittal, "atlas": atlas}
    np.testing.assert_allclose(np.asarray(predict_proba(params, ref_batch)),
                               np.asarray(predict_proba(params, new_batch)),
                               atol=1e-6)
    assert predict(params, ref_batch).shape == (8,)


def test_checkpoint_roundtrip(reference_ckpt_path, tmp_path, rng):
    """import -> export -> import must be exact, and the exported file must
    carry the reference's layer-name contract."""
    params = load_theano_checkpoint(reference_ckpt_path)
    out = tmp_path / "roundtrip.pkl"
    save_theano_checkpoint(params, str(out))
    params2 = load_theano_checkpoint(str(out))

    import jax
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    raw = oracle.load_raw(str(out))
    for k in ("axial_ch_conv1", "saggital_d1", "FC1", "fc_2", "out_layer",
              "axial_max_pool_1", "f1_drop"):
        assert k in raw


def test_fresh_init_shapes_match_checkpoint(reference_ckpt_path):
    import jax

    fresh = init_params(jax.random.key(0))
    loaded = load_theano_checkpoint(reference_ckpt_path)
    fs = jax.tree_util.tree_map(lambda x: x.shape, fresh)
    ls = jax.tree_util.tree_map(lambda x: x.shape, loaded)
    assert fs == ls
    assert num_params(fresh) == 883455


def test_train_mode_runs_and_differs(reference_ckpt_path, rng):
    import jax

    params = load_theano_checkpoint(reference_ckpt_path)
    axial, coronal, sagittal, atlas = _batch(rng, n=16)
    batch = {"axial": axial, "coronal": coronal, "sagittal": sagittal,
             "atlas": atlas}
    p_train = apply(params, batch, train=True, rng=jax.random.key(0))
    p_eval = apply(params, batch, train=False)
    assert p_train.shape == p_eval.shape == (16, 15)
    assert np.isfinite(np.asarray(p_train)).all()
    # dropout + batch-stats BN must change the output
    assert not np.allclose(np.asarray(p_train), np.asarray(p_eval))
