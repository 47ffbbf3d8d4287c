"""Slow numpy oracle implementing the reference's exact Lasagne semantics.

Consumes the *raw* checkpoint pickle dict (layer name -> param list) and runs
the deterministic (inference-mode) forward pass with Lasagne's conventions:
NCHW layout, flip_filters=True true convolution, BN with stored inv_std,
PReLU, C-order flatten. This is the functional parity oracle for the JAX
model (SURVEY.md §4: golden-parity tests) — intentionally unoptimized and
written only from the layer semantics (cnn_cort/nets.py:159-231), not from
any Theano code.
"""

from __future__ import annotations

import pickle

import numpy as np

VIEW_KEYS = {"axial": "axial", "coronal": "coronal", "sagittal": "saggital"}


def load_raw(path: str) -> dict:
    with open(path, "rb") as fh:
        return pickle.load(fh, encoding="latin1")


def conv2d_true(x: np.ndarray, w_oihw: np.ndarray) -> np.ndarray:
    """Valid true convolution, NCHW x (O,I,3,3). Loop over taps (slow, clear)."""
    wf = w_oihw[:, :, ::-1, ::-1]  # flipped -> use as cross-correlation taps
    n, c, h, wd = x.shape
    o = w_oihw.shape[0]
    kh, kw = w_oihw.shape[2], w_oihw.shape[3]
    out = np.zeros((n, o, h - kh + 1, wd - kw + 1), dtype=np.float64)
    for di in range(kh):
        for dj in range(kw):
            out += np.einsum("nchw,oc->nohw",
                             x[:, :, di:h - kh + 1 + di, dj:wd - kw + 1 + dj],
                             wf[:, :, di, dj])
    return out


def bn(x: np.ndarray, params) -> np.ndarray:
    beta, gamma, mean, inv_std = [np.asarray(p, np.float64) for p in params]
    return (x - mean[:, None, None]) * (inv_std * gamma)[:, None, None] + beta[:, None, None]


def prelu(x: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    alpha = np.asarray(alpha, np.float64)
    if x.ndim == 4:
        alpha = alpha[:, None, None]
    return np.maximum(x, 0) + alpha * np.minimum(x, 0)


def maxpool2(x: np.ndarray) -> np.ndarray:
    n, c, h, w = x.shape
    x = x[:, :, : h // 2 * 2, : w // 2 * 2]
    return x.reshape(n, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))


def branch(raw: dict, view: str, x_nchw: np.ndarray) -> np.ndarray:
    r = VIEW_KEYS[view]
    x = np.asarray(x_nchw, np.float64)
    for i in range(1, 6):
        (w,) = raw[f"{r}_ch_conv{i}"]
        x = conv2d_true(x, np.asarray(w, np.float64))
        x = bn(x, raw[f"{r}_ch_conv{i}_bn"])
        x = prelu(x, raw[f"{r}_ch_prelu{i}"][0])
        if i in (2, 4):
            x = maxpool2(x)
    # dropout = identity in deterministic mode
    flat = x.reshape(x.shape[0], -1)  # C-order over (c, h, w)
    w, b = raw[f"{r}_d1"]
    x = flat @ np.asarray(w, np.float64) + np.asarray(b, np.float64)
    return prelu(x, raw[f"{r}_prelu_d1"][0])


def forward(raw: dict, axial, coronal, sagittal, atlas) -> np.ndarray:
    """Deterministic forward -> softmax probabilities (N, 15)."""
    fa = branch(raw, "axial", axial)
    fc = branch(raw, "coronal", coronal)
    fs = branch(raw, "sagittal", sagittal)
    x = np.concatenate([fa, fc, fs], axis=1)
    w, b = raw["FC1"]
    x = prelu(x @ np.asarray(w, np.float64) + np.asarray(b, np.float64),
              raw["prelu_f1"][0])
    x = np.concatenate([x, np.asarray(atlas, np.float64)], axis=1)
    w, b = raw["fc_2"]
    x = prelu(x @ np.asarray(w, np.float64) + np.asarray(b, np.float64),
              raw["prelu_f2"][0])
    w, b = raw["out_layer"]
    logits = x @ np.asarray(w, np.float64) + np.asarray(b, np.float64)
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)
