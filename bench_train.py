#!/usr/bin/env python
"""Training benchmark: one epoch at the reference's production scale.

Reproduces the reference's effective training configuration (SURVEY.md §6:
~150k balanced boundary samples, effective batch 128 — nolearn's default,
§2.3-5 — Adam 1e-3, 25% holdout) on synthetic data shaped like the real
workload (HBM-resident subject volumes, device-side tri-planar gather), and
reports seconds/epoch against the reference's recorded history
(~330.6 s/epoch mean on its unspecified CUDA GPU,
nets/miccai2012_v1/miccai2012_v1_history.pkl 'dur' key).

Drives the actual product Trainer (epoch protocol, validation, checkpoint
writes) — not a stripped loop — so the number tracks what users get.

Prints ONE JSON line:
  {"metric": "train_epoch_wallclock", "value": N, "unit": "seconds",
   "vs_baseline": N, ...}

Flags: --samples N  --epochs N  --batch N  --profile DIR  (defaults match
the reference scale; smaller values for smoke tests).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from subcort_tpu.utils import enable_compilation_cache, profile_trace  # noqa: E402

enable_compilation_cache()

REFERENCE_EPOCH_SECONDS = 330.6  # mean 'dur' over the shipped 62-epoch history


def make_index(n_samples: int, n_subjects: int = 4, shape=(181, 217, 181)):
    """Synthetic TrainingIndex at real-workload geometry: MNI-sized subject
    volumes resident in HBM, balanced center/label/prior arrays."""
    from subcort_tpu.engine.data import TrainingIndex
    from subcort_tpu.ops import HALF

    rng = np.random.default_rng(0)
    X, Y, Z = shape
    volumes = rng.standard_normal(
        (n_subjects, X + 2 * HALF, Y + 2 * HALF, Z + 2 * HALF)).astype(np.float32)
    centers = np.stack([
        rng.integers(0, n_subjects, n_samples),
        rng.integers(0, X, n_samples),
        rng.integers(0, Y, n_samples),
        rng.integers(0, Z, n_samples)], axis=1).astype(np.int32)
    labels = rng.integers(0, 15, n_samples).astype(np.int32)
    atlas = rng.random((n_samples, 15)).astype(np.float32)
    return TrainingIndex(volumes=volumes, centers=centers, labels=labels,
                         atlas=atlas,
                         subject_names=[f"s{i}" for i in range(n_subjects)])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=150_000)
    ap.add_argument("--epochs", type=int, default=2,
                    help="epoch 1 includes compile; the reported number is "
                         "the min of later epochs")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps-per-call", type=int, default=None,
                    help="K batches per device dispatch (default: Trainer's)")
    ap.add_argument("--dtype", default="float32",
                    help="training compute dtype: float32 | bfloat16")
    ap.add_argument("--profile", default=None)
    args = ap.parse_args(argv)

    import jax  # noqa: E402  (after cache setup)

    from subcort_tpu.config import Options
    from subcort_tpu.engine.train import Trainer

    index = make_index(args.samples)
    with tempfile.TemporaryDirectory() as tmp:
        opts = Options(experiment="bench_train", max_epochs=args.epochs,
                       patience=args.epochs + 1, batch_size=args.batch,
                       net_verbose=0, load_weights=False, debug=False,
                       train_dtype=args.dtype)
        tkw = {}
        if args.steps_per_call:
            tkw["steps_per_call"] = args.steps_per_call
        trainer = Trainer(opts, weights_path=tmp, **tkw)
        t0 = time.time()
        with profile_trace(args.profile):
            history = trainer.fit(index)
        total = time.time() - t0

    durs = [h["dur"] for h in history]
    # first epoch pays the (cached-across-runs) compile; steady state is
    # what the 62-epoch reference history measures
    steady = min(durs[1:]) if len(durs) > 1 else durs[0]
    print(json.dumps({
        "metric": "train_epoch_wallclock",
        "value": round(steady, 3),
        "unit": "seconds",
        "vs_baseline": round(REFERENCE_EPOCH_SECONDS / steady, 3),
        "samples_per_sec_per_chip": int(args.samples / steady),
        "samples": args.samples,
        "batch_size": args.batch,
        "epochs": len(durs),
        "first_epoch_seconds": round(durs[0], 3),
        "total_seconds": round(total, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
