#!/usr/bin/env python
"""Training-quality gate: fit to early-stop on a synthetic cohort, then
segment held-out subjects and report cohort mean Dice + validation accuracy.

The reference's only quantitative quality record is its shipped training
history — valid_accuracy 0.94998 at the best epoch
(/root/reference/nets/miccai2012_v1/miccai2012_v1_history.pkl) — plus the
paper's Dice claims (README.md:195). This gate is the rebuild's analogue:
it proves the *training stack* (balanced boundary sampling, device gather,
Adam, BN EMA, early stopping, checkpoint round-trip) converges to a model
that actually segments, not merely that loss decreases. Real MNI data is
absent from this environment (.MISSING_LARGE_BLOBS), so the cohort is the
synthetic phantom family (registration/atlas.py): subjects = shifted /
intensity-jittered / noised templates whose priors carry an extra voxel of
registration-error jitter, so the model must fuse intensity + prior rather
than copy channel 14.

Prints ONE JSON line:
  {"metric": "train_quality_cohort_dice", "value": N, "unit": "dice",
   "valid_accuracy": N, "passed": bool, ...}

Floors (asserted, reported in the JSON): cohort mean Dice >= 0.97,
best-epoch valid_accuracy >= 0.995 — set just below the measured values
(TRAINQUAL_r04: 0.9917 / 0.99949) so a real regression trips the gate; the
old 0.85/0.90 floors would have passed a 10-point drift silently (VERDICT
r4 weak-2).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from subcort_tpu.utils import enable_compilation_cache  # noqa: E402

DICE_FLOOR = 0.97
VALID_ACC_FLOOR = 0.995
REFERENCE_VALID_ACC = 0.94998  # shipped history, best epoch 42


def evaluate_holdout(params, sub_dir: str, options) -> float:
    """Segment one held-out subject through the product inference path and
    return its mean structure Dice (classes 1..14; GT ring class 15 counts
    as background, as in the reference's evaluation protocol)."""
    from subcort_tpu.engine.infer import candidate_centers, segment_volume
    from subcort_tpu.engine.metrics import mean_dice
    from subcort_tpu.io import load_nii

    image = np.asarray(load_nii(os.path.join(sub_dir, "T1.nii.gz")).data)
    gt = np.asarray(load_nii(os.path.join(sub_dir, "gt_15_classes.nii.gz")).data)
    gt = np.where(gt == 15, 0, gt).astype(np.uint8)
    atlas = np.asarray(load_nii(os.path.join(
        sub_dir, "tmp", "MNI_sub_probabilities.nii.gz")).data, np.float32)
    mask = np.asarray(load_nii(os.path.join(
        sub_dir, "tmp", "MNI_subcortical_mask.nii.gz")).data)
    centers = candidate_centers(image, options, mask)
    label_vol, _ = segment_volume(params, image, atlas, centers)
    return mean_dice(label_vol, gt)


def run(n_train: int = 6, n_holdout: int = 2, shape=(96, 108, 90),
        max_epochs: int = 50, patience: int = 10, batch_size: int = 128,
        seed: int = 0, root: str = None):
    import jax

    enable_compilation_cache()

    from subcort_tpu.config import Options
    from subcort_tpu.engine.data import build_training_index, list_training_subjects
    from subcort_tpu.engine.train import Trainer
    from subcort_tpu.registration.atlas import make_synthetic_cohort

    tmp_ctx = tempfile.TemporaryDirectory() if root is None else None
    root = root or tmp_ctx.name
    cohort_dir = os.path.join(root, "cohort")
    make_synthetic_cohort(cohort_dir, n_subjects=n_train + n_holdout,
                          shape=shape, seed=seed)

    options = Options(experiment="trainqual", train_folder=cohort_dir,
                      max_epochs=max_epochs, patience=patience,
                      batch_size=batch_size, train_split=0.25,
                      net_verbose=1, load_weights=False, debug=False,
                      seed=seed)
    subjects = list_training_subjects(options)
    train_subjects = subjects[:n_train]
    holdout_subjects = subjects[n_train:]

    index = build_training_index(options, subjects=train_subjects)
    print(f"--> cohort: {n_train} train + {n_holdout} holdout, "
          f"{len(index)} samples, shape {shape}", flush=True)

    t0 = time.time()
    trainer = Trainer(options, weights_path=os.path.join(root, "nets"))
    history = trainer.fit(index)
    train_seconds = time.time() - t0

    best = min(history, key=lambda h: h["valid_loss"])

    # evaluate with the *best* checkpoint (SaveWeights(only_best) semantics):
    # reload it through the Theano-format round-trip the product uses
    from subcort_tpu.models.importer import load_theano_checkpoint
    params = jax.device_put(load_theano_checkpoint(trainer.weights_file))

    dices = {}
    for sub in holdout_subjects:
        d = evaluate_holdout(params, os.path.dirname(sub.t1_path), options)
        dices[sub.name] = round(float(d), 4)
    cohort_dice = float(np.mean(list(dices.values())))

    passed = (cohort_dice >= DICE_FLOOR
              and best["valid_accuracy"] >= VALID_ACC_FLOOR)
    result = {
        "metric": "train_quality_cohort_dice",
        "value": round(cohort_dice, 4),
        "unit": "dice",
        "vs_baseline": round(best["valid_accuracy"] / REFERENCE_VALID_ACC, 4),
        "valid_accuracy": round(best["valid_accuracy"], 5),
        "valid_loss": round(best["valid_loss"], 5),
        "best_epoch": best["epoch"],
        "epochs_run": len(history),
        "early_stopped": len(history) < max_epochs,
        "per_subject_dice": dices,
        "n_train_subjects": len(train_subjects),
        "n_samples": len(index),
        "train_seconds": round(train_seconds, 1),
        "dice_floor": DICE_FLOOR,
        "valid_acc_floor": VALID_ACC_FLOOR,
        "passed": passed,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)
    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    assert passed, (f"training-quality gate FAILED: cohort_dice={cohort_dice:.4f} "
                    f"(floor {DICE_FLOOR}), valid_accuracy="
                    f"{best['valid_accuracy']:.4f} (floor {VALID_ACC_FLOOR})")
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-subjects", type=int, default=6)
    ap.add_argument("--holdout-subjects", type=int, default=2)
    ap.add_argument("--shape", default="96x108x90")
    ap.add_argument("--max-epochs", type=int, default=50)
    ap.add_argument("--patience", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    shape = tuple(int(s) for s in args.shape.split("x"))
    run(n_train=args.train_subjects, n_holdout=args.holdout_subjects,
        shape=shape, max_epochs=args.max_epochs, patience=args.patience,
        batch_size=args.batch, seed=args.seed)


if __name__ == "__main__":
    main()
