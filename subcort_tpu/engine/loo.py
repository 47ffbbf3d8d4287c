"""Leave-one-out cross-validation driver (workload layer L5).

The reference's ``load_data`` exists *specifically* to amortize volume
loading across leave-one-out folds (cnn_cort/base.py:14-15: "All the data
is loaded in memory, so for LOO experiments data is loaded only once"),
but the reference ships no driver composing the folds — the user was
expected to script the loop. Here it is a first-class workflow
(``subcort_tpu loo``): the cohort is loaded into ONE HBM-ready
:class:`TrainingIndex` (each volume read and normalized exactly once),
per-fold training sets are O(1) row-mask views sharing that volume stack,
and each fold trains to early stop then segments its held-out subject
through the product inference path and scores Dice against the GT mask.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

from subcort_tpu.config import Options
from subcort_tpu.engine.data import (TrainingIndex, build_training_index,
                                     list_training_subjects)


def fold_view(index: TrainingIndex, held_out: str) -> TrainingIndex:
    """The fold's training set: every sample whose subject is not
    ``held_out``, sharing the full index's volume stack (no copy of the
    volumes — the reference's load-once economics, base.py:14-15)."""
    try:
        si = index.subject_names.index(held_out)
    except ValueError:
        raise ValueError(f"no subject named {held_out!r} in the index") from None
    keep = index.centers[:, 0] != si
    if not keep.any():
        raise ValueError(f"excluding {held_out!r} empties the training set")
    return dataclasses.replace(
        index, centers=index.centers[keep], labels=index.labels[keep],
        atlas=index.atlas[keep])


def evaluate_fold(params, sub_dir: str, options: Options) -> float:
    """Segment one held-out subject through the product inference path and
    return its mean structure Dice (classes 1..14; the GT boundary ring,
    class 15, counts as background — the reference's evaluation protocol)."""
    from subcort_tpu.engine.infer import candidate_centers, segment_volume
    from subcort_tpu.engine.metrics import mean_dice
    from subcort_tpu.io import load_nii

    image = np.asarray(load_nii(os.path.join(
        sub_dir, options["t1_name"])).data)
    gt = np.asarray(load_nii(os.path.join(
        sub_dir, options["roi_name"])).data)
    gt = np.where(gt == 15, 0, gt).astype(np.uint8)
    atlas = np.asarray(load_nii(os.path.join(
        sub_dir, "tmp", "MNI_sub_probabilities.nii.gz")).data, np.float32)
    mask_p = os.path.join(sub_dir, "tmp", "MNI_subcortical_mask.nii.gz")
    mask = np.asarray(load_nii(mask_p).data) if os.path.exists(mask_p) else None
    centers = candidate_centers(image, options, mask)
    label_vol, _ = segment_volume(
        params, image, atlas, centers,
        engine="auto" if options.bool("use_fcn") else "patch",
        prior_dtype=np.dtype(options["prior_dtype"]),
        compute_dtype=options["compute_dtype"])
    return mean_dice(label_vol, gt)


def run_loo(options: Options, weights_path: str = "nets",
            folds: Optional[Sequence[str]] = None, augment: bool = False,
            sample_cap: Optional[int] = None, spec=None) -> dict:
    """Run the leave-one-out protocol over the training folder.

    For each fold (default: every subject), trains a fresh model on the
    cohort minus the held-out subject — under
    ``<weights_path>/<experiment>_fold_<name>/`` with the Trainer's full
    artifact set — then segments the held-out scan with the fold's *best*
    checkpoint and scores Dice. Volumes are loaded once for all folds.

    ``sample_cap`` (optional) takes a seeded uniform subsample of each
    fold's training rows (order-independent, so it is safe with
    ``randomize_train=False`` too) — CI-budget knob, not a product setting.

    Returns {"folds": {name: {dice, valid_accuracy, valid_loss, epochs}},
    "mean_dice": float}.
    """
    import jax

    from subcort_tpu.engine.train import Trainer
    from subcort_tpu.models.importer import load_theano_checkpoint
    from subcort_tpu.models.triplanar import DEFAULT_SPEC

    spec = spec or DEFAULT_SPEC
    subjects = list_training_subjects(options)
    by_name = {s.name: s for s in subjects}
    if folds is None:
        folds = [s.name for s in subjects]
    unknown = [f for f in folds if f not in by_name]
    if unknown:
        raise ValueError(f"unknown fold subject(s) {unknown}; "
                         f"have {sorted(by_name)}")

    # ONE load of the whole cohort (base.py:14-15 economics); per-fold
    # training sets are row masks over this index
    index = build_training_index(options, subjects=subjects)

    base_name = options["experiment"]
    results = {}
    for name in folds:
        fold_idx = fold_view(index, name)
        if sample_cap is not None and sample_cap < len(fold_idx):
            # explicit seeded subsample, NOT a prefix slice: with
            # randomize_train=False the index rows are in subject order, and
            # a prefix would silently drop later subjects from every fold
            rng = np.random.default_rng([int(options["seed"]), len(fold_idx)])
            sel = np.sort(rng.permutation(len(fold_idx))[:sample_cap])
            fold_idx = dataclasses.replace(
                fold_idx, centers=fold_idx.centers[sel],
                labels=fold_idx.labels[sel],
                atlas=fold_idx.atlas[sel])
        fold_opts = dataclasses.replace(
            options, experiment=f"{base_name}_fold_{name}",
            load_weights=False)  # each fold trains from scratch
        if options["net_verbose"]:
            print(f"--> fold {name}: {len(fold_idx)} train samples")
        trainer = Trainer(fold_opts, spec=spec, weights_path=weights_path,
                          augment=augment)
        history = trainer.fit(fold_idx)
        best = min(history, key=lambda h: h["valid_loss"])

        # evaluate with the fold's best checkpoint through the product
        # Theano-format round-trip (SaveWeights(only_best) semantics)
        params = jax.device_put(
            load_theano_checkpoint(trainer.weights_file, spec))
        dice = evaluate_fold(params, os.path.dirname(by_name[name].t1_path),
                             options)
        results[name] = {
            "dice": round(float(dice), 4),
            "valid_accuracy": round(best["valid_accuracy"], 5),
            "valid_loss": round(best["valid_loss"], 5),
            "epochs": len(history),
        }
        if options["net_verbose"]:
            print(f"--> fold {name}: dice {dice:.4f} "
                  f"(valid_acc {best['valid_accuracy']:.4f})")

    return {"folds": results,
            "mean_dice": round(float(np.mean(
                [r["dice"] for r in results.values()])), 4)}
