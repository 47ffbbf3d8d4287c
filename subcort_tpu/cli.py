"""CLI driver (layer L6) — the reference's ``train_model.py`` as a proper
command-line tool.

Reference flow (train_model.py:1-83): read ``configuration.cfg`` -> load
options -> [optionally train] -> batch inference over the inference folder.
Here both phases are explicit subcommands; ``run`` does train-then-infer
like the reference script's full (partly commented-out) pipeline.

Usage:
    python -m subcort_tpu.cli train  [--config configuration.cfg]
    python -m subcort_tpu.cli infer  [--config configuration.cfg]
    python -m subcort_tpu.cli run    [--config configuration.cfg]
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="subcort_tpu",
                                description="TPU-native sub-cortical segmentation")
    p.add_argument("command", choices=["train", "infer", "run"],
                   help="train: fit the model; infer: segment the inference "
                        "folder; run: both")
    p.add_argument("--config", default="configuration.cfg",
                   help="path to a reference-format configuration.cfg")
    p.add_argument("--weights-path", default="nets",
                   help="experiment artifact root (reference: nets/)")
    p.add_argument("--augment", action="store_true",
                   help="enable rotation/flip augmentation (the reference "
                        "defines but never activates it)")
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)

    from subcort_tpu.config import load_options, print_options, select_platform

    options = load_options(args.config)
    select_platform(options)  # must precede first backend init

    from subcort_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from subcort_tpu.engine import SegmentationEngine, Trainer, build_training_index
    from subcort_tpu.models.importer import load_theano_checkpoint

    if options["net_verbose"]:
        print_options(options)

    if args.command in ("train", "run"):
        print("--> loading training data")
        index = build_training_index(options)
        trainer = Trainer(options, weights_path=args.weights_path,
                          augment=args.augment)
        print("--> training")
        trainer.fit(index)
        params = trainer.params
    else:
        ckpt = os.path.join(args.weights_path, options["experiment"],
                            options["experiment"] + ".pkl")
        print("--> loading weights from", ckpt)
        params = load_theano_checkpoint(ckpt)

    if args.command in ("infer", "run"):
        engine = SegmentationEngine(params, options)
        times = engine.segment_folder()
        for sub, minutes in times.items():
            print(f"--> scan {sub} segmented in {minutes:.2f} min")
    return 0


if __name__ == "__main__":
    sys.exit(main())
