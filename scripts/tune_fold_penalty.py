"""One-off tuning run (round 5): pick the fold_penalty weight for the jax
FFD's fold-safety default (VERDICT r4 weak-5). Runs on CPU."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json  # noqa: E402
import time  # noqa: E402

from bench_reg import make_phantom, structure_dice  # noqa: E402
from subcort_tpu.registration.jax_ffd import (jacobian_stats,  # noqa: E402
                                              register_ffd_jax)


def main():
    template, subject, subject_remap, atlas, gt_masks = make_phantom()
    for cost in ("ssd", "nmi"):
        ref = subject_remap if cost == "nmi" else subject
        for jw in (0.0, 0.01, 0.1, 1.0, 10.0):
            t0 = time.time()
            grid, _ = register_ffd_jax(ref, template, spacing_mm=6.0,
                                       iters=(60, 10), cost=cost,
                                       fold_penalty=jw, warn_folds=False)
            secs = time.time() - t0
            stats = jacobian_stats(grid, ref.shape)
            dice = structure_dice(grid, atlas, gt_masks)
            print(json.dumps({"cost": cost, "jw": jw,
                              "dice": round(dice, 4),
                              "min_jac": round(stats["min_jac"], 4),
                              "neg_fraction": stats["neg_fraction"],
                              "secs": round(secs, 1)}), flush=True)


if __name__ == "__main__":
    main()
