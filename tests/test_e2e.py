"""Composed end-to-end product-path test (VERDICT r1 next-3).

Drives the exact flow a user runs (reference train_model.py:23-78) through
``cli.main``: build training set (registering the synthetic atlas on demand
through the native tools) -> train one epoch -> batch inference over the
inference folder -> evaluate cohort Dice — asserting the reference's
artifact contract at every stage (nets/<name>/<name>.pkl, per-subject
tmp/ registration cache, out_subcortical_seg_prec.nii.gz, cohort JSON).

Everything runs on the CPU test mesh with a synthetic 64x72x60 phantom
cohort derived from registration/atlas.py, so no external data or hardware
is needed. This is the one test that exercises the composed product; each
stage also has its own focused tests elsewhere.
"""

import json
import os

import numpy as np
import pytest
from scipy import ndimage

from subcort_tpu.cli import main
from subcort_tpu.io import NiftiImage, save_nii, load_nii
from subcort_tpu.registration.atlas import make_synthetic_atlas

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(TOOLS, "reg_aladin")),
    reason="native tools not built (cd native && make)")

CFG = """\
[database]
train_folder = {root}
inference_folder = {root}
t1_name = T1.nii.gz
roi_name = gt_15_classes.nii.gz
save_tmp = True

[model]
name = e2e_v1
mode = cpu
patch_size = 32
batch_size = 128
patience = 5
net_verbose = 0
max_epochs = 1
train_split = 0.25
test_batch_size = 4096
load_weights = False
out_probabilities = False
speedup_segmentation = True
post_process = True
debug = False

[tpu]
seed = 7
"""


def _make_cohort(root, atlas_dir):
    """Two phantom subjects = synthetic template translated by known integer
    offsets, with GT derived from the identically shifted atlas (classes
    1..14 where a structure dominates, 15 = boundary-background ring —
    the reference's restricted-sampling convention, base.py:124,162)."""
    template, atlas = make_synthetic_atlas(atlas_dir, seed=3)
    for name, off in (("s01", (2, -1, 1)), ("s02", (-1, 2, -2))):
        sub = os.path.join(root, name)
        os.makedirs(sub, exist_ok=True)
        t1 = np.roll(template, off, axis=(0, 1, 2))
        at = np.roll(atlas, off, axis=(0, 1, 2))
        gt = np.zeros(t1.shape, np.uint8)
        for s in range(14):
            gt[at[..., s] > 0.5] = s + 1
        ring = ndimage.binary_dilation(gt > 0, iterations=2) & (gt == 0)
        gt[ring] = 15
        save_nii(NiftiImage(t1.astype(np.float32)), os.path.join(sub, "T1.nii.gz"))
        save_nii(NiftiImage(gt), os.path.join(sub, "gt_15_classes.nii.gz"))


def test_cli_run_composed(tmp_path, capsys, monkeypatch):
    root = tmp_path / "cohort"
    atlas_dir = tmp_path / "atlases"
    root.mkdir()
    _make_cohort(str(root), str(atlas_dir))
    monkeypatch.setenv("SUBCORT_ATLAS_DIR", str(atlas_dir))

    cfg = tmp_path / "configuration.cfg"
    cfg.write_text(CFG.format(root=root))
    nets = tmp_path / "nets"

    rc = main(["run", "--config", str(cfg), "--weights-path", str(nets)])
    assert rc == 0

    # training artifact contract (reference nets.py:146-147,155-156)
    assert (nets / "e2e_v1" / "e2e_v1.pkl").exists()
    assert (nets / "e2e_v1" / "e2e_v1_history.pkl").exists()

    for name in ("s01", "s02"):
        sub = root / name
        # registration cache contract (base.py:508-549)
        assert (sub / "tmp" / "MNI_sub_probabilities.nii.gz").exists()
        assert (sub / "tmp" / "MNI_subcortical_mask.nii.gz").exists()
        # output contract (base.py:445-455, post_process=True)
        seg = np.asarray(load_nii(str(sub / "out_subcortical_seg_prec.nii.gz")).data)
        assert seg.shape == (64, 72, 60)
        assert set(np.unique(seg)) <= set(range(15))

    capsys.readouterr()  # drop train/infer chatter
    rc = main(["evaluate", "--config", str(cfg)])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    cohort = [l for l in lines if "cohort_mean_dice" in l]
    assert cohort and cohort[0]["n_subjects"] == 2
    # one epoch on an easy phantom must already segment recognizably (the
    # convergence gate proper is tests/test_trainqual.py + bench_trainqual);
    # a model that learned nothing scores ~0 here
    assert 0.25 <= cohort[0]["cohort_mean_dice"] <= 1.0, cohort[0]
