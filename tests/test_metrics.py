"""Metrics utilities: Dice, per-scan stats emission."""

import io
import json

import numpy as np

from subcort_tpu.engine.metrics import ScanStats, dice_per_class, mean_dice


def test_dice_perfect_and_disjoint():
    gt = np.zeros((10, 10, 10), np.uint8)
    gt[2:5, 2:5, 2:5] = 3
    gt[6:8, 6:8, 6:8] = 7
    d = dice_per_class(gt, gt)
    assert d == {3: 1.0, 7: 1.0}
    pred = np.zeros_like(gt)
    pred[0:2, 0:2, 0:2] = 3
    d2 = dice_per_class(pred, gt)
    assert d2[3] == 0.0 and d2[7] == 0.0
    assert 5 not in d2  # absent from both -> omitted


def test_mean_dice_partial_overlap():
    gt = np.zeros((8, 8, 8), np.uint8)
    gt[0:4] = 1
    pred = np.zeros_like(gt)
    pred[2:6] = 1
    # |inter|=2*64, |p|+|g|=8*64 -> dice 0.5
    assert abs(mean_dice(pred, gt) - 0.5) < 1e-9


def test_scan_stats_emission():
    sink = io.StringIO()
    st = ScanStats("subj/T1.nii.gz").set(candidate_voxels=1000, engine="fcn")
    rec = st.emit(sink)
    line = json.loads(sink.getvalue())
    assert line["scan"] == "subj/T1.nii.gz"
    assert line["candidate_voxels"] == 1000
    assert "voxels_per_sec" in line and line["voxels_per_sec"] > 0
    assert rec["engine"] == "fcn"


def test_scan_stats_stop_pins_wallclock():
    """stop() freezes wall_seconds at stop time: the pipelined folder sweep
    emits on a deferred writer thread, and the emitted timing must cover
    load+segment, not queue wait + later scans' device work."""
    import time

    st = ScanStats("s").set(candidate_voxels=100)
    st.stop()
    pinned = time.time() - st.t0
    time.sleep(0.05)  # simulated writer-queue delay
    rec = st.emit(io.StringIO())
    assert rec["wall_seconds"] <= pinned + 1e-6
    # without stop(), emit-time clock applies
    st2 = ScanStats("s2")
    time.sleep(0.05)
    assert st2.emit(io.StringIO())["wall_seconds"] >= 0.05
