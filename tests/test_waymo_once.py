"""Waymo + ONCE datasets and native evals (reference waymo_dataset.py /
waymo_eval.py, once_dataset.py / once_eval/evaluation.py) — fabricated
records + hand-computed AP goldens."""
import numpy as np
import pytest

from lvv_tpu.data.detection_dataset import build_dataset
from lvv_tpu.train.once_eval import (get_evaluation_results, get_thresholds,
                                     iou3d_with_heading)
from lvv_tpu.train.waymo_eval import evaluate as waymo_evaluate
from lvv_tpu.train.waymo_eval import heading_accuracy


def box7(x, y, z=0.0, dx=4.0, dy=2.0, dz=1.5, yaw=0.0):
    return [x, y, z, dx, dy, dz, yaw]


# ------------------------------------------------------------------ Waymo


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_waymo_heading_accuracy():
    assert heading_accuracy(0.0, 0.0) == pytest.approx(1.0)
    assert heading_accuracy(0.0, np.pi) == pytest.approx(0.0)
    assert heading_accuracy(0.0, np.pi / 2) == pytest.approx(0.5)
    # wraparound
    assert heading_accuracy(0.1, 2 * np.pi - 0.1) == pytest.approx(
        1 - 0.2 / np.pi)


def test_waymo_eval_perfect_and_miss():
    gt = [{"name": np.array(["Vehicle", "Vehicle"]),
           "gt_boxes_lidar": np.array([box7(0, 0), box7(10, 0)]),
           "num_points_in_gt": np.array([50, 2])}]   # second is L2-only
    pred = [{"name": np.array(["Vehicle"]),
             "boxes_lidar": np.array([box7(0, 0)]),
             "score": np.array([0.9])}]
    out = waymo_evaluate(gt, pred)
    # L1: the only counted gt is detected perfectly
    assert out["Vehicle/L1 AP"] == pytest.approx(1.0)
    assert out["Vehicle/L1 APH"] == pytest.approx(1.0)
    # L2 counts both gts: recall tops out at 0.5
    assert 0.4 < out["Vehicle/L2 AP"] < 0.6
    # a 90deg-rotated-heading TP halves APH but not AP
    pred_rot = [{"name": np.array(["Vehicle"]),
                 "boxes_lidar": np.array([box7(0, 0, yaw=np.pi)]),
                 "score": np.array([0.9])}]
    # note: pi-flipped box has identical IoU but zero heading accuracy
    out2 = waymo_evaluate(gt, pred_rot)
    assert out2["Vehicle/L1 AP"] == pytest.approx(1.0)
    assert out2["Vehicle/L1 APH"] == pytest.approx(0.0, abs=1e-6)


def test_waymo_l1_ignores_l2_matches():
    """A detection on an L2-only gt must not be an L1 false positive."""
    gt = [{"name": np.array(["Vehicle", "Vehicle"]),
           "gt_boxes_lidar": np.array([box7(0, 0), box7(10, 0)]),
           "num_points_in_gt": np.array([50, 2])}]
    pred = [{"name": np.array(["Vehicle", "Vehicle"]),
             "boxes_lidar": np.array([box7(0, 0), box7(10, 0)]),
             "score": np.array([0.9, 0.8])}]
    out = waymo_evaluate(gt, pred)
    assert out["Vehicle/L1 AP"] == pytest.approx(1.0)
    assert out["Vehicle/L2 AP"] == pytest.approx(1.0)


# ------------------------------------------------------------------- ONCE


def test_once_iou_heading_gate():
    a = np.array([box7(0, 0)], np.float32)
    b_same = np.array([box7(0, 0)], np.float32)
    b_rot = np.array([box7(0, 0, yaw=np.pi * 0.75)], np.float32)
    assert iou3d_with_heading(a, b_same)[0, 0] == pytest.approx(1.0)
    assert iou3d_with_heading(a, b_rot)[0, 0] == 0.0          # >90deg gate
    assert iou3d_with_heading(a, b_rot, with_heading=False)[0, 0] > 0.0


def test_once_thresholds_golden():
    # hand-trace of the reference loop (evaluation.py:153-174) with
    # scores [.9 .8 .7 .6], 4 gts, 4 pr points: the inner while fires once
    # at i=0 (r+l = .75 > 2*.25), duplicating the first score
    th = get_thresholds(np.array([0.9, 0.8, 0.7, 0.6]), 4, num_pr_points=4)
    assert th == [0.9, 0.9, 0.8, 0.7, 0.6]


def test_once_eval_perfect():
    gt = [{"name": np.array(["Car", "Pedestrian"]),
           "boxes_3d": np.array([box7(0, 0), box7(5, 5, dx=0.8, dy=0.8)])}]
    pred = [{"name": np.array(["Car", "Pedestrian"]),
             "boxes_3d": np.array([box7(0, 0),
                                   box7(5, 5, dx=0.8, dy=0.8)]),
             "score": np.array([0.9, 0.8])}]
    _, res = get_evaluation_results(
        gt, pred, ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"])
    assert res["AP_Vehicle/overall"] == pytest.approx(100.0, abs=2.1)
    assert res["AP_Pedestrian/overall"] == pytest.approx(100.0, abs=2.1)
    # distance bucket: both gts are 0-30m
    assert res["AP_Vehicle/0-30m"] == pytest.approx(100.0, abs=2.1)
    assert res["AP_Vehicle/50m-inf"] == 0.0


def test_once_eval_false_positive_hurts():
    gt = [{"name": np.array(["Car"]), "boxes_3d": np.array([box7(0, 0)])}]
    pred = [{"name": np.array(["Car", "Car"]),
             "boxes_3d": np.array([box7(0, 0), box7(20, 20)]),
             "score": np.array([0.5, 0.9])}]   # FP outranks the TP
    _, res = get_evaluation_results(
        gt, pred, ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"])
    assert res["AP_Vehicle/overall"] < 60.0


# ------------------------------------------------------------- datasets


def test_waymo_dataset_loader(tmp_path):
    seq = tmp_path / "seg-0"
    seq.mkdir()
    pts = np.zeros((5, 6), np.float32)
    pts[:, :3] = [[1, 2, 0.5]] * 5
    pts[:, 3] = 2.0                      # intensity -> tanh
    pts[:, 5] = -1.0                     # -1 == outside no-label zone
    pts[4, 5] = 1.0                      # NLZ-flagged: dropped
    np.save(seq / "0000.npy", pts)
    infos = [{"point_cloud": {"lidar_sequence": "seg-0", "sample_idx": 0},
              "annos": {"name": np.array(["Vehicle", "unknown"]),
                        "gt_boxes_lidar": np.array(
                            [box7(1, 2, 0.5), box7(9, 9)], np.float32),
                        "num_points_in_gt": np.array([5, 0])}}]
    ds = build_dataset("Waymo", dataroot=str(tmp_path), infos=infos,
                       point_range=(-54, -54, -5, 54, 54, 3),
                       max_points=16, max_gt=4)
    s = ds[0]
    n = int(s["num_points"])
    assert n == 4                        # NLZ return removed
    assert s["points"].shape == (16, 5)
    np.testing.assert_allclose(s["points"][:n, 3], np.tanh(2.0), atol=1e-6)
    assert int(s["gt_mask"].sum()) == 1  # 'unknown' + empty filtered
    assert s["gt_labels"][0] == ds.CLASSES.index("Vehicle")


def test_once_dataset_loader(tmp_path):
    pts = np.array([[1, 1, 0, 0.5], [2, 2, 0, 0.1]], np.float32)
    f = tmp_path / "frame1.bin"
    pts.tofile(f)
    infos = [{"frame_id": "frame1", "lidar_path": str(f),
              "annos": {"name": np.array(["Bus"]),
                        "boxes_3d": np.array([box7(1, 1, dx=10, dy=3,
                                                   dz=3)], np.float32)}}]
    ds = build_dataset("ONCE", infos=infos,
                       point_range=(-54, -54, -5, 54, 54, 3),
                       max_points=8, max_gt=4)
    s = ds[0]
    assert int(s["num_points"]) == 2
    assert s["gt_labels"][0] == ds.CLASSES.index("Bus")
    assert s["gt_boxes"][0, 3] == pytest.approx(10.0)


def test_waymo_range_breakdowns():
    """Official RANGE breakdown shards: a far-away det/gt pair counts in
    [50, inf) but not [0, 30)."""
    import numpy as np
    from lvv_tpu.train.waymo_eval import evaluate

    def box(x, n=1):
        return np.tile(np.array([[x, 0, 1, 4, 2, 1.5, 0.0]], np.float32),
                       (n, 1))
    gts = [{"name": np.array(["Vehicle", "Vehicle"]),
            "gt_boxes_lidar": np.concatenate([box(10), box(60)]),
            "num_points_in_gt": np.array([50, 50])}]
    preds = [{"name": np.array(["Vehicle", "Vehicle"]),
              "boxes_lidar": np.concatenate([box(10), box(60)]),
              "score": np.array([0.9, 0.8])}]
    res = evaluate(gts, preds, classes=("Vehicle",),
                   range_breakdowns=True)
    assert res["Vehicle/L1 AP"] > 0.9                    # overall
    assert res["Vehicle/L1 AP [0, 30)"] > 0.9
    assert res["Vehicle/L1 AP [50, inf)"] > 0.9
    # nothing lives in [30, 50)
    assert res["Vehicle/L1 AP [30, 50)"] == 0.0
