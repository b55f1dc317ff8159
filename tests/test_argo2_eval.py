"""Native av2-protocol detection eval tests (hand-computed oracles).

Reference behavior: pcdet/datasets/argo2/argo2_dataset.py:416-476
delegates to av2.evaluation.detection; lvv_tpu.train.argo2_eval is the
native port (center-distance thresholds, interpolated AP, ATE/ASE/AOE at
2 m, CDS composite).
"""
import numpy as np
import pytest

from lvv_tpu.train import argo2_eval as ae


def _box(x, y=0.0, z=0.0, l=4.0, w=2.0, h=1.5, yaw=0.0):
    return [x, y, z, l, w, h, yaw]


def test_perfect_detection():
    gts = [{"name": np.array(["Regular_vehicle"]),
            "gt_boxes_lidar": np.array([_box(10.0)])}]
    preds = [{"name": np.array(["Regular_vehicle"]),
              "boxes_lidar": np.array([_box(10.0)]),
              "score": np.array([0.9])}]
    res = ae.evaluate(gts, preds, ["Regular_vehicle"])
    assert res["Regular_vehicle_AP"] == pytest.approx(1.0)
    assert res["Regular_vehicle_ATE"] == pytest.approx(0.0)
    assert res["Regular_vehicle_ASE"] == pytest.approx(0.0)
    assert res["Regular_vehicle_AOE"] == pytest.approx(0.0)
    assert res["Regular_vehicle_CDS"] == pytest.approx(1.0)
    assert res["mCDS"] == pytest.approx(1.0)


def test_threshold_graded_ap():
    # det 1.5 m off-center: misses the 0.5/1.0 m thresholds, hits 2/4 m
    gts = [{"name": np.array(["Pedestrian"]),
            "gt_boxes_lidar": np.array([_box(5.0, l=0.7, w=0.7, h=1.8)])}]
    preds = [{"name": np.array(["Pedestrian"]),
              "boxes_lidar": np.array([_box(6.5, l=0.7, w=0.7, h=1.8)]),
              "score": np.array([0.8])}]
    res = ae.evaluate(gts, preds, ["Pedestrian"])
    assert res["Pedestrian_AP"] == pytest.approx(0.5)   # 2 of 4 thresholds
    assert res["Pedestrian_ATE"] == pytest.approx(1.5)


def test_tp_error_metrics():
    yaw_off = 0.5
    gts = [{"name": np.array(["Truck"]),
            "gt_boxes_lidar": np.array([_box(10.0, l=8.0, w=3.0, h=3.0)])}]
    preds = [{"name": np.array(["Truck"]),
              "boxes_lidar": np.array(
                  [_box(10.5, l=8.0, w=3.0, h=3.0, yaw=yaw_off)]),
              "score": np.array([0.9])}]
    res = ae.evaluate(gts, preds, ["Truck"])
    assert res["Truck_ATE"] == pytest.approx(0.5)
    assert res["Truck_ASE"] == pytest.approx(0.0)       # same dims
    assert res["Truck_AOE"] == pytest.approx(yaw_off)
    expect_cds = res["Truck_AP"] * np.mean(
        [1 - 0.5 / 2.0, 1.0, 1 - yaw_off / np.pi])
    assert res["Truck_CDS"] == pytest.approx(expect_cds)


def test_scale_error_is_one_minus_aligned_iou():
    gts = [{"name": np.array(["Bus"]),
            "gt_boxes_lidar": np.array([_box(3.0, l=10, w=3, h=3)])}]
    preds = [{"name": np.array(["Bus"]),
              "boxes_lidar": np.array([_box(3.0, l=5, w=3, h=3)]),
              "score": np.array([0.9])}]
    res = ae.evaluate(gts, preds, ["Bus"])
    assert res["Bus_ASE"] == pytest.approx(0.5)         # half-length box


def test_false_positive_halves_precision():
    gts = [{"name": np.array(["Regular_vehicle"]),
            "gt_boxes_lidar": np.array([_box(10.0)])}]
    preds = [{"name": np.array(["Regular_vehicle"] * 2),
              "boxes_lidar": np.array([_box(10.0), _box(50.0)]),
              "score": np.array([0.9, 0.8])}]
    res = ae.evaluate(gts, preds, ["Regular_vehicle"])
    # recall saturates at 1.0 with precision 1.0 before the FP: the
    # envelope keeps AP ~1.0 (only the duplicate recall=1.0 grid point
    # sees the post-FP precision)
    assert res["Regular_vehicle_AP"] > 0.99
    # higher-scored FP DOES hurt
    preds2 = [{"name": np.array(["Regular_vehicle"] * 2),
               "boxes_lidar": np.array([_box(10.0), _box(50.0)]),
               "score": np.array([0.8, 0.9])}]
    res2 = ae.evaluate(gts, preds2, ["Regular_vehicle"])
    assert res2["Regular_vehicle_AP"] == pytest.approx(0.5, abs=0.01)


def test_class_without_gts_excluded_from_means():
    gts = [{"name": np.array(["Regular_vehicle"]),
            "gt_boxes_lidar": np.array([_box(10.0)])}]
    preds = [{"name": np.array(["Regular_vehicle"]),
              "boxes_lidar": np.array([_box(10.0)]),
              "score": np.array([0.9])}]
    res = ae.evaluate(gts, preds, ["Regular_vehicle", "Bicycle"])
    assert "Bicycle_AP" not in res
    assert res["mAP"] == pytest.approx(res["Regular_vehicle_AP"])


def test_no_tp_worst_case_errors():
    gts = [{"name": np.array(["Regular_vehicle"]),
            "gt_boxes_lidar": np.array([_box(10.0)])}]
    preds = [{"name": np.array(["Regular_vehicle"]),
              "boxes_lidar": np.array([_box(50.0)]),
              "score": np.array([0.9])}]
    res = ae.evaluate(gts, preds, ["Regular_vehicle"])
    assert res["Regular_vehicle_AP"] == 0.0
    assert res["Regular_vehicle_ATE"] == pytest.approx(ae.NORM_ATE)
    assert res["Regular_vehicle_AOE"] == pytest.approx(ae.NORM_AOE)
    assert res["Regular_vehicle_CDS"] == 0.0
