"""KITTI-style AP tests."""
import numpy as np

from lvv_tpu.train.kitti_eval import ap_r40, evaluate_kitti, match_sample


def test_match_sample_greedy():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    pred = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                     [0.2, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    scores, tp, n = match_sample(pred, [0.5, 0.9], gt, 0.7)
    # higher-score (idx1) grabs the gt; the perfect box arrives second
    assert n == 1 and tp.sum() == 1
    assert scores[0] == 0.9


def test_ap_r40_perfect():
    ap = ap_r40(np.array([0.9, 0.8]), np.array([True, True]), 2)
    assert ap > 0.95


def test_evaluate_kitti_classes():
    gt = [{"car": {"boxes": [[0, 0, 0, 4, 2, 1.5, 0.0]]},
           "pedestrian": {"boxes": [[5, 5, 0, 0.6, 0.6, 1.7, 0.0]]}}]
    pred = [{"car": {"boxes": [[0, 0.05, 0, 4, 2, 1.5, 0.0]],
             "scores": [0.9]},
             "pedestrian": {"boxes": [[7, 7, 0, 0.6, 0.6, 1.7, 0.0]],
                            "scores": [0.8]}}]
    out = evaluate_kitti(pred, gt, ["car", "pedestrian"])
    assert out["car_ap_3d_R40"] > 0.9      # near-perfect at 0.7 IoU
    assert out["pedestrian_ap_3d_R40"] == 0.0  # 2m off at 0.5 IoU
    assert 0 < out["mAP_3d_R40"] < 1
