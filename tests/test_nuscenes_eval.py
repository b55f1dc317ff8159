"""nuScenes-style mAP/NDS eval tests (synthetic scenarios with known
outcomes)."""
import pytest  # noqa: F401
import numpy as np

from lvv_tpu.train.nuscenes_eval import (accumulate_class,
                                         average_precision, evaluate)


def _sample(boxes, scores=None):
    out = {"boxes": np.asarray(boxes, np.float32)}
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float32)
    return out


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_perfect_predictions_ap_one():
    gt = [_sample([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0],
                   [10, 0, 0, 4, 2, 1.5, 0.0, 0, 0]])]
    pred = [_sample([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0],
                     [10, 0, 0, 4, 2, 1.5, 0.0, 0, 0]], [0.9, 0.8])]
    acc = accumulate_class(pred, gt, dist_th=2.0)
    assert acc["tp"].sum() == 2 and acc["fp"].sum() == 0
    ap = average_precision(acc)
    assert ap > 0.95


def test_false_positives_reduce_ap():
    gt = [_sample([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]])]
    good = [_sample([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]], [0.9])]
    noisy = [_sample([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0],
                      [50, 50, 0, 4, 2, 1.5, 0.0, 0, 0],
                      [60, 60, 0, 4, 2, 1.5, 0.0, 0, 0]], [0.5, 0.9, 0.8])]
    ap_good = average_precision(accumulate_class(good, gt, 2.0))
    ap_noisy = average_precision(accumulate_class(noisy, gt, 2.0))
    assert ap_good > ap_noisy


def test_distance_threshold_matters():
    gt = [_sample([[0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]])]
    off = [_sample([[1.5, 0, 0, 4, 2, 1.5, 0.0, 0, 0]], [0.9])]
    tight = accumulate_class(off, gt, 0.5)
    loose = accumulate_class(off, gt, 2.0)
    assert tight["tp"].sum() == 0 and loose["tp"].sum() == 1


def test_evaluate_full_report():
    gt_c = [_sample([[0, 0, 0, 4, 2, 1.5, 0.2, 1, 0]])]
    pred_c = [_sample([[0.3, 0, 0, 4.2, 2, 1.5, 0.25, 1.1, 0]], [0.9])]
    out = evaluate({"car": pred_c}, {"car": gt_c}, ["car"])
    assert 0 < out["mAP"] <= 1
    assert 0 < out["NDS"] <= 1
    cls = out["per_class"]["car"]
    assert cls["trans_err"] < 0.5
    assert cls["orient_err"] < 0.1
    assert cls["vel_err"] < 0.2
    # missing class contributes zero AP
    out2 = evaluate({"car": pred_c}, {"car": gt_c, "bus": gt_c},
                    ["car", "bus"])
    assert out2["mAP"] < out["mAP"]
