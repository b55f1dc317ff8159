"""Waymo AP/APH golden cross-check — hand-derived fixtures.

Every expected value below is computed BY HAND from the official metric
semantics as the reference configures them
(/root/reference/src/lidar-encoder/pcdet/datasets/waymo/waymo_eval.py:92-112):
101 score cutoffs 0.00..0.99,1.0, TYPE_HUNGARIAN matching, per-class IoU
thresholds (Vehicle .7 / Ped .5 / Cyclist .5), L1 = num_points>5,
zero-point gts dropped, APH = AP with TPs weighted by heading accuracy
1 - |dθ|_wrapped/π, AP = 101-point max-interpolated area under PR.

The derivations are written out in each test so the numbers are auditable
without running anything. Together these pin both evaluators:
`evaluate` (fast greedy/continuous) and `evaluate_official`
(Hungarian/cutoff-sampled), and quantify where they differ by
construction (greedy-vs-Hungarian scene).
"""
import numpy as np
import pytest

from lvv_tpu.train.waymo_eval import (OFFICIAL_SCORE_CUTOFFS, evaluate,
                                      evaluate_official, hungarian_match)

pytestmark = pytest.mark.fast


def box(x, y=0.0, dx=1.0, dy=1.0, yaw=0.0):
    """Unit-height axis-controlled box at z=0: [x,y,z,dx,dy,dz,yaw]."""
    return [x, y, 0.0, dx, dy, 1.0, yaw]


def scene(gt_boxes, gt_names, npts, pred_boxes, pred_names, scores):
    gt = {"name": np.asarray(gt_names),
          "gt_boxes_lidar": np.asarray(gt_boxes, np.float32),
          "num_points_in_gt": np.asarray(npts)}
    pred = {"name": np.asarray(pred_names),
            "boxes_lidar": np.asarray(pred_boxes, np.float32),
            "score": np.asarray(scores, np.float32)}
    return [gt], [pred]


def test_cutoff_schedule_matches_reference():
    # reference waymo_eval.py:108-110: range(100) * 0.01 then 1.0
    assert len(OFFICIAL_SCORE_CUTOFFS) == 101
    assert OFFICIAL_SCORE_CUTOFFS[0] == 0.0
    assert abs(OFFICIAL_SCORE_CUTOFFS[99] - 0.99) < 1e-12
    assert OFFICIAL_SCORE_CUTOFFS[100] == 1.0


def test_golden_perfect_and_heading():
    """2 counted Vehicle gts; p1 exact (hacc 1), p2 square box rotated π/2
    (same footprint -> IoU 1, hacc = 1 - (π/2)/π = 0.5), p3 far FP.

    Continuous curve (greedy): cum tp [1,2,2], fp [0,0,1] ->
      recall [.5,1,1], prec [1,1,2/3], prec_h [1,.75,.5].
    AP: every grid r has an achievable precision 1  -> AP = 1.
    APH: r<=.5 -> max prec_h 1 (51 grid pts); r>.5 -> .75 (50 pts)
      -> APH = (51 + 50*0.75)/101.
    Official cutoff curve gives the same two envelope plateaus
    (points (1, 2/3, .5), (1, 1, .75), (.5, 1, 1)) -> identical AP/APH.
    """
    gt, pred = scene(
        [box(0), box(10)], ["Vehicle", "Vehicle"], [10, 10],
        [box(0), box(10, yaw=np.pi / 2), box(100)],
        ["Vehicle"] * 3, [0.95, 0.85, 0.75])
    expect_ap = 1.0
    expect_aph = (51 + 50 * 0.75) / 101
    for fn in (evaluate, evaluate_official):
        out = fn(gt, pred, classes=("Vehicle",))
        for lvl in (1, 2):
            assert out[f"Vehicle/L{lvl} AP"] == pytest.approx(
                expect_ap, abs=1e-9), fn.__name__
            assert out[f"Vehicle/L{lvl} APH"] == pytest.approx(
                expect_aph, abs=1e-9), fn.__name__


def test_golden_l1_l2_ignore_and_zero_point_drop():
    """gt1 (10 pts, counted L1+L2), gt2 (3 pts, L2 only), gt3 (0 pts,
    dropped entirely per reference nonzero_mask). p1 (score .9) hits gt2
    exactly; p2 (score .6) hits gt1 with yaw π (unit square footprint
    unchanged -> IoU 1, hacc = 1 - π/π = 0).

    L1: n_gt=1. p1 matches an uncounted gt -> ignored (not FP);
        p2 TP with hacc 0 -> curve recall [1], prec [1], prec_h [0]
        -> AP = 1, APH = 0.
    L2: n_gt=2 (gt3 dropped). Both TP; cum tp [1,2], prec [1,1],
        recall [.5,1]; prec_h [1,.5]
        -> AP = 1, APH = (51*1 + 50*.5)/101.
    """
    gt, pred = scene(
        [box(0), box(10), box(20)], ["Pedestrian"] * 3, [10, 3, 0],
        [box(10), box(0, yaw=np.pi)], ["Pedestrian"] * 2, [0.9, 0.6])
    expect_l2_aph = (51 + 50 * 0.5) / 101
    for fn in (evaluate, evaluate_official):
        out = fn(gt, pred, classes=("Pedestrian",))
        assert out["Pedestrian/L1 AP"] == pytest.approx(1.0, abs=1e-9)
        assert out["Pedestrian/L1 APH"] == pytest.approx(0.0, abs=1e-9)
        assert out["Pedestrian/L2 AP"] == pytest.approx(1.0, abs=1e-9)
        assert out["Pedestrian/L2 APH"] == pytest.approx(
            expect_l2_aph, abs=1e-9)


def test_golden_hungarian_vs_greedy():
    """The one semantic difference between the two evaluators, isolated.

    Cyclist boxes dx=10 (IoU of two x-offset-d copies = (10-d)/(10+d)).
    gts g1@x=0, g2@x=3. Pred A@x=1 (score .9): IoU(g1)=9/11≈.818,
    IoU(g2)=8/12≈.667. Pred B@x=-2 (score .8): IoU(g1)=8/12≈.667,
    IoU(g2)=5/15≈.333 < .5 (below threshold).

    Greedy (score order): A takes its best gt g1; B's only candidate g2
    is below threshold -> B is FP. Curve: cum tp [1,1], fp [0,1] ->
    recall [.5,.5], prec [1,.5] -> AP = 51/101 (r<=.5 envelope 1,
    r>.5 unreachable). All yaws 0 -> APH = AP.

    Hungarian: A→g2 + B→g1 (total IoU 1.334 > .818) -> both TP. Cutoffs
    <= .8 give recall 1 / prec 1; (.8,.9] give recall .5 / prec 1 ->
    AP = 1, APH = 1.
    """
    gt, pred = scene(
        [box(0, dx=10), box(3, dx=10)], ["Cyclist", "Cyclist"], [10, 10],
        [box(1, dx=10), box(-2, dx=10)], ["Cyclist", "Cyclist"],
        [0.9, 0.8])
    out_g = evaluate(gt, pred, classes=("Cyclist",))
    out_o = evaluate_official(gt, pred, classes=("Cyclist",))
    assert out_g["Cyclist/L1 AP"] == pytest.approx(51 / 101, abs=1e-9)
    assert out_g["Cyclist/L1 APH"] == pytest.approx(51 / 101, abs=1e-9)
    assert out_o["Cyclist/L1 AP"] == pytest.approx(1.0, abs=1e-9)
    assert out_o["Cyclist/L1 APH"] == pytest.approx(1.0, abs=1e-9)


def test_hungarian_match_maximizes_total_iou():
    iou = np.array([[0.818, 0.667],
                    [0.667, 0.333]])   # rows gts, cols preds
    pairs = hungarian_match(iou, 0.5)
    # A(col 0)→g2(row 1), B? no: cols are preds: pred0 has ious
    # [.818, .667] with g1/g2... construct directly: expect the
    # cross-assignment (g0→pred1 .667, g1→pred0 .667) total 1.334
    assert sorted(pairs) == [(0, 1), (1, 0)]
    # below-threshold pairs are forbidden even if they'd help
    iou2 = np.array([[0.9, 0.0], [0.45, 0.0]])
    assert hungarian_match(iou2, 0.5) == [(0, 0)]


def test_range_breakdown_shards_match_manual():
    """Range shards equal evaluating each shard's boxes alone."""
    gt, pred = scene(
        [box(10), box(40)], ["Vehicle", "Vehicle"], [10, 10],
        [box(10), box(40, yaw=np.pi / 2)], ["Vehicle", "Vehicle"],
        [0.95, 0.85])
    out = evaluate(gt, pred, classes=("Vehicle",), range_breakdowns=True)
    near_gt, near_pred = scene([box(10)], ["Vehicle"], [10],
                               [box(10)], ["Vehicle"], [0.95])
    near = evaluate(near_gt, near_pred, classes=("Vehicle",))
    assert out["Vehicle/L1 AP [0, 30)"] == pytest.approx(
        near["Vehicle/L1 AP"], abs=1e-9)
    mid_gt, mid_pred = scene([box(40)], ["Vehicle"], [10],
                             [box(40, yaw=np.pi / 2)], ["Vehicle"], [0.85])
    mid = evaluate(mid_gt, mid_pred, classes=("Vehicle",))
    assert out["Vehicle/L1 APH [30, 50)"] == pytest.approx(
        mid["Vehicle/L1 APH"], abs=1e-9)
