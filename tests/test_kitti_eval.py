"""KITTI-style AP tests."""
import numpy as np
import pytest

from lvv_tpu.train.kitti_eval import ap_r40, evaluate_kitti, match_sample


def test_match_sample_greedy():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    pred = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                     [0.2, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    scores, tp, n = match_sample(pred, [0.5, 0.9], gt, 0.7)
    # higher-score (idx1) grabs the gt; the perfect box arrives second
    assert n == 1 and tp.sum() == 1
    assert scores[0] == 0.9


@pytest.mark.fast
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


def test_official_difficulty_buckets():
    """clean_data semantics: occlusion/truncation/height gate difficulty;
    similar classes and beyond-difficulty gts are ignored, not penalized
    (reference kitti_object_eval_python/eval.py clean_data:84-130)."""
    from lvv_tpu.train.kitti_eval import clean_data, evaluate_kitti_official

    def box7(x, y):
        return [x, y, 0.0, 4.0, 2.0, 1.5, 0.0]

    gt = {"name": np.array(["Car", "Car", "Van", "Pedestrian"]),
          "boxes": np.array([box7(0, 0), box7(10, 0), box7(20, 0),
                             box7(30, 0)], np.float32),
          "occluded": np.array([0, 2, 0, 0]),
          "truncated": np.array([0.0, 0.0, 0.0, 0.0]),
          "bbox_height": np.array([50.0, 50.0, 50.0, 50.0])}
    f_easy = clean_data(gt, "Car", 0)
    # heavily occluded Car ignored at easy, Van ignored (similar),
    # Pedestrian rejected
    assert f_easy.tolist() == [0, 1, 1, -1]
    f_hard = clean_data(gt, "Car", 2)
    assert f_hard.tolist() == [0, 0, 1, -1]

    # detections on the ignored (occluded) gt must not be easy-FPs
    pred = [{"name": np.array(["Car", "Car"]),
             "boxes": np.array([box7(0, 0), box7(10, 0)], np.float32),
             "score": np.array([0.9, 0.8])}]
    res = evaluate_kitti_official([gt], pred, ["Car"], score_sampling=False)
    assert res["Car_easy_ap_3d_R40"] == pytest.approx(1.0)
    assert res["Car_hard_ap_3d_R40"] == pytest.approx(1.0)
    # a detection on the Van is likewise ignored (similar class)
    pred2 = [{"name": np.array(["Car", "Car"]),
              "boxes": np.array([box7(0, 0), box7(20, 0)], np.float32),
              "score": np.array([0.9, 0.8])}]
    res2 = evaluate_kitti_official([gt], pred2, ["Car"], score_sampling=False)
    assert res2["Car_easy_ap_3d_R40"] == pytest.approx(1.0)
    # but a detection on empty space IS a false positive
    pred3 = [{"name": np.array(["Car", "Car"]),
              "boxes": np.array([box7(0, 0), box7(99, 99)], np.float32),
              "score": np.array([0.5, 0.9])}]
    res3 = evaluate_kitti_official([gt], pred3, ["Car"], score_sampling=False)
    assert res3["Car_easy_ap_3d_R40"] < 1.0


def test_image_box_overlap_criteria():
    from lvv_tpu.train.kitti_eval import image_box_overlap

    a = np.array([[0, 0, 10, 10]], np.float64)
    b = np.array([[5, 0, 15, 10]], np.float64)
    # IoU = 50 / 150
    assert image_box_overlap(a, b)[0, 0] == pytest.approx(50 / 150)
    # criterion 0: inter / area(a) = 50/100
    assert image_box_overlap(a, b, criterion=0)[0, 0] == pytest.approx(0.5)


def test_official_bbox_mode_with_dontcare():
    """2D metric: DontCare regions absorb unmatched detections
    (reference eval.py:250-262); plain strays stay FPs."""
    from lvv_tpu.train.kitti_eval import evaluate_kitti_official

    gt = {"name": np.array(["Car", "DontCare"]),
          "boxes": np.zeros((2, 7), np.float32),
          "bbox": np.array([[0, 0, 100, 100], [200, 200, 300, 300]],
                           np.float64),
          "occluded": np.zeros(2), "truncated": np.zeros(2)}
    # det 2 sits fully inside the DontCare region -> dropped, not FP
    pred = [{"name": np.array(["Car", "Car"]),
             "bbox": np.array([[0, 0, 100, 100], [210, 210, 290, 290]],
                              np.float64),
             "boxes": np.zeros((2, 7), np.float32),
             "score": np.array([0.9, 0.8])}]
    res = evaluate_kitti_official([gt], pred, ["Car"], mode="bbox", score_sampling=False)
    assert res["Car_easy_ap_bbox_R40"] == pytest.approx(1.0)
    # same stray outside any DontCare region IS an FP
    pred2 = [{"name": np.array(["Car", "Car"]),
              "bbox": np.array([[0, 0, 100, 100], [400, 400, 500, 500]],
                               np.float64),
              "boxes": np.zeros((2, 7), np.float32),
              "score": np.array([0.9, 0.95])}]
    res2 = evaluate_kitti_official([gt], pred2, ["Car"], mode="bbox", score_sampling=False)
    assert res2["Car_easy_ap_bbox_R40"] < 1.0


def test_official_det_height_ignored():
    """Too-short detections are ignored, not FPs (reference
    clean_data:70-82 ignored_dt)."""
    from lvv_tpu.train.kitti_eval import evaluate_kitti_official

    gt = {"name": np.array(["Car"]),
          "boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
          "bbox": np.array([[0, 0, 100, 100]], np.float64),
          "occluded": np.zeros(1), "truncated": np.zeros(1)}
    # second det is 20px tall (below easy MIN_HEIGHT 40) far away: ignored
    pred = [{"name": np.array(["Car", "Car"]),
             "bbox": np.array([[0, 0, 100, 100], [400, 0, 440, 20]],
                              np.float64),
             "boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                                [50, 50, 0, 4, 2, 1.5, 0.0]], np.float32),
             "score": np.array([0.9, 0.95])}]
    res = evaluate_kitti_official([gt], pred, ["Car"], mode="bbox", score_sampling=False)
    assert res["Car_easy_ap_bbox_R40"] == pytest.approx(1.0)


def test_aos_orientation_similarity():
    """AOS = AP with (1+cos(dalpha))/2 in the precision numerator
    (reference eval.py:263-270)."""
    from lvv_tpu.train.kitti_eval import evaluate_kitti_official

    gt = {"name": np.array(["Car"]),
          "boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
          "bbox": np.array([[0, 0, 100, 100]], np.float64),
          "alpha": np.array([0.0]),
          "occluded": np.zeros(1), "truncated": np.zeros(1)}
    perfect = [{"name": np.array(["Car"]),
                "bbox": np.array([[0, 0, 100, 100]], np.float64),
                "boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
                "alpha": np.array([0.0]), "score": np.array([0.9])}]
    res = evaluate_kitti_official([gt], perfect, ["Car"], mode="bbox",
                                  compute_aos=True, score_sampling=False)
    assert res["Car_easy_aos_R40"] == pytest.approx(1.0)
    # flipped orientation: bbox AP still 1, AOS collapses to ~0
    flipped = [{**perfect[0], "alpha": np.array([np.pi])}]
    res2 = evaluate_kitti_official([gt], flipped, ["Car"], mode="bbox",
                                   compute_aos=True, score_sampling=False)
    assert res2["Car_easy_ap_bbox_R40"] == pytest.approx(1.0)
    assert res2["Car_easy_aos_R40"] == pytest.approx(0.0, abs=1e-6)


# ------------------------------------------------- official score sampling

def test_get_thresholds_small():
    from lvv_tpu.train.kitti_eval import get_thresholds
    # 2 gts, both recalled: every TP score becomes a threshold
    np.testing.assert_allclose(get_thresholds([0.9, 0.8], 2), [0.9, 0.8])
    # no TPs -> no thresholds
    assert len(get_thresholds([], 5)) == 0


def test_ap_r40_official_tiny_scene_is_sampled():
    from lvv_tpu.train.kitti_eval import ap_r40_official
    # perfect 2-det/2-gt scene: only thresholds[1] lands inside the
    # 1..40 sample window -> AP = 1/40 (the official value, NOT 1.0)
    ap = ap_r40_official(np.array([0.9, 0.8]),
                         np.array([True, True]), 2)
    assert ap == pytest.approx(1 / 40)


def test_ap_r40_official_converges_to_continuous():
    from lvv_tpu.train.kitti_eval import ap_r40, ap_r40_official
    rng = np.random.default_rng(0)
    n = 800
    scores = rng.uniform(size=n)
    # decreasing tp probability with score rank -> a realistic PR curve
    order = np.argsort(-scores)
    tp = np.zeros(n, bool)
    tp[order] = rng.uniform(size=n) < np.linspace(0.95, 0.2, n)
    n_gt = int(tp.sum()) + 50
    a_cont = ap_r40(scores, tp, n_gt)
    a_off = ap_r40_official(scores, tp, n_gt)
    # nearest-side threshold rounding can land either side of the grid,
    # so the two formulations agree only asymptotically
    assert a_off == pytest.approx(a_cont, abs=0.02)


def test_ap_r40_official_dense_perfect_saturates():
    from lvv_tpu.train.kitti_eval import ap_r40_official
    n = 200
    scores = np.linspace(1.0, 0.5, n)
    ap = ap_r40_official(scores, np.ones(n, bool), n)
    assert ap == pytest.approx(1.0, abs=1 / 40)


def test_official_eval_score_sampling_default():
    # default (official) formulation yields the sampled value on the toy
    # scene; score_sampling=False restores the continuous-PR intuition
    gt = {"name": np.array(["Car"]),
          "boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32),
          "occluded": np.array([0]), "truncated": np.array([0.0]),
          "bbox_height": np.array([50.0])}
    pred = [{"name": np.array(["Car"]),
             "boxes": np.array([[0, 0.02, 0, 4, 2, 1.5, 0.0]], np.float32),
             "score": np.array([0.9]),
             "bbox_height": np.array([50.0])}]
    from lvv_tpu.train.kitti_eval import evaluate_kitti_official
    # official quirk: a 1-gt scene fills only sample point 0, which R40
    # excludes -> AP exactly 0 even for a perfect detection
    res = evaluate_kitti_official([gt], pred, ["Car"])
    assert res["Car_easy_ap_3d_R40"] == 0.0
    res2 = evaluate_kitti_official([gt], pred, ["Car"],
                                   score_sampling=False)
    assert res2["Car_easy_ap_3d_R40"] == pytest.approx(1.0)
