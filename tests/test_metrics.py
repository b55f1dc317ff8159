"""Metric tests (reference training/utils/test_metrics_bbox.py:1-26 covers
bbox extraction incl. nested answers; we extend to IoU/caption scores)."""
import numpy as np
import pytest

from lvv_tpu.train.metrics import (bleu4, cider, extract_boxes,
                                   extract_class, bev_iou, grounding_metrics,
                                   metrics_by_template)


def test_extract_single_box():
    text = "The car is at [1.0, 2.5, -0.3, 4.2, 1.9, 1.6, 0.78]."
    boxes = extract_boxes(text)
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0], [1.0, 2.5, -0.3, 4.2, 1.9, 1.6,
                                          0.78])


def test_extract_nested_multi_box():
    text = ("Boxes: [[1,2,3,4,5,6,0.1], (2, 3, 4, 5, 6, 7, -0.2)] and "
            "another [9, 9, 9, 1, 1, 1, 3.14]")
    boxes = extract_boxes(text)
    assert len(boxes) == 3


def test_extract_ignores_wrong_arity():
    assert extract_boxes("point [1, 2, 3] and pair (4, 5)") == []


def test_extract_class():
    assert extract_class("A red car near a pedestrian") == "car"
    assert extract_class("the traffic cone is orange") == "traffic_cone"
    assert extract_class("nothing here") is None


def test_bev_iou_identical():
    b = [0, 0, 0, 4, 2, 1.5, 0.3]
    assert bev_iou(b, b) == pytest.approx(1.0, abs=1e-5)


def test_bleu4_perfect_and_zero():
    assert bleu4(["the car is red"], ["the car is red"]) == pytest.approx(
        1.0, abs=1e-6)
    # disjoint text: only the smoothing epsilon survives
    assert bleu4(["xyz abc def ghi"], ["the car is red"]) < 0.2


def test_cider_orders_similarity():
    refs = ["a red car drives down the road"] * 2
    good = cider(["a red car drives down the road"], [refs[0]])
    bad = cider(["blue sky high above"], [refs[0]])
    assert good > bad >= 0.0


def test_grounding_metrics_end_to_end():
    preds = ["car at [1, 2, 0, 4, 2, 1.5, 0.0]",
             "bus at [0, 0, 0, 8, 3, 3, 0.0]"]
    refs = ["the car is at [1, 2, 0, 4, 2, 1.5, 0.0]",
            "truck at [5, 5, 0, 8, 3, 3, 0.0]"]
    m = grounding_metrics(preds, refs)
    assert m["top1_class_acc"] == 0.5
    assert 0.4 < m["bev_iou"] <= 1.0  # first pair perfect, second zero


def test_metrics_by_template_split():
    out = metrics_by_template(
        preds=["a car", "car [1,2,0,4,2,1,0]"],
        refs=["a car", "car [1,2,0,4,2,1,0]"],
        templates=["caption", "det_area"])
    assert "caption" in out and "grounding" in out
    assert out["caption"]["bleu4"] > 0.0
    assert out["grounding"]["top1_class_acc"] == 1.0


def test_caption_metrics_live():
    """End-to-end caption metrics with the REAL deps (pycocoevalcap SPICE
    needs Java, bert_score needs torch) — live inside the Docker image
    (docker/Dockerfile installs them); skipped where the deps are absent.
    The dep-gated wiring itself is covered by the fake-module tests."""
    import pytest

    from lvv_tpu.train.metrics import bertscore, bleu4, cider, spice

    cands = ["a car drives down the street", "two people crossing"]
    refs = ["a car is driving down the street", "two people cross the road"]
    b = bleu4(cands, refs)
    c = cider(cands, refs)
    assert 0.0 <= b <= 1.0 and c >= 0.0

    try:
        import pycocoevalcap  # noqa: F401
    except ImportError:
        pytest.skip("pycocoevalcap not installed (Docker image has it)")
    s = spice(cands, refs)
    assert s is None or 0.0 <= s <= 1.0

    try:
        import bert_score  # noqa: F401
    except ImportError:
        pytest.skip("bert_score not installed (Docker image has it)")
    f1 = bertscore(cands, refs)
    assert f1 is None or -1.0 <= f1 <= 1.0
