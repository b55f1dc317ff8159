"""Visualization helpers (pure-numpy half; rerun calls gated)."""
import numpy as np

from lvv_tpu.viz import normalize_box_convention
from lvv_tpu.viz.rerun_viz import filter_predictions


def test_centerpoint_convention_swap():
    b = np.array([[1, 2, 0, 2.0, 4.0, 1.5, 0.0]], np.float32)
    out = normalize_box_convention(b, "centerpoint")
    assert out[0, 3] == 4.0 and out[0, 4] == 2.0      # w/l swapped
    assert abs(out[0, 6] - np.pi / 2) < 1e-6           # yaw offset
    same = normalize_box_convention(b, "pcdet")
    np.testing.assert_array_equal(same, b)


def test_filter_predictions():
    boxes = np.array([[0, 0, 0, 1, 1, 1, 0],
                      [50, 0, 0, 1, 1, 1, 0],
                      [1, 1, 0, 1, 1, 1, 0]], np.float32)
    scores = np.array([0.9, 0.8, 0.2])
    labels = np.array([0, 1, 0])
    b, s, l = filter_predictions(boxes, scores, labels, score_thresh=0.5)
    assert len(b) == 2
    b, s, l = filter_predictions(boxes, scores, labels, max_radius=10)
    assert len(b) == 2
    b, s, l = filter_predictions(boxes, scores, labels, keep_labels=[0])
    assert len(b) == 2
    b, s, l = filter_predictions(boxes, scores, labels, top_k=1)
    assert len(b) == 1 and s[0] == 0.9
