"""Rotated IoU / NMS tests: analytic cases + invariants (the reference's CUDA
kernels have no unit tests; these golden cases pin the geometry)."""
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.ops.boxes import (corners_bev, iou_3d, iou_aabb_bev, iou_bev,
                               limit_period, pairwise_overlap_bev)
from lvv_tpu.ops.nms import multi_class_nms, nms


def B(*rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_identical_boxes_iou_one():
    b = B([0, 0, 0, 4, 2, 1.5, 0.3])
    assert float(iou_bev(b, b)[0, 0]) == pytest.approx(1.0, abs=1e-5)
    assert float(iou_3d(b, b)[0, 0]) == pytest.approx(1.0, abs=1e-5)


def test_disjoint_boxes_iou_zero():
    a = B([0, 0, 0, 2, 2, 2, 0.0])
    b = B([10, 10, 0, 2, 2, 2, 1.0])
    assert float(iou_bev(a, b)[0, 0]) == 0.0
    assert float(iou_3d(a, b)[0, 0]) == 0.0


def test_axis_aligned_matches_aabb():
    a = B([0, 0, 0, 4, 2, 2, 0.0], [1, 1, 0, 2, 2, 2, 0.0])
    b = B([1, 0, 0, 4, 2, 2, 0.0], [5, 5, 0, 1, 1, 1, 0.0])
    np.testing.assert_allclose(np.asarray(iou_bev(a, b)),
                               np.asarray(iou_aabb_bev(a, b)), atol=1e-5)


def test_half_overlap_analytic():
    # two unit squares offset by 0.5 in x: inter=0.5, union=1.5
    a = B([0, 0, 0, 1, 1, 1, 0.0])
    b = B([0.5, 0, 0, 1, 1, 1, 0.0])
    assert float(iou_bev(a, b)[0, 0]) == pytest.approx(0.5 / 1.5, abs=1e-5)


@pytest.mark.fast
def test_rotated_45_analytic():
    # unit square vs itself rotated 45 deg about the same center:
    # intersection is a regular octagon, area = 2*(sqrt(2)-1)
    a = B([0, 0, 0, 1, 1, 1, 0.0])
    b = B([0, 0, 0, 1, 1, 1, np.pi / 4])
    inter = float(pairwise_overlap_bev(a, b)[0, 0])
    assert inter == pytest.approx(2 * (np.sqrt(2) - 1), abs=1e-4)


def test_heading_period_invariance():
    a = B([0, 0, 0, 3, 1.5, 1, 0.7])
    b = B([0.5, 0.2, 0, 2, 1, 1, 0.7 + np.pi])  # same rectangle shape
    b2 = B([0.5, 0.2, 0, 2, 1, 1, 0.7])
    np.testing.assert_allclose(np.asarray(iou_bev(a, b)),
                               np.asarray(iou_bev(a, b2)), atol=1e-4)


def test_iou_symmetry_and_bounds(rng):
    n, m = 12, 9
    boxes_a = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                        rng.uniform(-1, 1, n), rng.uniform(0.5, 4, n),
                        rng.uniform(0.5, 4, n), rng.uniform(0.5, 3, n),
                        rng.uniform(-np.pi, np.pi, n)], 1).astype(np.float32)
    boxes_b = np.stack([rng.uniform(-5, 5, m), rng.uniform(-5, 5, m),
                        rng.uniform(-1, 1, m), rng.uniform(0.5, 4, m),
                        rng.uniform(0.5, 4, m), rng.uniform(0.5, 3, m),
                        rng.uniform(-np.pi, np.pi, m)], 1).astype(np.float32)
    iou = np.asarray(iou_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    iou_t = np.asarray(iou_bev(jnp.asarray(boxes_b), jnp.asarray(boxes_a)))
    np.testing.assert_allclose(iou, iou_t.T, atol=1e-4)
    assert (iou >= -1e-6).all() and (iou <= 1 + 1e-6).all()
    # 3D IoU never exceeds BEV IoU scaled... just bounds check
    i3 = np.asarray(iou_3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    assert (i3 >= -1e-6).all() and (i3 <= 1 + 1e-6).all()


def test_corners_shape_and_extent():
    b = B([1, 2, 0, 4, 2, 1, 0.0])
    c = np.asarray(corners_bev(b))[0]
    assert c.shape == (4, 2)
    assert c[:, 0].min() == pytest.approx(-1.0)
    assert c[:, 0].max() == pytest.approx(3.0)
    assert c[:, 1].min() == pytest.approx(1.0)
    assert c[:, 1].max() == pytest.approx(3.0)


def test_limit_period():
    assert float(limit_period(jnp.float32(3 * np.pi / 2))) == pytest.approx(
        -np.pi / 2, abs=1e-6)


def test_nms_suppresses_overlaps():
    boxes = B([0, 0, 0, 2, 2, 2, 0.0],
              [0.1, 0, 0, 2, 2, 2, 0.0],     # heavy overlap with #0
              [10, 10, 0, 2, 2, 2, 0.0],
              [0, 0, 0, 2, 2, 2, 0.5])       # rotated overlap with #0
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    idx, count, kept = nms(boxes, scores, iou_thresh=0.2, pre_max=4,
                           post_max=4)
    assert int(count) == 2
    assert set(np.asarray(idx[:2]).tolist()) == {0, 2}
    assert np.asarray(idx[2:]).tolist() == [-1, -1]


def test_nms_keeps_score_order():
    boxes = B([0, 0, 0, 1, 1, 1, 0], [5, 5, 0, 1, 1, 1, 0],
              [10, 10, 0, 1, 1, 1, 0])
    scores = jnp.asarray([0.2, 0.9, 0.5])
    idx, count, kept = nms(boxes, scores, iou_thresh=0.5, pre_max=3,
                           post_max=3)
    assert int(count) == 3
    assert np.asarray(idx).tolist() == [1, 2, 0]


def test_nms_valid_mask():
    boxes = B([0, 0, 0, 1, 1, 1, 0], [5, 5, 0, 1, 1, 1, 0])
    scores = jnp.asarray([0.9, 0.8])
    idx, count, _ = nms(boxes, scores, iou_thresh=0.5, pre_max=2, post_max=2,
                        valid=jnp.asarray([True, False]))
    assert int(count) == 1 and int(idx[0]) == 0


def test_multi_class_nms_no_cross_class_suppression():
    boxes = B([0, 0, 0, 2, 2, 2, 0.0], [0.05, 0, 0, 2, 2, 2, 0.0])
    scores = jnp.asarray([0.9, 0.8])
    labels = jnp.asarray([0, 1])
    idx, count, _ = multi_class_nms(boxes, scores, labels, 2,
                                    iou_thresh=0.2, pre_max=2, post_max=2)
    assert int(count) == 2  # same location, different class -> both kept
