"""Pooling + sampling op tests vs numpy oracles (contracts of the reference
CUDA extensions roiaware_pool3d / roipoint_pool3d / bev_pool / pointnet2)."""
import jax.numpy as jnp
import numpy as np

from lvv_tpu.ops.pool import (assign_points_to_boxes, bev_pool,
                              points_in_rotated_boxes, roiaware_pool3d,
                              roipoint_pool3d)
from lvv_tpu.ops.sampling import (ball_query, farthest_point_sample,
                                  group_points, knn, three_interpolate)


def test_points_in_rotated_boxes_axis_aligned():
    pts = jnp.asarray([[0.0, 0, 0], [1.9, 0, 0], [2.1, 0, 0], [0, 0, 0.6]])
    boxes = jnp.asarray([[0.0, 0, 0, 4, 2, 1, 0.0]])
    got = np.asarray(points_in_rotated_boxes(pts, boxes))[:, 0]
    assert got.tolist() == [True, True, False, False]


def test_points_in_rotated_boxes_heading():
    # box rotated 90 deg: dx=4 now spans y
    boxes = jnp.asarray([[0.0, 0, 0, 4, 2, 2, np.pi / 2]])
    pts = jnp.asarray([[1.9, 0, 0], [0, 1.9, 0]])
    got = np.asarray(points_in_rotated_boxes(pts, boxes))[:, 0]
    assert got.tolist() == [False, True]


def test_assign_points_first_box_wins():
    boxes = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0], [0.0, 0, 0, 4, 4, 4, 0]])
    pts = jnp.asarray([[0.0, 0, 0], [1.5, 0, 0], [10, 0, 0]])
    got = np.asarray(assign_points_to_boxes(pts, boxes))
    assert got.tolist() == [0, 1, -1]


def test_roiaware_pool_max_and_avg(rng):
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    feats = rng.normal(size=(64, 4)).astype(np.float32)
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    out_max = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                         jnp.asarray(boxes), grid=2,
                                         mode="max"))
    out_avg = np.asarray(roiaware_pool3d(jnp.asarray(pts), jnp.asarray(feats),
                                         jnp.asarray(boxes), grid=2,
                                         mode="avg"))
    assert out_max.shape == (1, 2, 2, 2, 4)
    # oracle: all points are inside the box; cell = octant
    for xi in range(2):
        for yi in range(2):
            for zi in range(2):
                sel = ((pts[:, 0] >= (xi - 1)) & (pts[:, 0] < xi)
                       & (pts[:, 1] >= (yi - 1)) & (pts[:, 1] < yi)
                       & (pts[:, 2] >= (zi - 1)) & (pts[:, 2] < zi))
                if sel.sum() == 0:
                    continue
                np.testing.assert_allclose(out_max[0, xi, yi, zi],
                                           feats[sel].max(0), atol=1e-5)
                np.testing.assert_allclose(out_avg[0, xi, yi, zi],
                                           feats[sel].mean(0), atol=1e-5)


def test_roipoint_pool3d():
    pts = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0], [0.6, 0, 0], [9, 9, 9]])
    feats = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    boxes = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0], [9, 9, 9, 0.5, 0.5, 0.5, 0]])
    out, empty = roipoint_pool3d(pts, feats, boxes, num_sampled=2)
    out = np.asarray(out)
    assert out.shape == (2, 2, 4)
    assert out[0, :, 3].tolist() == [1.0, 2.0]  # first two by input order
    assert out[1, 0, 3] == 4.0
    assert np.asarray(empty).tolist() == [False, False]


def test_bev_pool_matches_oracle(rng):
    n, c, bins = 100, 8, 16
    feats = rng.normal(size=(n, c)).astype(np.float32)
    ids = rng.integers(0, bins, n).astype(np.int32)
    valid = rng.random(n) > 0.2
    out = np.asarray(bev_pool(jnp.asarray(feats), jnp.asarray(ids),
                              jnp.asarray(valid), bins))
    for b in range(bins):
        sel = (ids == b) & valid
        np.testing.assert_allclose(out[b], feats[sel].sum(0), atol=1e-4)


def test_fps_spreads_points():
    # clustered points: FPS must pick one from each far cluster first
    pts = np.concatenate([np.zeros((10, 3)), np.ones((10, 3)) * 10,
                          np.array([[0, 10, 0]] * 10)]).astype(np.float32)
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 3))
    clusters = {idx[0] // 10, idx[1] // 10, idx[2] // 10}
    assert clusters == {0, 1, 2}
    assert idx[0] == 0  # starts at first valid (reference convention)


def test_fps_respects_valid_mask():
    pts = np.array([[0, 0, 0], [100, 0, 0], [0, 1, 0], [1, 0, 0]], np.float32)
    valid = jnp.asarray([True, False, True, True])
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 3, valid))
    assert 1 not in idx.tolist()


def test_ball_query():
    centers = jnp.asarray([[0.0, 0, 0]])
    pts = jnp.asarray([[0.1, 0, 0], [0.2, 0, 0], [5, 0, 0], [0.05, 0, 0]])
    idx, cnt = ball_query(centers, pts, radius=1.0, nsample=2)
    assert int(cnt[0]) == 2
    assert np.asarray(idx)[0].tolist() == [3, 0]  # nearest two


def test_ball_query_empty():
    centers = jnp.asarray([[100.0, 0, 0]])
    pts = jnp.asarray([[0.1, 0, 0]])
    idx, cnt = ball_query(centers, pts, radius=1.0, nsample=2)
    assert int(cnt[0]) == 0


def test_knn_and_interpolate():
    pts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [4, 4, 4]])
    feats = jnp.asarray([[1.0], [2.0], [10.0], [100.0]])
    q = jnp.asarray([[0.5, 0.0, 0.0]])
    d, idx = knn(q, pts, k=3)
    assert set(np.asarray(idx)[0].tolist()) == {0, 1, 2}
    out = three_interpolate(feats, idx, d)
    # oracle: w ∝ 1/d over d=[.5,.5,1.118] -> 0.409*1+0.409*2+0.183*10≈3.06
    assert float(out[0, 0]) == np.float32(3.0533228) or \
        abs(float(out[0, 0]) - 3.0533) < 1e-3
    g = group_points(feats, idx)
    assert g.shape == (1, 3, 1)
