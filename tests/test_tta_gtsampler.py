"""Double-flip TTA + gt-database sampler tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvv_tpu.data.gt_sampler import GTSampler, build_gt_database
from lvv_tpu.data.tta import double_flip_detect, flip_points, unflip_boxes


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_flip_roundtrip():
    boxes = jnp.asarray([[1.0, 2, 0, 4, 2, 1.5, 0.3, 1.0, -0.5]])
    for fx, fy in [(True, False), (False, True), (True, True)]:
        pts = jnp.asarray([[1.0, 2.0, 0.0, 0.5]])
        fp = flip_points(pts, fx, fy)
        fb = unflip_boxes(unflip_boxes(boxes, fx, fy), fx, fy)
        # double application of unflip = identity (mod 2pi heading)
        np.testing.assert_allclose(np.asarray(fb[0, :6]),
                                   np.asarray(boxes[0, :6]), atol=1e-5)
        d = np.asarray(fb[0, 6]) - np.asarray(boxes[0, 6])
        assert abs(np.sin(d / 2)) < 1e-5  # heading equal mod 2pi


def test_double_flip_detect_merges():
    from lvv_tpu.models.voxelnext import Detections

    def fake_detect(points, num_points):
        # "detector" that returns one box at the point centroid
        c = jnp.sum(points[:, :2], axis=0) / points.shape[0]
        box = jnp.concatenate([c, jnp.asarray([-1.0, 4, 2, 1.5, 0.0, 0, 0])])
        boxes = jnp.tile(box[None], (4, 1))
        return Detections(boxes=boxes, scores=jnp.asarray([0.9, 0, 0, 0]),
                          labels=jnp.zeros((4,), jnp.int32),
                          count=jnp.int32(1))

    pts = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (64, 4)).astype(np.float32)) + jnp.asarray([3.0, 2, 0, 0])
    d = double_flip_detect(fake_detect, pts, jnp.int32(64), post_max=8)
    assert int(d.count) >= 1
    kept = np.asarray(d.boxes[: int(d.count)])
    # all variants map back near the same centroid -> NMS merges to ~1 box
    assert int(d.count) <= 2
    assert np.allclose(kept[0, :2], [3.0, 2.0], atol=0.3)


class _TinyDS:
    def __init__(self, rng):
        self.rng = rng

    def __len__(self):
        return 2

    def __getitem__(self, i):
        pts = np.zeros((64, 4), np.float32)
        pts[:32, :3] = self.rng.uniform(-1, 1, (32, 3)) * 0.5  # inside box
        pts[32:, :3] = self.rng.uniform(5, 8, (32, 3))          # outside
        return {"points": pts, "num_points": np.int32(64),
                "gt_boxes": np.asarray([[0, 0, 0, 2, 2, 2, 0, 0, 0]],
                                       np.float32),
                "gt_labels": np.asarray([0], np.int32),
                "gt_mask": np.asarray([True])}


def test_gt_database_and_paste(tmp_path, rng):
    ds = _TinyDS(rng)
    db = build_gt_database(ds, tmp_path / "db.pkl", ["car", "bus"],
                           min_points=5)
    assert len(db["classes"]["car"]) == 2
    sampler = GTSampler(str(tmp_path / "db.pkl"), {"car": 3},
                        ["car", "bus"], seed=0)
    pts = np.full((10, 4), 50.0, np.float32)
    boxes = np.asarray([[50, 50, 0, 2, 2, 2, 0, 0, 0]], np.float32)
    labels = np.asarray([0], np.int32)
    p2, b2, l2 = sampler(pts, boxes, labels)
    assert len(b2) >= len(boxes)   # pasted up to quota
    assert len(p2) > len(pts)
    assert (l2 == 0).sum() >= 1


def test_gt_sampler_in_dataset_pipeline(tmp_path):
    """gt_sampler hook on DetectionDatasetBase: pasted objects appear in
    the fixed-shape sample (reference DataAugmentor gt_sampling step)."""
    import pickle
    import numpy as np
    from lvv_tpu.data.detection_dataset import CustomDetection
    from lvv_tpu.data.gt_sampler import GTSampler

    root = tmp_path / "scenes"
    root.mkdir()
    np.save(root / "a.npy",
            np.random.default_rng(0).uniform(-20, 20, (50, 4))
            .astype(np.float32))
    db = {"classes": {"car": [
        {"box": np.array([5, 5, 0, 4, 2, 1.5, 0.0, 0, 0], np.float32),
         "points": np.random.default_rng(1).uniform(-1, 1, (20, 4))
         .astype(np.float32)},
        {"box": np.array([-8, -8, 0, 4, 2, 1.5, 0.0, 0, 0], np.float32),
         "points": np.random.default_rng(2).uniform(-1, 1, (20, 4))
         .astype(np.float32)}]}, "min_points": 1}
    (tmp_path / "db.pkl").write_bytes(pickle.dumps(db))
    sampler = GTSampler(str(tmp_path / "db.pkl"), {"car": 2}, ["car"])
    ds = CustomDetection(str(root), point_range=(-50, -50, -5, 50, 50, 5),
                         max_points=128, max_gt=8, gt_sampler=sampler)
    s = ds[0]
    # 50 scene points + 2 pasted objects x 20 points (collision rejection
    # retries until both distinct db locations are used)
    assert int(s["num_points"]) == 90
    assert int(s["gt_mask"].sum()) == 2
    assert (s["gt_labels"][:2] == 0).all()
