"""Detection dataset pipeline tests (Custom family, fixed-shape contract)."""
import numpy as np
import pytest

from lvv_tpu.data.detection_dataset import (CustomDetection,
                                            DetectionDatasetBase,
                                            build_dataset,
                                            mask_points_by_range, pad_boxes)


@pytest.fixture
def custom_root(tmp_path, rng):
    for i in range(3):
        pts = rng.uniform(-10, 10, (50, 4)).astype(np.float32)
        pts.tofile(tmp_path / f"scan{i}.pcd.bin")  # N x 4 raw... use npy
    # npy variant with boxes
    np.save(tmp_path / "scene.npy",
            rng.uniform(-10, 10, (64, 4)).astype(np.float32))
    rows = np.zeros((2, 10), np.float32)
    rows[0, :9] = [0, 0, 0, 4, 2, 1.5, 0.2, 0, 0]
    rows[1, :9] = [5, 5, 0, 2, 2, 1.0, 0.0, 0, 0]
    rows[:, 9] = [0, 2]
    np.save(tmp_path / "scene.boxes.npy", rows)
    return tmp_path


def test_mask_points_by_range(rng):
    pts = np.array([[0, 0, 0, 1], [100, 0, 0, 1], [0, -100, 0, 1]],
                   np.float32)
    out = mask_points_by_range(pts, (-50, -50, -5, 50, 50, 3))
    assert len(out) == 1


def test_pad_boxes_empty():
    b, l, m = pad_boxes(np.zeros((0, 9), np.float32),
                        np.zeros((0,), np.int32), 4)
    assert b.shape == (4, 9) and not m.any()


def test_custom_dataset_fixed_shapes(custom_root):
    ds = build_dataset("Custom", root=str(custom_root),
                       point_range=(-20, -20, -5, 20, 20, 5),
                       max_points=128, max_gt=8)
    assert len(ds) == 4  # 3 pcd.bin + 1 npy (boxes file excluded)
    npy_idx = next(i for i, f in enumerate(ds.files)
                   if f.suffix == ".npy")
    s = ds[npy_idx]
    assert s["points"].shape == (128, 4)
    assert int(s["num_points"]) == 64
    assert s["gt_mask"].sum() == 2
    assert s["gt_labels"][:2].tolist() == [0, 2]

    batch = DetectionDatasetBase.collate([ds[0], ds[npy_idx]])
    assert batch["points"].shape == (2, 128, 4)
    assert batch["gt_boxes"].shape == (2, 8, 9)
    assert len(batch["tokens"]) == 2


def test_augmented_sample_valid(custom_root):
    ds = build_dataset("Custom", root=str(custom_root),
                       point_range=(-20, -20, -5, 20, 20, 5),
                       max_points=128, max_gt=8, augment=True)
    npy_idx = next(i for i, f in enumerate(ds.files) if f.suffix == ".npy")
    s = ds[npy_idx]
    assert np.isfinite(s["points"]).all()
    assert s["gt_mask"].sum() == 2


def test_balanced_resample():
    from lvv_tpu.data.detection_dataset import balanced_resample_indices
    labels = [np.asarray([0]), np.asarray([0]), np.asarray([0]),
              np.asarray([1]), np.asarray([0, 2])]
    idx = balanced_resample_indices(labels, num_classes=3, seed=0)
    counts = {c: 0 for c in range(3)}
    for i in idx:
        for c in set(labels[i].tolist()):
            counts[c] += 1
    # rare classes upsampled to comparable representation
    assert counts[1] > 0 and counts[2] > 0
    assert counts[1] >= len([i for i in range(5) if 1 in labels[i]])
