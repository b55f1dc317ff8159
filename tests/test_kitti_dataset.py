"""KITTI dataset: calib parsing, camera->lidar box conversion, pipeline."""
import numpy as np
import pytest

from lvv_tpu.data.detection_dataset import build_dataset
from lvv_tpu.data.kitti_dataset import (difficulty, label_to_lidar_box,
                                        parse_calib, parse_labels)


@pytest.fixture
def kitti_root(tmp_path, rng):
    for sub in ["velodyne", "label_2", "calib"]:
        (tmp_path / sub).mkdir()
    pts = rng.uniform(0, 40, (200, 4)).astype(np.float32)
    pts[:, 1] = rng.uniform(-20, 20, 200)
    pts[:, 2] = rng.uniform(-2, 1, 200)
    pts.tofile(tmp_path / "velodyne" / "000000.bin")
    # identity-ish calib: velo->cam swaps axes (x_cam = -y_velo,
    # y_cam = -z_velo, z_cam = x_velo) — the canonical KITTI layout
    tr = "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0"
    r0 = "R0_rect: 1 0 0 0 1 0 0 0 1"
    p2 = "P2: " + " ".join(["700", "0", "600", "0", "0", "700", "200", "0",
                            "0", "0", "1", "0"])
    (tmp_path / "calib" / "000000.txt").write_text(
        "\n".join([tr, r0, p2]))
    # one car 10m ahead (cam frame: z forward = 10, bottom y=1.6):
    # h=1.5 w=1.8 l=4.0
    (tmp_path / "label_2" / "000000.txt").write_text(
        "Car 0.0 0 0.0 100 150 200 250 1.5 1.8 4.0 0.0 1.6 10.0 0.1\n"
        "DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10\n")
    return tmp_path


def test_parse_and_convert(kitti_root):
    calib = parse_calib(kitti_root / "calib" / "000000.txt")
    rows = parse_labels(kitti_root / "label_2" / "000000.txt")
    assert len(rows) == 1  # DontCare dropped
    box = label_to_lidar_box(rows[0], calib)
    # cam (x=0, y=1.6 bottom, z=10 fwd) -> lidar (x=10 fwd, y=0, z=-1.6)
    np.testing.assert_allclose(box[0], 10.0, atol=1e-5)
    np.testing.assert_allclose(box[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(box[2], -1.6 + 0.75, atol=1e-5)  # center z
    np.testing.assert_allclose(box[3:6], [4.0, 1.8, 1.5], atol=1e-6)


def test_difficulty_buckets():
    easy = {"bbox": [0, 0, 0, 50], "occluded": 0, "truncated": 0.0}
    hard = {"bbox": [0, 0, 0, 30], "occluded": 2, "truncated": 0.4}
    ignore = {"bbox": [0, 0, 0, 10], "occluded": 3, "truncated": 0.9}
    assert difficulty(easy) == 0
    assert difficulty(hard) == 2
    assert difficulty(ignore) == -1


def test_kitti_dataset_pipeline(kitti_root):
    ds = build_dataset("Kitti", root=str(kitti_root), max_points=512,
                       max_gt=8)
    assert len(ds) == 1
    s = ds[0]
    assert s["points"].shape == (512, 4)
    assert int(s["gt_mask"].sum()) == 1
    assert s["gt_labels"][0] == 0  # Car


def test_lidar_box_to_camera_roundtrip(tmp_path):
    """lidar_box_to_camera must invert label_to_lidar_box exactly."""
    from lvv_tpu.data.kitti_dataset import (camera_box_to_imagebox,
                                            label_to_lidar_box,
                                            lidar_box_to_camera,
                                            write_kitti_results)
    import numpy as np
    calib = {
        "Tr_velo_to_cam": np.array(
            [[0, -1, 0, 0.1], [0, 0, -1, -0.2], [1, 0, 0, 0.3],
             [0, 0, 0, 1.0]], np.float64),
        "R0_rect": np.eye(4),
        "P2": np.array([[700.0, 0, 600, 45.0], [0, 700, 180, -0.3],
                        [0, 0, 1, 0.005]]),
    }
    row = {"dims_hwl": [1.5, 1.7, 4.2], "loc_cam": [2.0, 1.6, 15.0],
           "ry": 0.4}
    box = label_to_lidar_box(row, calib)
    loc, hwl, ry = lidar_box_to_camera(box, calib)
    np.testing.assert_allclose(loc, row["loc_cam"], atol=1e-5)
    np.testing.assert_allclose(hwl, row["dims_hwl"], atol=1e-6)
    assert ry == pytest.approx(row["ry"], abs=1e-6)
    # image bbox: finite, ordered, clipped
    bbox = camera_box_to_imagebox(loc, hwl, ry, calib,
                                  image_shape=(375, 1242))
    assert bbox[0] < bbox[2] and bbox[1] < bbox[3]
    assert bbox[0] >= 0 and bbox[3] <= 374
    # submission writer emits the 16-field KITTI label line
    path = write_kitti_results("000123", box[None, :7], [0.77], ["Car"],
                               calib, tmp_path, image_shape=(375, 1242))
    fields = path.read_text().split()
    assert len(fields) == 16
    assert fields[0] == "Car" and float(fields[15]) == 0.77
    np.testing.assert_allclose(
        [float(x) for x in fields[8:11]], row["dims_hwl"], atol=1e-4)
    np.testing.assert_allclose(
        [float(x) for x in fields[11:14]], row["loc_cam"], atol=1e-4)


def test_kitti_imagesets_split(tmp_path):
    """ImageSets/<split>.txt selection (reference kitti_dataset.set_split)."""
    from lvv_tpu.data.kitti_dataset import KittiDetection
    import numpy as np
    root = tmp_path / "training"
    (root / "velodyne").mkdir(parents=True)
    for i in range(3):
        np.zeros((10, 4), np.float32).tofile(
            root / "velodyne" / f"{i:06d}.bin")
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "val.txt").write_text("000001\n")
    ds = KittiDetection(str(root), split="val", max_points=16, max_gt=4)
    assert ds.ids == ["000001"]
    # no split -> every velodyne frame
    ds_all = KittiDetection(str(root), max_points=16, max_gt=4)
    assert len(ds_all.ids) == 3
