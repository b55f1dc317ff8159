"""Lyft/Pandaset/Argo2 loaders + Lyft mAP eval (reference
lyft_dataset.py + lyft_mAP_eval/lyft_eval.py, pandaset_dataset.py,
argo2_dataset.py)."""
import numpy as np
import pytest

from lvv_tpu.data.detection_dataset import build_dataset
from lvv_tpu.train.lyft_eval import evaluate as lyft_evaluate
from lvv_tpu.train.lyft_eval import get_ap


def box7(x, y, z=0.0, dx=4.0, dy=2.0, dz=1.5, yaw=0.0):
    return [x, y, z, dx, dy, dz, yaw]


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_get_ap_voc_envelope():
    # perfect ranking: two TPs -> AP 1
    assert get_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0])) == \
        pytest.approx(1.0)
    # FP first (precision dips then recovers): envelope carries max right
    ap = get_ap(np.array([0.0, 0.5, 1.0]), np.array([0.0, 0.5, 2 / 3]))
    assert ap == pytest.approx(2 / 3, abs=1e-9)


def test_lyft_eval_threshold_average():
    gt = [{"sample_token": "s0", "name": np.array(["car"]),
           "boxes": np.array([box7(0, 0)], np.float32)}]
    # slightly offset prediction: passes low IoU thresholds, fails high
    pred = [{"sample_token": "s0", "name": np.array(["car"]),
             "boxes": np.array([box7(0.35, 0)], np.float32),
             "score": np.array([0.9])}]
    res = lyft_evaluate(gt, pred, ["car", "bus"])
    assert 0.0 < res["car/AP"] < 1.0      # some thresholds pass, some fail
    assert "bus/AP" not in res            # no bus gt -> class skipped
    perfect = [{"sample_token": "s0", "name": np.array(["car"]),
                "boxes": np.array([box7(0, 0)], np.float32),
                "score": np.array([0.9])}]
    res2 = lyft_evaluate(gt, perfect, ["car"])
    assert res2["car/AP"] == pytest.approx(1.0)
    assert res2["mAP"] == pytest.approx(1.0)


def test_lyft_dataset_loader(tmp_path):
    pts = np.zeros((3, 5), np.float32)
    pts[:, :3] = [[1, 1, 0]] * 3
    f = tmp_path / "lidar.bin"
    pts.tofile(f)
    infos = [{"token": "t0", "lidar_path": str(f), "sweeps": [],
              "gt_names": np.array(["car", "unknown_thing"]),
              "gt_boxes": np.array([box7(1, 1), box7(5, 5)], np.float32)}]
    ds = build_dataset("Lyft", infos=infos,
                       point_range=(-54, -54, -5, 54, 54, 3),
                       max_points=16, max_gt=4)
    s = ds[0]
    assert int(s["num_points"]) == 3
    assert s["points"].shape == (16, 5)   # time-lag channel appended
    assert int(s["gt_mask"].sum()) == 1   # unknown class filtered
    assert s["gt_labels"][0] == ds.CLASSES.index("car")


def test_pandaset_dataset_loader(tmp_path):
    pts = np.zeros((4, 4), np.float32)
    pts[:, 0] = [1, 2, 3, 4]
    np.save(tmp_path / "f0.npy", pts)
    infos = [{"lidar_path": str(tmp_path / "f0.npy"), "sequence": 3,
              "frame_idx": 7,
              "gt_names": np.array(["Car"]),
              "gt_boxes": np.array([box7(2, 0)], np.float32)}]
    ds = build_dataset("Pandaset", infos=infos,
                       point_range=(-54, -54, -5, 54, 54, 3),
                       max_points=8, max_gt=4)
    s = ds[0]
    assert s["token"] == "3_7"
    assert int(s["num_points"]) == 4
    assert s["gt_labels"][0] == ds.CLASSES.index("Car")


def test_argo2_dataset_loader(tmp_path):
    (tmp_path / "velodyne").mkdir()
    pts = np.zeros((5, 4), np.float32)
    pts[:, 1] = np.arange(5)
    pts.tofile(tmp_path / "velodyne" / "42.bin")
    infos = [{"sample_idx": 42,
              "annos": {"name": np.array(["Bus", "Dog"]),
                        "gt_boxes_lidar": np.array(
                            [box7(0, 2, dx=10, dy=3, dz=3), box7(9, 9)],
                            np.float32)}}]
    ds = build_dataset("Argo2", dataroot=str(tmp_path), infos=infos,
                       point_range=(-54, -54, -5, 54, 54, 3),
                       max_points=8, max_gt=4)
    s = ds[0]
    assert int(s["num_points"]) == 5
    assert int(s["gt_mask"].sum()) == 1   # unmapped class dropped
    assert s["gt_labels"][0] == ds.CLASSES.index("Bus")
