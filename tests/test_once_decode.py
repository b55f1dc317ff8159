"""ONCE offline info-builder tests (fabricated raw archive).

Reference semantics: pcdet/datasets/once/once_dataset.py:155-292 —
sequence JSON walk, prev/next chaining, zero-box frame skip,
num_points_in_gt via box containment.
"""
import json
import pickle

import numpy as np

from lvv_tpu.data import once_decode as odec


def _write_once(tmp_path):
    root = tmp_path / "once"
    seq = root / "data" / "000027"
    (seq / "lidar_roof").mkdir(parents=True)
    # two frames; second has annos with one box holding 3 points
    pts = np.zeros((10, 4), np.float32)
    pts[:3, :3] = [10.0, 0.0, 1.0]            # inside the box
    pts[3:, :3] = [-20.0, 5.0, 0.0]
    for fid in ("1616000000100", "1616000000200"):
        pts.astype(np.float32).tofile(seq / "lidar_roof" / f"{fid}.bin")
    seq_json = {
        "meta_info": {"weather": "sunny", "period": "morning"},
        "calib": {"cam01": {
            "cam_to_velo": np.eye(4).tolist(),
            "cam_intrinsic": np.eye(3).tolist(),
            "distortion": [0.0] * 5}},
        "frames": [
            {"frame_id": "1616000000100",
             "pose": [1, 0, 0, 0, 0, 0, 0]},
            {"frame_id": "1616000000200",
             "pose": [1, 0, 0, 0, 2, 0, 0],
             "annos": {
                 "names": ["Car", "Pedestrian"],
                 "boxes_3d": [[10.0, 0.0, 1.0, 4.0, 2.0, 1.5, 0.1],
                              [-20.0, 5.0, 0.0, 0.7, 0.7, 1.7, 0.0]],
                 "boxes_2d": {"cam01": [[0, 0, 10, 10],
                                        [20, 20, 30, 30]]}}},
        ],
    }
    (seq / "000027.json").write_text(json.dumps(seq_json))
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text("000027\n")
    return root


def test_once_infos_schema_and_point_counts(tmp_path):
    root = _write_once(tmp_path)
    infos = odec.get_infos(root, split="train")
    assert len(infos) == 2
    assert infos[0]["frame_id"] == "1616000000100"
    assert infos[0]["next_id"] == "1616000000200"
    assert infos[1]["prev_id"] == "1616000000100"
    assert "annos" not in infos[0]
    annos = infos[1]["annos"]
    assert list(annos["name"]) == ["Car", "Pedestrian"]
    assert annos["boxes_3d"].shape == (2, 7)
    # 3 fabricated points sit in the car box, 7 in the pedestrian column
    assert annos["num_points_in_gt"][0] == 3
    assert annos["num_points_in_gt"][1] == 7
    assert infos[1]["calib"]["cam01"]["cam_intrinsic"].shape == (3, 3)


def test_once_zero_box_frame_skipped(tmp_path):
    root = _write_once(tmp_path)
    seq_json = json.loads(
        (root / "data" / "000027" / "000027.json").read_text())
    seq_json["frames"][1]["annos"]["names"] = []
    seq_json["frames"][1]["annos"]["boxes_3d"] = []
    (root / "data" / "000027" / "000027.json").write_text(
        json.dumps(seq_json))
    infos = odec.get_infos(root, split="train")
    assert [i["frame_id"] for i in infos] == ["1616000000100"]


def test_once_feeds_loader_and_cli(tmp_path, monkeypatch):
    from lvv_tpu.data.detection_dataset import ONCEDetection
    root = _write_once(tmp_path)
    save = tmp_path / "proc"

    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "create_once_infos_cli",
        str(pathlib.Path(__file__).resolve().parents[1] / "tools"
            / "create_once_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr("sys.argv", [
        "create_once_infos.py", "--raw-dir", str(root), "--save-dir",
        str(save), "--splits", "train", "--with-gt-db",
        "--gt-db-min-points", "1"])
    assert mod.main() == 0
    db = pickle.loads((save / "once_gt_database_train.pkl").read_bytes())
    assert len(db["classes"]["Car"]) == 1
    infos = pickle.loads((save / "once_infos_train.pkl").read_bytes())
    ds = ONCEDetection(dataroot=str(root / "data"), infos=infos,
                       point_range=(-75, -75, -5, 75, 75, 5),
                       max_points=32, max_gt=4)
    s = ds[1]
    assert int(s["gt_mask"].sum()) == 2
    assert int(s["num_points"]) == 10
