"""Devkit-free nuScenes/Lyft table reader tests.

Fabricates a miniature nuScenes-schema archive (JSON tables + .pcd.bin
blobs) on disk and checks TableNuScenes against the devkit behaviors it
substitutes for: reverse indexes (sample.data / sample.anns /
sample_data.channel / sample_annotation.category_name), blob path
resolution, and that info building + sweep loading + the dataset classes
run end-to-end on top of it. Reference:
nuscenes-devkit NuScenes.__make_reverse_index__ semantics as consumed by
pcdet/datasets/nuscenes/nuscenes_utils.py:312-470 and
pcdet/datasets/lyft/lyft_utils.py:86-224.
"""
import json
import pickle

import numpy as np
import pytest

from lvv_tpu.data.nuscenes_tables import TableNuScenes
from lvv_tpu.data import nuscenes_utils as nu


def _quat_z(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _write_tables(tmp_path, version="v1.0-mini"):
    """1 scene, 2 keyframes 0.5 s apart, 1 intermediate sweep, 1 moving
    car annotated on both keyframes. Ego translates +2 m in x per 0.5 s.
    Sensor mounted 1 m forward of ego, no rotation."""
    root = tmp_path / "nusc"
    tdir = root / version
    tdir.mkdir(parents=True)
    t0 = 1_000_000_000_000_000

    def sd(tok, sample, fname, ts, key, prev, nxt):
        return dict(token=tok, sample_token=sample,
                    ego_pose_token=f"pose-{tok}",
                    calibrated_sensor_token="cs-lidar",
                    filename=fname, fileformat="pcd.bin",
                    is_key_frame=key, timestamp=ts, prev=prev, next=nxt)

    tables = {
        "sensor": [dict(token="sensor-lidar", channel="LIDAR_TOP",
                        modality="lidar"),
                   dict(token="sensor-camf", channel="CAM_FRONT",
                        modality="camera")],
        "calibrated_sensor": [dict(
            token="cs-lidar", sensor_token="sensor-lidar",
            translation=[1.0, 0.0, 1.8], rotation=_quat_z(0.0),
            camera_intrinsic=[]),
            dict(token="cs-camf", sensor_token="sensor-camf",
                 translation=[1.5, 0.0, 1.5], rotation=_quat_z(0.0),
                 camera_intrinsic=[[1000, 0, 800], [0, 1000, 450],
                                   [0, 0, 1]])],
        "category": [dict(token="cat-car", name="vehicle.car")],
        "instance": [dict(token="inst-1", category_token="cat-car",
                          nbr_annotations=2,
                          first_annotation_token="ann-1",
                          last_annotation_token="ann-2")],
        "log": [dict(token="log-1", logfile="", vehicle="v", date_captured="",
                     location="x")],
        "scene": [dict(token="scene-1", log_token="log-1", nbr_samples=2,
                       first_sample_token="samp-1",
                       last_sample_token="samp-2", name="scene-0001",
                       description="")],
        "sample": [
            dict(token="samp-1", timestamp=t0, prev="", next="samp-2",
                 scene_token="scene-1"),
            dict(token="samp-2", timestamp=t0 + 500_000, prev="samp-1",
                 next="", scene_token="scene-1"),
        ],
        "sample_data": [
            dict(token="sd-cam1", sample_token="samp-1",
                 ego_pose_token="pose-sd-1",
                 calibrated_sensor_token="cs-camf",
                 filename="samples/CAM_FRONT/c1.jpg", fileformat="jpg",
                 is_key_frame=True, timestamp=t0, prev="", next=""),
            sd("sd-1", "samp-1", "sweeps/LIDAR_TOP/f1.pcd.bin", t0,
               True, "", "sd-1b"),
            sd("sd-1b", "samp-1", "sweeps/LIDAR_TOP/f1b.pcd.bin",
               t0 + 250_000, False, "sd-1", "sd-2"),
            sd("sd-2", "samp-2", "sweeps/LIDAR_TOP/f2.pcd.bin",
               t0 + 500_000, True, "sd-1b", ""),
        ],
        "ego_pose": [
            dict(token="pose-sd-1", translation=[0.0, 0.0, 0.0],
                 rotation=_quat_z(0.0), timestamp=t0),
            dict(token="pose-sd-1b", translation=[1.0, 0.0, 0.0],
                 rotation=_quat_z(0.0), timestamp=t0 + 250_000),
            dict(token="pose-sd-2", translation=[2.0, 0.0, 0.0],
                 rotation=_quat_z(0.0), timestamp=t0 + 500_000),
        ],
        # car at global x=20 moving +4 m/s in x (annotation centers 2 m
        # apart over 0.5 s)
        "sample_annotation": [
            dict(token="ann-1", sample_token="samp-1",
                 instance_token="inst-1", attribute_tokens=[],
                 visibility_token="", translation=[20.0, 0.0, 1.0],
                 size=[2.0, 4.5, 1.6], rotation=_quat_z(0.3),
                 num_lidar_pts=30, num_radar_pts=2, prev="",
                 next="ann-2"),
            dict(token="ann-2", sample_token="samp-2",
                 instance_token="inst-1", attribute_tokens=[],
                 visibility_token="", translation=[22.0, 0.0, 1.0],
                 size=[2.0, 4.5, 1.6], rotation=_quat_z(0.3),
                 num_lidar_pts=28, num_radar_pts=1, prev="ann-1",
                 next=""),
        ],
    }
    for name, rows in tables.items():
        (tdir / f"{name}.json").write_text(json.dumps(rows))
    # blobs: float32 [N, 5] .pcd.bin
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for fname in ("f1", "f1b", "f2"):
        pts = rng.uniform(-30, 30, (100, 5)).astype(np.float32)
        pts[:, 4] = 0
        pts.tofile(root / "sweeps" / "LIDAR_TOP" / f"{fname}.pcd.bin")
    return root


def test_reverse_indexes(tmp_path):
    root = _write_tables(tmp_path)
    nusc = TableNuScenes("v1.0-mini", str(root))
    s1 = nusc.get("sample", "samp-1")
    assert s1["data"]["LIDAR_TOP"] == "sd-1"
    assert s1["anns"] == ["ann-1"]
    # non-keyframe sweeps don't land in sample.data
    assert nusc.get("sample", "samp-2")["data"]["LIDAR_TOP"] == "sd-2"
    assert nusc.get("sample_data", "sd-1b")["channel"] == "LIDAR_TOP"
    assert nusc.get("sample_annotation", "ann-1")["category_name"] == \
        "vehicle.car"
    assert nusc.get_sample_data_path("sd-1").endswith(
        "sweeps/LIDAR_TOP/f1.pcd.bin")
    assert len(nusc.sample) == 2 and len(nusc.scene) == 1


def test_missing_table_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        TableNuScenes("v1.0-mini", str(tmp_path))


def test_scene_splits(tmp_path):
    nusc = TableNuScenes("v1.0-mini", str(_write_tables(tmp_path)))
    train, val = nusc.scene_splits(["scene-0001"], ["scene-9999"])
    assert train == ["scene-1"] and val == []


def test_fill_trainval_infos_over_tables(tmp_path):
    root = _write_tables(tmp_path)
    nusc = TableNuScenes("v1.0-mini", str(root))
    train, val = nu.fill_trainval_infos(nusc, ["scene-1"], [],
                                        max_sweeps=3, dataroot=str(root))
    assert len(train) == 2 and not val
    info = train[1]                       # second keyframe has a sweep
    assert info["token"] == "samp-2"
    # category mapped vehicle.car -> car; box moved to the sensor frame:
    # global (22, 0, 1), ego at (2, 0, 0), sensor +1 m fwd, so x = 19
    assert info["gt_names"][0] == "car"
    np.testing.assert_allclose(info["gt_boxes"][0, :3], (19.0, 0.0, -0.8),
                               atol=1e-6)
    # dims wlh(2, 4.5, 1.6) -> lwh(4.5, 2, 1.6); velocity +4 m/s x
    np.testing.assert_allclose(info["gt_boxes"][0, 3:6], (4.5, 2.0, 1.6))
    np.testing.assert_allclose(info["gt_boxes"][0, 7:9], (4.0, 0.0),
                               atol=1e-6)
    # sweep list: the intermediate non-keyframe with ego-motion transform
    assert info["sweeps"][0]["sample_data_token"] == "sd-1b"
    tm = info["sweeps"][0]["transform_matrix"]
    # ego moved +1 m between sweep and keyframe; static sensor offset
    # cancels -> translation -1 in x
    np.testing.assert_allclose(tm[:3, 3], (-1.0, 0.0, 0.0), atol=1e-9)
    assert info["sweeps"][0]["time_lag"] == pytest.approx(0.25)


def test_detection_dataset_devkit_free(tmp_path):
    # `import nuscenes` fails in this image, so NuScenesDetection must
    # fall back to TableNuScenes transparently.
    from lvv_tpu.data.detection_dataset import NuScenesDetection
    root = _write_tables(tmp_path)
    ds = NuScenesDetection(dataroot=str(root), version="v1.0-mini",
                           sweeps=3,
                           point_range=(-54, -54, -5, 54, 54, 3),
                           max_points=512, max_gt=8)
    assert len(ds) == 2
    s = ds[1]
    assert s["points"].shape == (512, 5)
    # 3 sweeps of 100 points each (keyframe + 2 prev), minus any
    # ego-radius / range-cropped points
    assert 250 <= int(s["num_points"]) <= 300
    assert int(s["gt_mask"].sum()) == 1


def test_lyft_fill_and_loader(tmp_path):
    from lvv_tpu.data.detection_dataset import LyftDetection
    root = _write_tables(tmp_path, version="train_data")
    nusc = TableNuScenes("", str(root), table_dir=str(root / "train_data"))
    train, val = nu.fill_trainval_infos_lyft(
        nusc, ["scene-1"], [], max_sweeps=2, dataroot=str(root))
    assert len(train) == 2
    info = train[0]
    # raw category names kept (no nuScenes map)
    assert info["gt_names"][0] == "vehicle.car"
    assert info["gt_boxes"].shape == (1, 7)
    assert info["gt_boxes_velocity"].shape == (1, 3)
    # loader: class list must match the raw names to keep the box
    ds = LyftDetection(dataroot=str(root), infos=train, sweeps=2,
                       point_range=(-80, -80, -5, 80, 80, 3),
                       max_points=512, max_gt=8)
    ds.CLASSES = ("vehicle.car",)
    s = ds[0]
    assert int(s["gt_mask"].sum()) == 1


def test_create_nuscenes_infos_cli_devkit_free(tmp_path, monkeypatch):
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "create_nuscenes_infos_cli",
        str(pathlib.Path(__file__).resolve().parents[1] / "tools"
            / "create_nuscenes_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root = _write_tables(tmp_path)
    save = tmp_path / "out"
    # scene-0001 is not in the devkit mini split, so pass explicit splits
    splits = tmp_path / "splits.json"
    splits.write_text(json.dumps({"train": ["scene-0001"], "val": []}))
    monkeypatch.setattr("sys.argv", [
        "create_nuscenes_infos.py", "--dataroot", str(root), "--version",
        "v1.0-mini", "--save-dir", str(save), "--max-sweeps", "3",
        "--scene-splits", str(splits)])
    mod.main()
    infos = pickle.loads(
        (save / "nuscenes_infos_3sweeps_train.pkl").read_bytes())
    assert len(infos) == 2


def test_create_lyft_infos_cli(tmp_path, monkeypatch):
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "create_lyft_infos_cli",
        str(pathlib.Path(__file__).resolve().parents[1] / "tools"
            / "create_lyft_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root = _write_tables(tmp_path, version="train_data")
    save = tmp_path / "out"
    monkeypatch.setattr("sys.argv", [
        "create_lyft_infos.py", "--dataroot", str(root), "--save-dir",
        str(save)])
    assert mod.main() == 0
    infos = pickle.loads((save / "lyft_infos_train.pkl").read_bytes())
    assert len(infos) == 2


def test_make_nusc_handle_and_cam_paths(tmp_path):
    from lvv_tpu.data.dataset import MixedNuDataset, make_nusc_handle
    root = _write_tables(tmp_path)
    # find_version autodetects the table dir; devkit absent -> TableNuScenes
    handle = make_nusc_handle(str(root))
    assert isinstance(handle, TableNuScenes)
    assert make_nusc_handle(str(tmp_path / "nothing")) is None
    bev_dir = tmp_path / "bev"
    bev_dir.mkdir()
    np.save(bev_dir / "samp-1.npy", np.zeros((4, 6, 6), np.float16))
    qa = tmp_path / "cap.json"
    qa.write_text(json.dumps([{"sample_token": "samp-1",
                               "question": "What is ahead?",
                               "answer": "a car"}]))
    ds = MixedNuDataset(str(bev_dir), str(qa), str(tmp_path / "none.json"),
                        nusc=handle, dataroot=str(root))
    row = ds[0]
    paths = row["cam_paths"]
    assert paths[0].endswith("samples/CAM_FRONT/c1.jpg")
    # the other five views are missing -> None (zero-fill downstream)
    assert paths[1:] == [None] * 5


def test_box_sensor_to_global_roundtrip():
    # global -> sensor (box_global_to_sensor) -> global must be identity
    pose = dict(translation=[5.0, -2.0, 0.5], rotation=_quat_z(0.8))
    calib = dict(translation=[1.0, 0.2, 1.6], rotation=_quat_z(-0.3))
    center_g = np.array([20.0, 4.0, 1.0])
    q_g = _quat_z(1.1)
    vel_g = np.array([3.0, -1.0, 0.0])
    c_s, yaw_s, v_s = nu.box_global_to_sensor(center_g, q_g, pose, calib,
                                              velocity_global=vel_g)
    c_back, q_back, v_back = nu.box_sensor_to_global(
        c_s, yaw_s, pose, calib, velocity_sensor=v_s)
    np.testing.assert_allclose(c_back, center_g, atol=1e-9)
    np.testing.assert_allclose(nu.quaternion_yaw(q_back),
                               nu.quaternion_yaw(q_g), atol=1e-9)
    np.testing.assert_allclose(v_back, vel_g, atol=1e-9)


def test_det_attribute_heuristic():
    # reference transform_det_annos_to_nusc_annos:524-541
    assert nu._det_attribute("car", 1.0) == "vehicle.moving"
    assert nu._det_attribute("bicycle", 0.5) == "cycle.with_rider"
    assert nu._det_attribute("pedestrian", 0.0) == "pedestrian.standing"
    assert nu._det_attribute("bus", 0.1) == "vehicle.stopped"
    assert nu._det_attribute("car", 0.0) == "vehicle.parked"
    assert nu._det_attribute("trailer", 0.1) == "vehicle.parked"
    assert nu._det_attribute("barrier", 0.0) == "cycle.with_rider"


def test_write_nusc_results(tmp_path):
    root = _write_tables(tmp_path)
    nusc = TableNuScenes("v1.0-mini", str(root))
    # one detection: the gt box of samp-2 back in the sensor frame
    dets = [{"token": "samp-2",
             "boxes_lidar": np.array(
                 [[19.0, 0.0, -0.8, 4.5, 2.0, 1.6, 0.3, 4.0, 0.0]]),
             "score": np.array([0.9]),
             "name": np.array(["car"])}]
    out = nu.write_nusc_results(dets, nusc, tmp_path / "results.json")
    res = json.loads((tmp_path / "results.json").read_text())
    anno = res["results"]["samp-2"][0]
    # sensor (19, 0, -0.8) -> ego (20, 0, 1) -> global (22, 0, 1)
    np.testing.assert_allclose(anno["translation"], (22.0, 0.0, 1.0),
                               atol=1e-9)
    np.testing.assert_allclose(anno["size"], (2.0, 4.5, 1.6))
    np.testing.assert_allclose(anno["velocity"], (4.0, 0.0), atol=1e-9)
    assert anno["attribute_name"] == "vehicle.moving"
    assert anno["detection_name"] == "car"
    assert res["meta"]["use_lidar"] is True
    assert out["results"]["samp-2"][0]["detection_score"] == 0.9
