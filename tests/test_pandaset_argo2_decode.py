"""Devkit-free Pandaset / Argo2 offline decoder tests.

Fabricates raw archives in their native byte formats (gzip'd pandas
pickles for Pandaset, Arrow feather for Argo2) and checks the decoders
against hand-derived geometry, then feeds the outputs through the online
dataset loaders. Reference semantics:
pcdet/datasets/pandaset/pandaset_dataset.py:133-254 (quaternion
ego transforms + normative axis swap) and
pcdet/datasets/argo2/argo2_dataset.py:19-167 (segment walk, LABEL_ATTR
cuboids, quat_to_yaw).
"""
import gzip
import json
import pickle

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from lvv_tpu.data import pandaset_decode as pdec  # noqa: E402
from lvv_tpu.data import argo2_decode as adec  # noqa: E402


# ------------------------------------------------------------- pandaset

def _quat_z(yaw):
    return dict(w=float(np.cos(yaw / 2)), x=0.0, y=0.0,
                z=float(np.sin(yaw / 2)))


def test_quat_to_rot_matches_yaw_matrix():
    yaw = 0.9
    q = _quat_z(yaw)
    R = pdec.quat_to_rot((q["w"], q["x"], q["y"], q["z"]))
    expect = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                       [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
    np.testing.assert_allclose(R, expect, atol=1e-12)


def test_lidar_points_to_ego_roundtrip():
    pose = dict(position=dict(x=5.0, y=-2.0, z=1.0), heading=_quat_z(0.6))
    pts = np.random.default_rng(0).normal(size=(10, 3))
    ego = pdec.lidar_points_to_ego(pts, pose)
    back = pdec.ego_to_lidar_points(ego, pose)
    np.testing.assert_allclose(back, pts, atol=1e-10)
    # a point at the ego origin maps to the pose position
    np.testing.assert_allclose(
        pdec.ego_to_lidar_points(np.zeros((1, 3)), pose)[0], (5, -2, 1))


def test_zrot_world_to_ego():
    # ego yawed by +yaw in world: its y axis bears yaw from world-y, and
    # zrot is defined so that ego_yaw = world_yaw + zrot.
    yaw = 0.5
    pose = dict(position=dict(x=0, y=0, z=0), heading=_quat_z(yaw))
    assert pdec.zrot_world_to_ego(pose) == pytest.approx(-yaw, abs=1e-9)


def _write_pandaset(tmp_path, yaw=0.0, pos=(0.0, 0.0, 0.0)):
    root = tmp_path / "panda"
    seq = root / "dataset" / "011"
    (seq / "lidar").mkdir(parents=True)
    (seq / "annotations" / "cuboids").mkdir(parents=True)
    pose = dict(position=dict(x=pos[0], y=pos[1], z=pos[2]),
                heading=_quat_z(yaw))
    (seq / "lidar" / "poses.json").write_text(json.dumps([pose]))
    # world-frame points: one ahead of ego (+y in pandaset ego), one right
    ego_pts = np.array([[0.0, 10.0, 1.0], [3.0, 0.0, 0.5]])
    world = pdec.ego_to_lidar_points(ego_pts, pose)
    df = pd.DataFrame(dict(x=world[:, 0], y=world[:, 1], z=world[:, 2],
                           i=[255.0, 127.5], t=[0.0, 0.0], d=[0, 1]))
    with gzip.open(seq / "lidar" / "00.pkl.gz", "wb") as f:
        pickle.dump(df, f)
    # one cuboid 10 m ahead of ego (pandaset-ego +y), world-frame record
    center_world = pdec.ego_to_lidar_points(
        np.array([[0.0, 10.0, 1.0]]), pose)[0]
    cub = pd.DataFrame({
        "label": ["Pickup Truck", "Pedestrian"],
        "yaw": [0.2, 0.0],
        "position.x": [center_world[0], center_world[0]],
        "position.y": [center_world[1], center_world[1]],
        "position.z": [center_world[2], center_world[2]],
        "dimensions.x": [2.0, 0.8],        # pandaset dx = width
        "dimensions.y": [5.0, 0.8],        # pandaset dy = length
        "dimensions.z": [1.8, 1.7],
        "cuboids.sensor_id": [-1, 1],      # second seen only by pandarGT
    })
    with gzip.open(seq / "annotations" / "cuboids" / "00.pkl.gz",
                   "wb") as f:
        pickle.dump(cub, f)
    return root, pose


def test_pandaset_decode_points_normative_frame(tmp_path):
    root, pose = _write_pandaset(tmp_path, yaw=0.7, pos=(12.0, -3.0, 0.8))
    pts = pdec.decode_points(
        root / "dataset" / "011" / "lidar" / "00.pkl.gz", pose, device=0)
    # device filter keeps only the d==0 row
    assert pts.shape == (1, 4)
    # pandaset-ego (0, 10, 1) -> normative (10, 0, 1); intensity 255->1.0
    np.testing.assert_allclose(pts[0], (10.0, 0.0, 1.0, 1.0), atol=1e-5)
    both = pdec.decode_points(
        root / "dataset" / "011" / "lidar" / "00.pkl.gz", pose, device=-1)
    assert both.shape == (2, 4)
    np.testing.assert_allclose(both[1], (0.0, -3.0, 0.5, 0.5), atol=1e-5)


def test_pandaset_decode_cuboids(tmp_path):
    yaw = 0.7
    root, pose = _write_pandaset(tmp_path, yaw=yaw, pos=(1.0, 2.0, 0.0))
    boxes, names = pdec.decode_cuboids(
        root / "dataset" / "011" / "annotations" / "cuboids" / "00.pkl.gz",
        pose, device=0, category_map=pdec.TRAINING_CATEGORIES)
    # sensor_id==1 cuboid dropped for device 0; category mapped
    assert list(names) == ["Car"]
    np.testing.assert_allclose(boxes[0, :3], (10.0, 0.0, 1.0), atol=1e-5)
    # dims swap: normative dx = pandaset dy (length)
    np.testing.assert_allclose(boxes[0, 3:6], (5.0, 2.0, 1.8), atol=1e-6)
    assert boxes[0, 6] == pytest.approx(0.2 - yaw, abs=1e-6)


def test_pandaset_sequence_and_loader(tmp_path):
    from lvv_tpu.data.detection_dataset import PandasetDetection
    root, _ = _write_pandaset(tmp_path)
    save = tmp_path / "proc"
    splits = pdec.create_infos(root, save, {"train": ["011", "999"]})
    infos = splits["train"]
    assert len(infos) == 1
    assert (save / "011" / "00.npy").exists()
    assert (save / "pandaset_infos_train.pkl").exists()
    assert infos[0]["gt_names"][0] == "Car"
    # idempotency: re-decode with the raw dir gone
    import shutil
    shutil.rmtree(root)
    infos2 = pdec.create_infos(root, save, {"train": ["011"]})["train"]
    assert len(infos2) == 1
    ds = PandasetDetection(dataroot=str(save), infos=infos,
                           classes=("Car",),
                           point_range=(-70, -40, -3, 70, 40, 1),
                           max_points=16, max_gt=4)
    s = ds[0]
    assert int(s["gt_mask"].sum()) == 1
    assert int(s["num_points"]) == 1


# --------------------------------------------------------------- argo2

def test_quat_yaw_roundtrip():
    yaws = np.array([-2.5, 0.0, 0.3, 3.0])
    np.testing.assert_allclose(adec.quat_to_yaw(adec.yaw_to_quat(yaws)),
                               yaws, atol=1e-12)
    # non-unit-norm robustness: scaling the quaternion keeps the yaw
    q = adec.yaw_to_quat(np.array([0.8])) * 3.0
    np.testing.assert_allclose(adec.quat_to_yaw(q / 3.0),
                               adec.quat_to_yaw(q / 3.0))


def _write_argo2(tmp_path):
    root = tmp_path / "av2" / "sensor"
    seg = root / "train" / "seg-aaa"
    (seg / "sensors" / "lidar").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for ts in (315970000000000000, 315970000100000000):
        df = pd.DataFrame(dict(
            x=rng.normal(size=50).astype(np.float32),
            y=rng.normal(size=50).astype(np.float32),
            z=rng.normal(size=50).astype(np.float32),
            intensity=rng.uniform(0, 255, 50).astype(np.float32),
            laser_number=np.zeros(50, np.uint8)))
        adec.write_feather(df, seg / "sensors" / "lidar" / f"{ts}.feather")
    yaw = 0.4
    q = adec.yaw_to_quat(np.array([yaw]))[0]
    anno = pd.DataFrame({
        "timestamp_ns": [315970000000000000, 315970000000000000,
                         315970000100000000],
        "category": ["REGULAR_VEHICLE", "PEDESTRIAN", "REGULAR_VEHICLE"],
        "num_interior_pts": [25, 0, 9],
        "tx_m": [10.0, 1.0, 11.0], "ty_m": [2.0, 1.0, 2.5],
        "tz_m": [0.8, 1.0, 0.8],
        "length_m": [4.6, 0.7, 4.6], "width_m": [1.9, 0.7, 1.9],
        "height_m": [1.6, 1.8, 1.6],
        "qw": [q[0]] * 3, "qx": [0.0] * 3, "qy": [0.0] * 3,
        "qz": [q[3]] * 3,
    })
    adec.write_feather(anno, seg / "annotations.feather")
    return tmp_path / "av2", yaw


def test_argo2_prepare_and_decode(tmp_path):
    root, yaw = _write_argo2(tmp_path)
    out = tmp_path / "proc"
    by_split = adec.create_argo2_infos(root, out, splits=("train",))
    infos = by_split["train"]
    assert len(infos) == 2
    assert infos[0]["sample_idx"] == "0000000"
    assert infos[1]["sample_idx"] == "0000001"
    annos = infos[0]["annos"]
    # zero-interior-point box dropped (reference :68)
    assert list(annos["name"]) == ["Regular_vehicle"]
    assert annos["gt_boxes_lidar"].shape == (1, 7)
    np.testing.assert_allclose(annos["gt_boxes_lidar"][0, :3],
                               (10.0, 2.0, 0.8), atol=1e-6)
    assert annos["rotation_y"][0] == pytest.approx(yaw, abs=1e-9)
    pts = np.fromfile(out / "training" / "velodyne" / "0000000.bin",
                      np.float32).reshape(-1, 4)
    assert pts.shape == (50, 4)
    # pickle exists and round-trips
    loaded = pickle.loads((out / "argo2_infos_train.pkl").read_bytes())
    assert len(loaded) == 2


def test_argo2_feeds_loader(tmp_path):
    from lvv_tpu.data.detection_dataset import Argo2Detection
    root, _ = _write_argo2(tmp_path)
    out = tmp_path / "proc"
    infos = adec.create_argo2_infos(root, out, splits=("train",))["train"]
    ds = Argo2Detection(dataroot=str(out), infos=infos,
                        point_range=(-75, -75, -3, 75, 75, 3),
                        max_points=64, max_gt=4)
    s = ds[0]
    assert int(s["gt_mask"].sum()) == 1
    assert s["points"].shape == (64, 4)


def test_argo2_cli(tmp_path, monkeypatch):
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "create_argo2_infos_cli",
        str(pathlib.Path(__file__).resolve().parents[1] / "tools"
            / "create_argo2_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root, _ = _write_argo2(tmp_path)
    out = tmp_path / "cli_out"
    monkeypatch.setattr("sys.argv", [
        "create_argo2_infos.py", "--raw-dir", str(root), "--save-dir",
        str(out), "--splits", "train"])
    assert mod.main() == 0
    assert (out / "argo2_infos_train.pkl").exists()


def test_pandaset_cli(tmp_path, monkeypatch):
    import importlib.util, pathlib
    spec = importlib.util.spec_from_file_location(
        "create_pandaset_infos_cli",
        str(pathlib.Path(__file__).resolve().parents[1] / "tools"
            / "create_pandaset_infos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    root, _ = _write_pandaset(tmp_path)
    out = tmp_path / "cli_out"
    monkeypatch.setattr("sys.argv", [
        "create_pandaset_infos.py", "--raw-dir", str(root), "--save-dir",
        str(out), "--splits", "train", "--sequences", "011"])
    assert mod.main() == 0
    assert (out / "pandaset_infos_train.pkl").exists()


def test_argo2_format_results_roundtrip(tmp_path):
    root, yaw = _write_argo2(tmp_path)
    infos = adec.create_argo2_infos(root, tmp_path / "p",
                                    splits=("train",))["train"]
    outputs = [dict(name=["Regular_vehicle"],
                    boxes=np.array([[10.0, 2.0, 0.8, 4.6, 1.9, 1.6, yaw]]),
                    score=np.array([0.9])),
               dict(name=[], boxes=np.zeros((0, 7)), score=np.zeros(0))]
    out = tmp_path / "sub"
    dts = adec.format_results(outputs, infos, out_path=out)
    saved = adec.read_feather(tmp_path / "sub.feather")
    assert len(saved) == 1
    row = saved.iloc[0]
    assert row["category"] == "REGULAR_VEHICLE"
    assert row["log_id"] == "seg-aaa"
    np.testing.assert_allclose(
        [row["tx_m"], row["ty_m"], row["tz_m"]], (10.0, 2.0, 0.8))
    # quaternion encodes the yaw
    np.testing.assert_allclose(
        adec.quat_to_yaw(np.array([[row["qw"], row["qx"], row["qy"],
                                    row["qz"]]]))[0], yaw, atol=1e-9)
    assert len(dts) == 1


def test_pandaset_export_predictions_world_roundtrip(tmp_path):
    # decode a cuboid to normative, export it back: the world-frame
    # record must reproduce the original cuboid row
    yaw = 0.7
    root, pose = _write_pandaset(tmp_path, yaw=yaw, pos=(1.0, 2.0, 0.0))
    boxes, names = pdec.decode_cuboids(
        root / "dataset" / "011" / "annotations" / "cuboids" / "00.pkl.gz",
        pose, device=0, category_map=None)
    zrot = pdec.zrot_world_to_ego(pose)
    out = tmp_path / "preds" / "00.pkl.gz"
    df = pdec.export_predictions(boxes, [0.8], names, pose, zrot,
                                 save_path=out)
    assert out.exists()
    orig = pd.read_pickle(root / "dataset" / "011" / "annotations"
                          / "cuboids" / "00.pkl.gz")
    orig = orig[orig["cuboids.sensor_id"] != 1]
    np.testing.assert_allclose(df["position.x"], orig["position.x"],
                               atol=1e-6)
    np.testing.assert_allclose(df["position.y"], orig["position.y"],
                               atol=1e-6)
    np.testing.assert_allclose(df["dimensions.x"], orig["dimensions.x"])
    np.testing.assert_allclose(df["yaw"] % (2 * np.pi),
                               np.asarray(orig["yaw"]) % (2 * np.pi),
                               atol=1e-9)
    assert df["label"].iloc[0] == "Pickup Truck"
