"""Devkit-free Pandaset pkl.gz -> npy/info decoder.

The reference consumes Pandaset online through the ``pandaset`` devkit +
pandas (pcdet/datasets/pandaset/pandaset_dataset.py:150-254: per-frame
``pd.read_pickle`` of world-frame points, devkit
``geometry.lidar_points_to_ego`` quaternion transforms, Pandaset-ego ->
normative axis swap).  Here that work happens once, offline: this module
reimplements the devkit's quaternion geometry in numpy and walks the raw
archive layout directly —

    <root>/dataset/<seq>/lidar/{NN}.pkl.gz         gzip'd pickled DataFrame
                                                   columns (x y z i t d)
    <root>/dataset/<seq>/lidar/poses.json          [{position{x,y,z},
                                                     heading{w,x,y,z}}, ...]
    <root>/dataset/<seq>/annotations/cuboids/{NN}.pkl.gz
                                                   position.* dimensions.*
                                                   yaw label cuboids.sensor_id

— emitting per-frame normative ego-frame ``[N, 4]`` float32 npy point
files plus info dicts carrying ``gt_boxes [G, 7]``/``gt_names`` for
:class:`lvv_tpu.data.detection_dataset.PandasetDetection`.

Geometry parity notes (all vs pandaset_dataset.py / devkit geometry.py):
- ego = R(q)^T (p_world - t); q is a scalar-first (wxyz) unit quaternion;
- normative = Pandaset-ego with (x, y) -> (y, -x) and box dims dx<->dy
  (Pandaset ego x points right / y forward; normative x forward / y left,
  pandaset_dataset.py:170-185);
- box yaw stays ``world_yaw + zrot_world_to_ego`` where zrot is the ego
  y-axis' world bearing, assuming negligible pitch (":216-233");
- intensity is normalized /255 (":155-168");
- LIDAR_DEVICE filtering: points keep ``d == device``; cuboids drop only
  ``sensor_id == 1 - device`` (":159,196") so shared boxes survive.
"""
from __future__ import annotations

import gzip
import json
import pathlib
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

# reference tools/cfgs/dataset_configs/pandaset_dataset.yaml:35-53
TRAINING_CATEGORIES = {
    "Car": "Car",
    "Pickup Truck": "Car",
    "Medium-sized Truck": "Truck",
    "Semi-truck": "Truck",
    "Towed Object": "Other Vehicle",
    "Motorcycle": "Motorcycle",
    "Other Vehicle - Construction Vehicle": "Other Vehicle",
    "Other Vehicle - Uncommon": "Other Vehicle",
    "Other Vehicle - Pedicab": "Other Vehicle",
    "Emergency Vehicle": "Other Vehicle",
    "Bus": "Bus",
    "Bicycle": "Bicycle",
    "Pedestrian": "Pedestrian",
    "Pedestrian with Object": "Pedestrian",
    "Animals - Other": "Animal",
}


# ----------------------------------------------------- quaternion geometry

def quat_to_rot(q) -> np.ndarray:
    """Scalar-first (w, x, y, z) unit quaternion -> [3, 3] rotation."""
    w, x, y, z = (float(v) for v in q)
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0.0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([[1 - yy - zz, xy - wz, xz + wy],
                     [xy + wz, 1 - xx - zz, yz - wx],
                     [xz - wy, yz + wx, 1 - xx - yy]], np.float64)


def pose_to_matrix(pose: Dict) -> np.ndarray:
    """Devkit ``_heading_position_to_mat``: pose dict -> 4x4 world-from-ego."""
    mat = np.eye(4)
    h, p = pose["heading"], pose["position"]
    mat[:3, :3] = quat_to_rot((h["w"], h["x"], h["y"], h["z"]))
    mat[:3, 3] = (p["x"], p["y"], p["z"])
    return mat


def lidar_points_to_ego(points: np.ndarray, pose: Dict) -> np.ndarray:
    """Devkit ``geometry.lidar_points_to_ego``: world -> Pandaset ego."""
    inv = np.linalg.inv(pose_to_matrix(pose))
    return points @ inv[:3, :3].T + inv[:3, 3]


def ego_to_lidar_points(points: np.ndarray, pose: Dict) -> np.ndarray:
    """Devkit inverse (used when exporting predictions back to world)."""
    mat = pose_to_matrix(pose)
    return points @ mat[:3, :3].T + mat[:3, 3]


def zrot_world_to_ego(pose: Dict) -> float:
    """World bearing of the ego y axis (pandaset_dataset.py:222-233)."""
    pts = lidar_points_to_ego(np.array([[0.0, 0, 0], [0, 1.0, 0]]), pose)
    yaxis = pts[1] - pts[0]
    return float(np.arctan2(-yaxis[0], yaxis[1]))


# ----------------------------------------------------------- frame decode

def _read_pickle_df(path):
    """gzip'd pickled DataFrame; a plain pickle also works (tests)."""
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        return pickle.load(f)


def decode_points(lidar_path, pose: Dict, device: int = 0) -> np.ndarray:
    """World-frame frame DataFrame -> normative ego [N, 4] float32."""
    df = _read_pickle_df(lidar_path)
    if device != -1 and "d" in df.columns:
        df = df[df["d"] == device]
    world = df[["x", "y", "z"]].to_numpy(np.float64)
    intensity = df["i"].to_numpy(np.float64) / 255.0
    ego = lidar_points_to_ego(world, pose)
    ego = ego[:, [1, 0, 2]]
    ego[:, 1] = -ego[:, 1]
    return np.concatenate(
        [ego, intensity[:, None]], axis=1).astype(np.float32)


def decode_cuboids(cuboids_path, pose: Dict, device: int = 0,
                   category_map: Optional[Dict[str, str]] = None):
    """Cuboids DataFrame -> (gt_boxes [G, 7] normative, names [G])."""
    df = _read_pickle_df(cuboids_path)
    if device != -1 and "cuboids.sensor_id" in df.columns:
        df = df[df["cuboids.sensor_id"] != 1 - device]
    names = [str(v) for v in df["label"].tolist()]
    if category_map is not None:
        names = [category_map.get(n, n) for n in names]
    centers = df[["position.x", "position.y", "position.z"]].to_numpy(
        np.float64)
    dims = df[["dimensions.x", "dimensions.y", "dimensions.z"]].to_numpy(
        np.float64)
    yaws = df["yaw"].to_numpy(np.float64)
    ego_centers = lidar_points_to_ego(centers, pose)
    zrot = zrot_world_to_ego(pose)
    boxes = np.stack([ego_centers[:, 1], -ego_centers[:, 0],
                      ego_centers[:, 2], dims[:, 1], dims[:, 0],
                      dims[:, 2], yaws + zrot], axis=1)
    return boxes.astype(np.float32), np.asarray(names)


# --------------------------------------------------------- sequence decode

def decode_sequence(seq_dir, save_dir, device: int = 0,
                    category_map: Optional[Dict[str, str]] = None,
                    has_label: bool = True) -> List[Dict]:
    """One `<root>/dataset/<seq>` dir -> npy points + info dicts.

    Skip-existing idempotency via the per-sequence info pickle, like the
    Waymo decoder and the reference's precompute flows.
    """
    seq_dir = pathlib.Path(seq_dir)
    seq = seq_dir.name
    out_dir = pathlib.Path(save_dir) / seq
    out_dir.mkdir(parents=True, exist_ok=True)
    # cache key carries the decode parameters (stale-cache guard)
    variant = (f"_d{device}" if device != 0 else "") \
        + ("" if category_map else "_raw") \
        + ("" if has_label else "_nolabel")
    pkl_file = out_dir / f"{seq}_infos{variant}.pkl"
    if pkl_file.exists():
        with open(pkl_file, "rb") as f:
            return pickle.load(f)

    with open(seq_dir / "lidar" / "poses.json") as f:
        poses = json.load(f)
    frames = sorted(p for p in (seq_dir / "lidar").glob("*.pkl*")
                    if p.name[0].isdigit())
    infos: List[Dict] = []
    for frame_path in frames:
        idx = int(frame_path.name.split(".")[0])
        pose = poses[idx]
        pts = decode_points(frame_path, pose, device=device)
        npy_rel = pathlib.Path(seq) / f"{idx:02d}.npy"
        np.save(pathlib.Path(save_dir) / npy_rel, pts)
        info = {
            "sequence": seq,
            "frame_idx": idx,
            "lidar_path": str(npy_rel),
            "zrot_world_to_ego": zrot_world_to_ego(pose),
            "pose": [pose["position"]["x"], pose["position"]["y"],
                     pose["position"]["z"], pose["heading"]["w"],
                     pose["heading"]["x"], pose["heading"]["y"],
                     pose["heading"]["z"]],
        }
        if has_label:
            cub = (seq_dir / "annotations" / "cuboids"
                   / frame_path.name)
            if cub.exists():
                boxes, names = decode_cuboids(
                    cub, pose, device=device, category_map=category_map)
                info["gt_boxes"] = boxes
                info["gt_names"] = names
        infos.append(info)
    with open(pkl_file, "wb") as f:
        pickle.dump(infos, f)
    return infos


def create_infos(root, save_dir,
                 splits: Dict[str, Sequence[str]],
                 device: int = 0,
                 category_map: Optional[Dict[str, str]] = TRAINING_CATEGORIES,
                 ) -> Dict[str, List[Dict]]:
    """All sequences of all splits -> pandaset_infos_<split>.pkl files.

    ``splits`` maps split name -> sequence id list (reference yaml
    SEQUENCES block); sequences missing on disk are skipped with a note.
    """
    root = pathlib.Path(root)
    data_dir = root / "dataset" if (root / "dataset").is_dir() else root
    save_dir = pathlib.Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    out: Dict[str, List[Dict]] = {}
    for split, seqs in splits.items():
        all_infos: List[Dict] = []
        for seq in seqs:
            seq_dir = data_dir / seq
            variant = (f"_d{device}" if device != 0 else "") \
                + ("" if category_map else "_raw")
            cached = save_dir / seq / f"{seq}_infos{variant}.pkl"
            if not seq_dir.is_dir() and not cached.exists():
                print(f"[{split}] missing sequence {seq}, skipping")
                continue
            all_infos.extend(decode_sequence(
                seq_dir, save_dir, device=device,
                category_map=category_map))
        with open(save_dir / f"pandaset_infos_{split}.pkl", "wb") as f:
            pickle.dump(all_infos, f)
        out[split] = all_infos
    return out


# ----------------------------------------------------- result formatting

def export_predictions(pred_boxes, pred_scores, names, pose: Dict,
                       zrot: float, save_path=None):
    """Normative-frame detections -> world-frame Pandaset prediction
    DataFrame (pandaset_dataset.generate_prediction_dicts:272-355):
    normative (x, y) -> pandaset-ego (-y, x), dims dx<->dy, centers
    ego -> world via the pose, world_yaw = yaw - zrot (mod 2pi).
    Optionally pickles to `<seq>/predictions/cuboids/<frame>.pkl.gz`.
    """
    import pandas as pd
    boxes = np.asarray(pred_boxes, np.float64).reshape(-1, 7)
    ego_centers = np.stack([-boxes[:, 1], boxes[:, 0], boxes[:, 2]],
                           axis=1)
    world = ego_to_lidar_points(ego_centers, pose)
    df = pd.DataFrame({
        "position.x": world[:, 0],
        "position.y": world[:, 1],
        "position.z": world[:, 2],
        "dimensions.x": boxes[:, 4],
        "dimensions.y": boxes[:, 3],
        "dimensions.z": boxes[:, 5],
        "yaw": (boxes[:, 6] - zrot) % (2.0 * np.pi),
        "label": np.asarray([str(n) for n in names]),
        "score": np.asarray(pred_scores, np.float64),
    })
    if save_path is not None:
        save_path = pathlib.Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        df.to_pickle(save_path)
    return df
