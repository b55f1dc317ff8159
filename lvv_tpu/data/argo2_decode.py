"""Devkit-free Argoverse 2 sensor-dataset feather -> bin/info decoder.

The reference's offline step (pcdet/datasets/argo2/argo2_dataset.py:
19-167 ``prepare``/``create_argo2_infos``) needs the ``av2`` devkit
(``read_feather``) + torch/kornia (``quat_to_yaw``).  Feather files are
plain Arrow IPC, so pyarrow covers the IO and the quaternion math is
three lines of numpy; this module reproduces the pipeline exactly:

    <root>/sensor/<split>/<segment>/sensors/lidar/<ts>.feather
                                   columns (x y z intensity ...)
    <root>/sensor/<split>/<segment>/annotations.feather
                                   LABEL_ATTR columns + category
                                   + num_interior_pts + timestamp_ns

-> ``<out>/<training|testing>/velodyne/<sample_idx>.bin`` float32 [N, 4]
plus info dicts with the reference's schema (uuid, sample_idx,
point_cloud.velodyne_path, annos{name, location, dimensions, rotation_y,
num_points_in_gt, gt_boxes_lidar}).  ``gt_boxes_lidar`` [G, 7] is added
on top (the reference assembles it at __getitem__ time from
location/dimensions/rotation_y, argo2_dataset.py:321-325) because
:class:`lvv_tpu.data.detection_dataset.Argo2Detection` reads it directly.

``sample_idx`` is the reference's 7-digit string: split prefix (0 train /
1 val / 2 test) + zero-padded segment index + frame index
(argo2_dataset.py:109-146).
"""
from __future__ import annotations

import pathlib
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# reference pcdet/datasets/argo2/argo2_utils/constants.py
LABEL_ATTR = ("tx_m", "ty_m", "tz_m", "length_m", "width_m", "height_m",
              "qw", "qx", "qy", "qz")

_PREFIX = {"train": "0", "val": "1", "test": "2"}
_PREFIX2DIR = {"0": "training", "1": "training", "2": "testing"}


def read_feather(path):
    """Arrow-IPC feather -> pandas DataFrame (av2.utils.io.read_feather).

    Feather V2 (what av2 writes) IS the Arrow IPC file format; read it
    through the stable IPC API and fall back to the legacy feather
    reader only for V1 files.
    """
    import pyarrow as pa
    try:
        with pa.memory_map(str(path), "r") as src:
            return pa.ipc.open_file(src).read_all().to_pandas()
    except pa.ArrowInvalid:
        import pyarrow.feather as paf
        return paf.read_feather(path)


def write_feather(df, path) -> None:
    """DataFrame -> Feather V2 / Arrow IPC file (test fabrication)."""
    import pyarrow as pa
    table = pa.Table.from_pandas(df, preserve_index=False)
    with pa.OSFile(str(path), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)


def quat_to_yaw(quat_wxyz: np.ndarray) -> np.ndarray:
    """Scalar-first quaternions [..., 4] -> yaw about +z.

    Matches argo2_utils/so3.py::quat_to_yaw (Tait-Bryan yaw):
    atan2(2(qw qz + qx qy), 1 - 2(qy^2 + qz^2)).
    """
    q = np.asarray(quat_wxyz, np.float64)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def yaw_to_quat(yaw) -> np.ndarray:
    """Yaw about +z -> scalar-first quaternion [..., 4] (so3.py inverse)."""
    yaw = np.asarray(yaw, np.float64)
    half = yaw / 2.0
    out = np.zeros(yaw.shape + (4,))
    out[..., 0] = np.cos(half)
    out[..., 3] = np.sin(half)
    return out


# ------------------------------------------------------------ frame decode

def decode_annotations(frame_anno) -> Dict:
    """annotations.feather rows of one timestamp -> reference annos dict
    (process_and_save_frame, argo2_dataset.py:68-91) + gt_boxes_lidar."""
    frame_anno = frame_anno[frame_anno["num_interior_pts"] > 0]
    cuboid = frame_anno[list(LABEL_ATTR)].to_numpy(np.float64)
    yaw = quat_to_yaw(cuboid[:, -4:])
    xyz = cuboid[:, :3]
    lwh = cuboid[:, 3:6]
    cat = np.asarray([str(c).lower().capitalize()
                      for c in frame_anno["category"].tolist()])
    n = len(cat)
    return dict(
        name=cat,
        truncated=np.zeros(n, np.float64),
        occluded=np.zeros(n, np.int64),
        alpha=-10.0 * np.ones(n, np.float64),
        dimensions=lwh,
        location=xyz,
        rotation_y=yaw,
        index=np.arange(n, dtype=np.int32),
        num_points_in_gt=frame_anno["num_interior_pts"].to_numpy(np.int32),
        gt_boxes_lidar=np.concatenate(
            [xyz, lwh, yaw[:, None]], axis=1).astype(np.float32),
    )


def save_point_cloud(frame_path, save_path) -> int:
    """lidar feather -> raw float32 [N, 4] .bin (argo2_dataset.py:103-107)."""
    lidar = read_feather(frame_path)
    pts = lidar[["x", "y", "z", "intensity"]].to_numpy().astype(np.float32)
    pathlib.Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    pts.tofile(save_path)
    return len(pts)


def process_single_segment(segment_path, split: str, ts2idx: Dict[str, str],
                           output_dir, save_bin: bool = True) -> List[Dict]:
    """One segment dir -> per-frame bins + infos (argo2_dataset.py:19-100)."""
    segment_path = pathlib.Path(segment_path)
    segname = segment_path.name
    test_mode = "test" in split
    segment_anno = None
    if not test_mode:
        segment_anno = read_feather(segment_path / "annotations.feather")
    infos: List[Dict] = []
    lidar_dir = segment_path / "sensors" / "lidar"
    for frame_path in sorted(lidar_dir.glob("*.feather")):
        ts = int(frame_path.stem)
        uuid = f"{segname}/{frame_path.stem}"
        sample_idx = ts2idx[uuid]
        rel = pathlib.Path(_PREFIX2DIR[sample_idx[0]]) / "velodyne" / \
            f"{sample_idx}.bin"
        info = {
            "uuid": uuid,
            "sample_idx": sample_idx,
            "image": {},
            "point_cloud": {"num_features": 4,
                            "velodyne_path": str(rel)},
            # duplicate for Argo2Detection.load_raw, which reads a flat
            # lidar_path (root-relative)
            "lidar_path": str(rel),
            "calib": {},
            "pose": {},
            "sweeps": [],
        }
        if segment_anno is not None:
            frame_anno = segment_anno[segment_anno["timestamp_ns"] == ts]
            info["annos"] = decode_annotations(frame_anno)
        if save_bin:
            save_point_cloud(frame_path, pathlib.Path(output_dir) / rel)
        infos.append(info)
    return infos


def prepare(root, splits: Sequence[str] = ("train", "val")
            ) -> Tuple[Dict[str, str], List[pathlib.Path], List[str]]:
    """Walk `<root>/sensor/<split>/<segment>` and build the uuid ->
    7-digit sample index map (argo2_dataset.py:109-157)."""
    root = pathlib.Path(root)
    base = root / "sensor" if (root / "sensor").is_dir() else root
    ts2idx: Dict[str, str] = {}
    seg_paths: List[pathlib.Path] = []
    seg_splits: List[str] = []
    for split in splits:
        split_root = base / split
        if not split_root.is_dir():
            continue
        prefix = _PREFIX[split]
        for seg_idx, seg_dir in enumerate(sorted(split_root.iterdir())):
            if not seg_dir.is_dir():
                continue
            assert seg_idx < 1000
            seg_paths.append(seg_dir)
            seg_splits.append(split)
            frames = sorted((seg_dir / "sensors" / "lidar").glob(
                "*.feather"))
            for frame_idx, fp in enumerate(frames):
                assert frame_idx < 1000
                uuid = f"{seg_dir.name}/{fp.stem}"
                ts2idx[uuid] = prefix + str(seg_idx).zfill(3) + \
                    str(frame_idx).zfill(3)
    return ts2idx, seg_paths, seg_splits


def create_argo2_infos(root, output_dir,
                       splits: Sequence[str] = ("train", "val"),
                       save_bin: bool = True,
                       velodyne_root: Optional[str] = None,
                       ) -> Dict[str, List[Dict]]:
    """Full pipeline -> `argo2_infos_<split>.pkl` under output_dir."""
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    bin_root = pathlib.Path(velodyne_root) if velodyne_root else output_dir
    ts2idx, seg_paths, seg_splits = prepare(root, splits=splits)
    by_split: Dict[str, List[Dict]] = {s: [] for s in splits}
    for seg_path, split in zip(seg_paths, seg_splits):
        by_split[split].extend(process_single_segment(
            seg_path, split, ts2idx, bin_root, save_bin=save_bin))
    for split, infos in by_split.items():
        with open(output_dir / f"argo2_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos, f)
    return by_split


# ----------------------------------------------------- result formatting

def lidar_box_to_argo2(boxes) -> np.ndarray:
    """[G, 7] (xyz lwh yaw) -> [G, 10] LABEL_ATTR cuboids
    (argo2_dataset.py:406-414)."""
    boxes = np.asarray(boxes, np.float64).reshape(-1, 7)
    return np.concatenate([boxes[:, :6], yaw_to_quat(boxes[:, 6])], axis=1)


def format_results(outputs: Sequence[Dict], infos: Sequence[Dict],
                   out_path=None):
    """Detections -> the av2 submission DataFrame / feather file
    (argo2_dataset.py:340-404): one row per box with LABEL_ATTR columns,
    score, log_id, timestamp_ns (from the info uuid), UPPERCASE category;
    rows sorted by descending score.

    outputs: per-sample {"name" [G], "boxes" [G, 7], "score" [G]}
    aligned with `infos`.
    """
    import pandas as pd
    assert len(outputs) == len(infos)
    frames = []
    for out_i, info in zip(outputs, infos):
        log_id, ts = info["uuid"].split("/")
        df = pd.DataFrame(lidar_box_to_argo2(out_i["boxes"]),
                          columns=list(LABEL_ATTR))
        df["score"] = np.asarray(out_i["score"], np.float64)
        df["log_id"] = log_id
        df["timestamp_ns"] = int(ts)
        df["category"] = [str(n).upper() for n in out_i["name"]]
        frames.append(df)
    dts = (pd.concat(frames).set_index(["log_id", "timestamp_ns"])
           .sort_index())
    dts = dts.sort_values("score", ascending=False).reset_index()
    if out_path is not None:
        out_path = str(out_path)
        if not out_path.endswith(".feather"):
            out_path += ".feather"
        write_feather(dts, out_path)
    return dts.set_index(["log_id", "timestamp_ns"]).sort_index()
