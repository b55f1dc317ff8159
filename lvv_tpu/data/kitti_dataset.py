"""KITTI detection dataset.

Re-design of the reference KittiDataset (pcdet/datasets/kitti/
kitti_dataset.py + calibration_kitti.py): velodyne .bin clouds (float32
N x 4), label_2 .txt annotations, calib .txt projection matrices. Labels are
camera-frame boxes (x right, y down, z forward; location at the box BOTTOM
center; ry around camera-y); they convert to the pcdet lidar frame via the
calib's Tr_velo_to_cam / R0_rect, with z lifted to the box center.

Fixed-shape output per DetectionDatasetBase; difficulty bucketing
(easy/moderate/hard by bbox height / occlusion / truncation, reference
kitti eval clean_data) is provided for eval filtering.
"""
from __future__ import annotations

import pathlib
from typing import Dict, List, Optional

import numpy as np

from .detection_dataset import DetectionDatasetBase, register_dataset

KITTI_CLASSES = ("Car", "Pedestrian", "Cyclist")


def parse_calib(path: pathlib.Path) -> Dict[str, np.ndarray]:
    out = {}
    for line in path.read_text().splitlines():
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        out[k.strip()] = np.fromstring(v, sep=" ", dtype=np.float64)
    calib = {}
    if "Tr_velo_to_cam" in out:
        tr = np.eye(4)
        tr[:3, :4] = out["Tr_velo_to_cam"].reshape(3, 4)
        calib["Tr_velo_to_cam"] = tr
    if "R0_rect" in out:
        r0 = np.eye(4)
        r0[:3, :3] = out["R0_rect"].reshape(3, 3)
        calib["R0_rect"] = r0
    if "P2" in out:
        calib["P2"] = out["P2"].reshape(3, 4)
    return calib


def parse_labels(path: pathlib.Path) -> List[Dict]:
    rows = []
    for line in path.read_text().splitlines():
        p = line.split()
        if len(p) < 15 or p[0] == "DontCare":
            continue
        rows.append({
            "type": p[0], "truncated": float(p[1]), "occluded": int(p[2]),
            "bbox": [float(x) for x in p[4:8]],
            "dims_hwl": [float(x) for x in p[8:11]],   # h, w, l
            "loc_cam": [float(x) for x in p[11:14]],   # camera frame, bottom
            "ry": float(p[14]),
        })
    return rows


def difficulty(row: Dict) -> int:
    """0 easy / 1 moderate / 2 hard / -1 ignore (reference eval clean_data
    thresholds: bbox height 40/25/25 px, occlusion 0/1/2, trunc .15/.3/.5)."""
    height = row["bbox"][3] - row["bbox"][1]
    occ, tr = row["occluded"], row["truncated"]
    if height >= 40 and occ <= 0 and tr <= 0.15:
        return 0
    if height >= 25 and occ <= 1 and tr <= 0.30:
        return 1
    if height >= 25 and occ <= 2 and tr <= 0.50:
        return 2
    return -1


def label_to_lidar_box(row: Dict, calib: Dict) -> np.ndarray:
    """-> pcdet box [x, y, z(center), dx(l), dy(w), dz(h), heading]."""
    h, w, l = row["dims_hwl"]
    loc_cam = np.asarray(row["loc_cam"] + [1.0])
    # camera (rect) -> lidar: inv(Tr) @ inv(R0) @ loc
    inv = np.linalg.inv(calib["Tr_velo_to_cam"]) @ \
        np.linalg.inv(calib["R0_rect"])
    loc = (inv @ loc_cam)[:3]
    z_center = loc[2] + h / 2.0            # bottom -> center
    heading = -row["ry"] - np.pi / 2.0     # camera ry -> lidar yaw
    return np.asarray([loc[0], loc[1], z_center, l, w, h, heading,
                       0.0, 0.0], np.float32)


@register_dataset("Kitti")
class KittiDetection(DetectionDatasetBase):
    """root/
         velodyne/000000.bin   label_2/000000.txt   calib/000000.txt"""

    def __init__(self, root: str, split_ids: Optional[List[str]] = None,
                 class_names=KITTI_CLASSES, **kw):
        kw.setdefault("point_range", (0.0, -40.0, -3.0, 70.4, 40.0, 1.0))
        super().__init__(**kw)
        self.root = pathlib.Path(root)
        self.class_names = list(class_names)
        if split_ids is None:
            split_ids = sorted(p.stem for p in
                               (self.root / "velodyne").glob("*.bin"))
        self.ids = split_ids

    def __len__(self):
        return len(self.ids)

    def load_raw(self, index: int) -> Dict:
        fid = self.ids[index]
        pts = np.fromfile(self.root / "velodyne" / f"{fid}.bin",
                          dtype=np.float32).reshape(-1, 4)
        out = {"points": pts[:, : self.num_point_features], "token": fid}
        label_p = self.root / "label_2" / f"{fid}.txt"
        calib_p = self.root / "calib" / f"{fid}.txt"
        if label_p.exists() and calib_p.exists():
            calib = parse_calib(calib_p)
            boxes, labels, diffs = [], [], []
            for row in parse_labels(label_p):
                if row["type"] not in self.class_names:
                    continue
                boxes.append(label_to_lidar_box(row, calib))
                labels.append(self.class_names.index(row["type"]))
                diffs.append(difficulty(row))
            if boxes:
                out["gt_boxes"] = np.stack(boxes)
                out["gt_labels"] = np.asarray(labels, np.int32)
                out["gt_difficulty"] = np.asarray(diffs, np.int32)
        return out
