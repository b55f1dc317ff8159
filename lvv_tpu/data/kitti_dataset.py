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


def lidar_box_to_camera(box: np.ndarray, calib: Dict):
    """Inverse of :func:`label_to_lidar_box` (reference
    box_utils.boxes3d_lidar_to_kitti_camera): pcdet lidar box
    [x y z(center) l w h yaw] -> (loc_cam bottom [3], (h, w, l), ry)."""
    box = np.asarray(box, np.float64)
    x, y, z, l, w, h, yaw = box[:7]
    tm = calib["R0_rect"] @ calib["Tr_velo_to_cam"]
    loc = (tm @ np.array([x, y, z - h / 2.0, 1.0]))[:3]
    ry = -yaw - np.pi / 2.0
    # KITTI convention keeps ry in [-pi, pi]
    ry = (ry + np.pi) % (2.0 * np.pi) - np.pi
    return loc, (h, w, l), float(ry)


def camera_box_to_imagebox(loc_cam, dims_hwl, ry: float, calib: Dict,
                           image_shape=None) -> np.ndarray:
    """Project a camera-frame 3D box to its 2D image bbox (reference
    box_utils.boxes3d_kitti_camera_to_imageboxes): 8 corners through P2,
    min/max, optional clip to the image."""
    h, w, l = dims_hwl
    # bottom-centered corner template, y down (camera frame)
    xs = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
    ys = np.array([0.0, 0, 0, 0, -h, -h, -h, -h]) + 0.0
    zs = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
    c, s = np.cos(ry), np.sin(ry)
    rot_x = c * xs + s * zs
    rot_z = -s * xs + c * zs
    corners = np.stack([rot_x + loc_cam[0], ys + loc_cam[1],
                        rot_z + loc_cam[2], np.ones(8)], axis=0)
    img = calib["P2"] @ corners                        # [3, 8]
    uv = img[:2] / np.maximum(img[2:3], 1e-6)
    bbox = np.array([uv[0].min(), uv[1].min(), uv[0].max(), uv[1].max()])
    if image_shape is not None:
        hh, ww = image_shape[:2]
        bbox[[0, 2]] = np.clip(bbox[[0, 2]], 0, ww - 1)
        bbox[[1, 3]] = np.clip(bbox[[1, 3]], 0, hh - 1)
    return bbox


def write_kitti_results(frame_id: str, boxes_lidar, scores, names,
                        calib: Dict, out_dir, image_shape=None
                        ) -> pathlib.Path:
    """One frame's detections -> `<out_dir>/<frame_id>.txt` in the KITTI
    submission label format (reference kitti_dataset.
    generate_prediction_dicts:277-345: name, trunc -1, occ -1, alpha,
    bbox, h w l, camera-frame bottom location, ry, score)."""
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{frame_id}.txt"
    lines = []
    boxes_lidar = np.asarray(boxes_lidar, np.float64).reshape(-1, 9) \
        if len(boxes_lidar) and np.asarray(boxes_lidar).shape[-1] == 9 \
        else np.asarray(boxes_lidar, np.float64).reshape(-1, 7)
    for k in range(len(boxes_lidar)):
        b = boxes_lidar[k]
        loc, (h, w, l), ry = lidar_box_to_camera(b, calib)
        bbox = camera_box_to_imagebox(loc, (h, w, l), ry, calib,
                                      image_shape=image_shape)
        alpha = float(-np.arctan2(-b[1], b[0]) + ry)
        lines.append(
            f"{names[k]} -1 -1 {alpha:.4f} "
            f"{bbox[0]:.4f} {bbox[1]:.4f} {bbox[2]:.4f} {bbox[3]:.4f} "
            f"{h:.4f} {w:.4f} {l:.4f} "
            f"{loc[0]:.4f} {loc[1]:.4f} {loc[2]:.4f} {ry:.4f} "
            f"{float(scores[k]):.4f}")
    path.write_text("\n".join(lines) + ("\n" if lines else ""))
    return path


@register_dataset("Kitti")
class KittiDetection(DetectionDatasetBase):
    """root/
         velodyne/000000.bin   label_2/000000.txt   calib/000000.txt"""

    def __init__(self, root: str, split_ids: Optional[List[str]] = None,
                 split: Optional[str] = None,
                 class_names=KITTI_CLASSES, **kw):
        kw.setdefault("point_range", (0.0, -40.0, -3.0, 70.4, 40.0, 1.0))
        super().__init__(**kw)
        self.root = pathlib.Path(root)
        self.class_names = list(class_names)
        if split_ids is None and split is not None:
            # reference ImageSets convention (kitti_dataset.py set_split:
            # data/kitti/ImageSets/{train,val,test,trainval}.txt)
            for base in (self.root, self.root.parent):
                f = base / "ImageSets" / f"{split}.txt"
                if f.exists():
                    split_ids = [ln.strip() for ln in
                                 f.read_text().splitlines() if ln.strip()]
                    break
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
