"""rerun.io streaming of LiDAR scenes + predictions.

Re-design of the reference viz scripts (src/rerun-visualization/
nusc_rerun_demo_noargs.py: scene streaming with LIDAR_TOP + 6 cameras,
optional .rrd persistence; viz_seq_dataset_with_boxes.py: per-frame
predicted boxes from npz/npy/pkl with score/label/radius/top-K filters and
rr.Boxes3D logging with version shims :249-279).

All rerun calls gate on the package being installed (RERUN_AVAILABLE); the
data-preparation half (filters, convention normalization) is pure numpy and
always usable/testable.
"""
from __future__ import annotations

import pathlib
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

from .boxes import normalize_box_convention, to_half_sizes

try:
    import rerun as rr
    RERUN_AVAILABLE = True
except Exception:  # pragma: no cover - optional dep
    rr = None
    RERUN_AVAILABLE = False


def filter_predictions(boxes: np.ndarray, scores: np.ndarray,
                       labels: np.ndarray, *, score_thresh: float = 0.0,
                       keep_labels: Optional[Sequence[int]] = None,
                       max_radius: Optional[float] = None,
                       top_k: Optional[int] = None):
    """Score/label/radius/top-K filters (reference :214-247)."""
    mask = scores >= score_thresh
    if keep_labels is not None:
        mask &= np.isin(labels, np.asarray(keep_labels))
    if max_radius is not None:
        mask &= np.linalg.norm(boxes[:, :2], axis=1) <= max_radius
    idx = np.nonzero(mask)[0]
    if top_k is not None and len(idx) > top_k:
        idx = idx[np.argsort(-scores[idx])[:top_k]]
    return boxes[idx], scores[idx], labels[idx]


def _require_rerun():
    if not RERUN_AVAILABLE:
        raise ImportError("rerun-sdk is not installed; install it to stream "
                          "visualizations (pure-numpy helpers remain usable)")


def log_frame(points: np.ndarray, boxes: Optional[np.ndarray] = None,
              labels: Optional[np.ndarray] = None,
              scores: Optional[np.ndarray] = None,
              t: float = 0.0, entity: str = "lidar",
              flavor: str = "pcdet") -> None:
    """Log one LiDAR frame (+boxes) at timeline position t."""
    _require_rerun()
    rr.set_time_seconds("time", t)
    rr.log(f"{entity}/points", rr.Points3D(points[:, :3]))
    if boxes is not None and len(boxes):
        norm = normalize_box_convention(boxes, flavor)
        centers, half, yaw = to_half_sizes(norm)
        quats = np.zeros((len(yaw), 4), np.float32)
        quats[:, 2] = np.sin(yaw / 2)
        quats[:, 3] = np.cos(yaw / 2)
        kw = {}
        if labels is not None:
            kw["class_ids"] = labels.astype(np.uint16)
        rr.log(f"{entity}/boxes", rr.Boxes3D(
            centers=centers, half_sizes=half,
            quaternions=[rr.Quaternion(xyzw=q) for q in quats], **kw))


def _log_encoded_image(entity: str, path) -> None:
    """Version-shimmed jpg logging (rerun renamed this archetype twice)."""
    if hasattr(rr, "EncodedImage"):
        rr.log(entity, rr.EncodedImage(path=str(path)))
    elif hasattr(rr, "ImageEncoded"):
        rr.log(entity, rr.ImageEncoded(path=str(path)))


def stream_scene(nusc, scene_token: str, entity: str = "scene",
                 rrd_path: Optional[str] = None,
                 max_frames: Optional[int] = None,
                 cameras: Sequence[str] = (),
                 with_boxes: bool = False) -> int:
    """Stream one nuScenes scene: LIDAR_TOP (+ optional camera jpgs and
    sensor-frame gt boxes). Reference
    rerun-visualization/nusc_rerun_demo_noargs.py:1-166 streams LIDAR +
    6 cameras per keyframe; the duck-typed `nusc` means both the devkit
    and TableNuScenes drive it."""
    _require_rerun()
    rr.init("lvv_tpu_scene", spawn=rrd_path is None)
    if rrd_path:
        rr.save(rrd_path)
    scene = nusc.get("scene", scene_token)
    tok = scene["first_sample_token"]
    n = 0
    while tok and (max_frames is None or n < max_frames):
        sample = nusc.get("sample", tok)
        sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        path = pathlib.Path(nusc.dataroot) / sd["filename"]
        pts = np.fromfile(path, np.float32).reshape(-1, 5)[:, :4]
        boxes = labels = None
        if with_boxes and sample.get("anns"):
            from ..data.nuscenes_utils import box_global_to_sensor
            cs = nusc.get("calibrated_sensor",
                          sd["calibrated_sensor_token"])
            pose = nusc.get("ego_pose", sd["ego_pose_token"])
            rows = []
            for ann_tok in sample["anns"]:
                ann = nusc.get("sample_annotation", ann_tok)
                c, yaw, _ = box_global_to_sensor(
                    ann["translation"], ann["rotation"], pose, cs)
                w, l, h = ann["size"]
                rows.append([c[0], c[1], c[2], l, w, h, yaw])
            boxes = np.asarray(rows, np.float32).reshape(-1, 7)
            labels = np.zeros(len(boxes), np.int32)
        log_frame(pts, boxes, labels, t=sample["timestamp"] / 1e6,
                  entity=entity)
        rr.set_time_seconds("time", sample["timestamp"] / 1e6)
        for cam in cameras:
            cam_tok = sample["data"].get(cam)
            if not cam_tok:
                continue
            cam_sd = nusc.get("sample_data", cam_tok)
            img = pathlib.Path(nusc.dataroot) / cam_sd["filename"]
            if img.exists():
                _log_encoded_image(f"{entity}/{cam}", img)
        tok = sample["next"]
        n += 1
    return n


def stream_predictions(frames: Iterable[Dict], entity: str = "pred",
                       flavor: str = "centerpoint",
                       rrd_path: Optional[str] = None, **filter_kw) -> int:
    """Stream {points, boxes, scores, labels, t} dicts with filtering
    (reference viz_seq_dataset_with_boxes.py main loop)."""
    _require_rerun()
    rr.init("lvv_tpu_pred", spawn=rrd_path is None)
    if rrd_path:
        rr.save(rrd_path)
    n = 0
    for f in frames:
        boxes, scores, labels = filter_predictions(
            np.asarray(f["boxes"]), np.asarray(f["scores"]),
            np.asarray(f["labels"]), **filter_kw)
        log_frame(np.asarray(f["points"]), boxes, labels, scores,
                  t=f.get("t", n * 0.1), entity=entity, flavor=flavor)
        n += 1
    return n
