"""ONCE dataset offline info builder (devkit-free — ONCE needs none).

The reference builds ONCE infos by walking `<root>/data/<seq>/<seq>.json`
(pcdet/datasets/once/once_dataset.py:155-292 ``get_infos``): each
sequence JSON carries meta_info, per-camera calib, and a frames list with
frame_id/pose/annos; points live at `<seq>/lidar_roof/<frame_id>.bin`
(float32 [N, 4]).  That loop is pure json+numpy — the only non-trivial
part is ``num_points_in_gt``, which the reference computes via
box-corner hull tests (box_utils.in_hull); for the 7-dof upright boxes
that is exactly the rotated-box containment test
(:func:`lvv_tpu.data.nuscenes_utils.points_in_box_np`).

Splits follow the reference's ImageSets txt convention
(once_dataset.py:16-38: `<root>/ImageSets/<split>.txt`, one sequence id
per line; splits: train/val/test/raw_small/raw_medium/raw_large).
"""
from __future__ import annotations

import json
import pathlib
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .nuscenes_utils import points_in_box_np

CAM_NAMES = ("cam01", "cam03", "cam05", "cam06", "cam07", "cam08",
             "cam09")


def process_single_sequence(seq_dir, cam_names: Sequence[str] = CAM_NAMES,
                            count_points: bool = True) -> List[Dict]:
    """One sequence dir -> reference-schema info dicts
    (once_dataset.py:217-283)."""
    seq_dir = pathlib.Path(seq_dir)
    seq_idx = seq_dir.name
    with open(seq_dir / f"{seq_idx}.json") as f:
        seq_json = json.load(f)
    meta_info = seq_json.get("meta_info")
    calib = seq_json.get("calib", {})
    frames = seq_json["frames"]
    infos: List[Dict] = []
    for f_idx, frame in enumerate(frames):
        frame_id = frame["frame_id"]
        prev_id = frames[f_idx - 1]["frame_id"] if f_idx > 0 else None
        next_id = frames[f_idx + 1]["frame_id"] \
            if f_idx + 1 < len(frames) else None
        pc_path = str(seq_dir / "lidar_roof" / f"{frame_id}.bin")
        info: Dict = {
            "sequence_id": seq_idx,
            "frame_id": frame_id,
            "timestamp": int(frame_id),
            "prev_id": prev_id,
            "next_id": next_id,
            "meta_info": meta_info,
            "lidar": pc_path,
            # root-relative duplicate for ONCEDetection.load_raw
            "lidar_path": str(pathlib.Path(seq_idx) / "lidar_roof"
                              / f"{frame_id}.bin"),
            "pose": np.asarray(frame["pose"]),
        }
        calib_dict = {}
        for cam in cam_names:
            if cam not in calib:
                continue
            info[cam] = str(seq_dir / cam / f"{frame_id}.jpg")
            calib_dict[cam] = {
                "cam_to_velo": np.asarray(calib[cam]["cam_to_velo"]),
                "cam_intrinsic": np.asarray(calib[cam]["cam_intrinsic"]),
                "distortion": np.asarray(calib[cam]["distortion"]),
            }
        info["calib"] = calib_dict

        if "annos" in frame:
            annos = frame["annos"]
            boxes_3d = np.asarray(annos["boxes_3d"], np.float64)
            if boxes_3d.shape[0] == 0:
                # reference skips zero-box annotated frames entirely
                continue
            annos_dict = {
                "name": np.asarray(annos["names"]),
                "boxes_3d": boxes_3d,
                "boxes_2d": {cam: np.asarray(b) for cam, b in
                             annos.get("boxes_2d", {}).items()},
            }
            num_gt = boxes_3d.shape[0]
            num_points_in_gt = -np.ones(num_gt, np.int32)
            if count_points and pathlib.Path(pc_path).exists():
                pts = np.fromfile(pc_path, np.float32).reshape(-1, 4)
                for k in range(num_gt):
                    num_points_in_gt[k] = int(points_in_box_np(
                        pts, boxes_3d[k, :7]).sum())
            annos_dict["num_points_in_gt"] = num_points_in_gt
            info["annos"] = annos_dict
        infos.append(info)
    return infos


def get_infos(root, split: Optional[str] = None,
              sample_seq_list: Optional[Sequence[str]] = None,
              count_points: bool = True) -> List[Dict]:
    """All sequences of a split (reference once_dataset.get_infos)."""
    root = pathlib.Path(root)
    data_dir = root / "data" if (root / "data").is_dir() else root
    if sample_seq_list is None:
        imageset = root / "ImageSets" / f"{split}.txt"
        if imageset.exists():
            sample_seq_list = [ln.strip() for ln in
                               imageset.read_text().splitlines()
                               if ln.strip()]
        else:
            sample_seq_list = sorted(
                p.name for p in data_dir.iterdir() if p.is_dir())
    infos: List[Dict] = []
    for seq in sample_seq_list:
        seq_dir = data_dir / seq
        if not seq_dir.is_dir():
            print(f"missing ONCE sequence {seq}, skipping")
            continue
        infos.extend(process_single_sequence(
            seq_dir, count_points=count_points))
    return infos


def create_once_infos(root, save_dir,
                      splits: Sequence[str] = ("train", "val"),
                      count_points: bool = True) -> Dict[str, List[Dict]]:
    """Reference create_once_infos: `once_infos_<split>.pkl` per split."""
    save_dir = pathlib.Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    out: Dict[str, List[Dict]] = {}
    for split in splits:
        infos = get_infos(root, split=split, count_points=count_points)
        with open(save_dir / f"once_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos, f)
        out[split] = infos
    return out
