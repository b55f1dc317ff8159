"""Detection dataset pipeline — the DatasetTemplate equivalent.

Re-design of the reference's dataset stack (pcdet/datasets/dataset.py:1-325
DatasetTemplate.prepare_data = point_feature_encoder -> data_augmentor ->
data_processor; collate_batch pads/stacks; __init__.py:18-28 registry;
processor/data_processor.py: range mask, shuffle, downsample). The
TPU-first difference: everything emits FIXED-SHAPE numpy (points padded to
max_points, gt padded to max_gt) so batches go straight to jit'd train
steps; voxelization happens ON DEVICE (ops.voxelize), not in the loader.

Registered datasets: NuScenesDetection (10-sweep accumulation like
nuscenes_dataset.get_lidar_with_sweeps:101-118 when the devkit is present),
plus a file-list CustomDetection for .pcd.bin / .npy folders.
"""
from __future__ import annotations

import pathlib
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

DATASETS: Dict[str, Callable] = {}


def register_dataset(name: str):
    def deco(cls):
        DATASETS[name] = cls
        return cls
    return deco


def build_dataset(name: str, **kw):
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; "
                       f"registered: {sorted(DATASETS)}")
    return DATASETS[name](**kw)


# ------------------------------------------------------------ processing

def mask_points_by_range(points: np.ndarray, point_range) -> np.ndarray:
    """reference data_processor.mask_points_and_boxes_outside_range."""
    m = ((points[:, 0] >= point_range[0]) & (points[:, 0] <= point_range[3])
         & (points[:, 1] >= point_range[1])
         & (points[:, 1] <= point_range[4]))
    return points[m]


def shuffle_points(points: np.ndarray, rng: np.random.Generator):
    return points[rng.permutation(len(points))]


def pad_points(points: np.ndarray, max_points: int):
    out = np.zeros((max_points, points.shape[1]), np.float32)
    n = min(len(points), max_points)
    out[:n] = points[:n]
    return out, n


def pad_boxes(boxes: np.ndarray, labels: np.ndarray, max_gt: int):
    ob = np.zeros((max_gt, 9), np.float32)
    ol = np.zeros((max_gt,), np.int32)
    om = np.zeros((max_gt,), bool)
    n = min(len(boxes), max_gt)
    if n:
        ob[:n, :boxes.shape[1]] = boxes[:n]
        ol[:n] = labels[:n]
        om[:n] = True
    return ob, ol, om


class DetectionSample(dict):
    """{points [P,4], num_points, gt_boxes [G,9], gt_labels [G],
    gt_mask [G], token}"""


class DetectionDatasetBase:
    """prepare_data pipeline over fixed shapes."""

    def __init__(self, point_range, max_points: int = 300000,
                 max_gt: int = 128, augment: bool = False, seed: int = 0,
                 num_point_features: int = 4):
        self.point_range = tuple(point_range)
        self.max_points = max_points
        self.max_gt = max_gt
        self.do_augment = augment
        self.rng = np.random.default_rng(seed)
        self.num_point_features = num_point_features

    # subclasses implement raw access
    def load_raw(self, index: int) -> Dict:
        raise NotImplementedError

    def __getitem__(self, index: int) -> DetectionSample:
        raw = self.load_raw(index)
        pts = mask_points_by_range(raw["points"], self.point_range)
        pts = shuffle_points(pts, self.rng)
        boxes = raw.get("gt_boxes", np.zeros((0, 9), np.float32))
        labels = raw.get("gt_labels", np.zeros((0,), np.int32))
        if self.do_augment and len(boxes):
            import jax
            import jax.numpy as jnp
            from .augment import augment as aug
            key = jax.random.PRNGKey(int(self.rng.integers(2 ** 31)))
            p, b = aug(key, jnp.asarray(pts), jnp.asarray(boxes))
            pts, boxes = np.asarray(p), np.asarray(b)
        points, n = pad_points(pts, self.max_points)
        gb, gl, gm = pad_boxes(boxes, labels, self.max_gt)
        return DetectionSample(points=points, num_points=np.int32(n),
                               gt_boxes=gb, gt_labels=gl, gt_mask=gm,
                               token=raw.get("token", str(index)))

    @staticmethod
    def collate(samples: Sequence[DetectionSample]) -> Dict[str, np.ndarray]:
        """Stack fixed-shape samples (reference collate_batch, minus the
        ragged-voxel special cases that no longer exist)."""
        keys = ["points", "num_points", "gt_boxes", "gt_labels", "gt_mask"]
        out = {k: np.stack([s[k] for s in samples]) for k in keys}
        out["tokens"] = [s["token"] for s in samples]
        return out


@register_dataset("Custom")
class CustomDetection(DetectionDatasetBase):
    """Folder of .pcd.bin / .npy point files + optional <stem>.boxes.npy
    ([G, 10] rows: box 9 + label) — the reference CustomDataset niche."""

    def __init__(self, root: str, **kw):
        super().__init__(**kw)
        root_p = pathlib.Path(root)
        self.files: List[pathlib.Path] = sorted(
            list(root_p.glob("*.pcd.bin")) + list(root_p.glob("*.npy")))
        self.files = [f for f in self.files
                      if not f.name.endswith(".boxes.npy")]

    def __len__(self):
        return len(self.files)

    def load_raw(self, index: int) -> Dict:
        f = self.files[index]
        if f.suffix == ".npy":
            pts = np.load(f).astype(np.float32)
        else:
            from ..native import load_points
            pts, n = load_points(str(f), self.max_points)
            pts = pts[:n]
        out = {"points": pts[:, :self.num_point_features],
               "token": f.stem}
        bf = f.with_suffix(".boxes.npy")
        if bf.exists():
            rows = np.load(bf).astype(np.float32)
            out["gt_boxes"] = rows[:, :9]
            out["gt_labels"] = rows[:, 9].astype(np.int32)
        return out


def balanced_resample_indices(labels_per_sample, num_classes: int,
                              seed: int = 0):
    """CBGS class-balanced resampling (reference nuscenes_dataset.py:48-83
    balanced_infos_resampling): duplicate sample indices so every class
    contributes ~1/num_classes of the epoch. labels_per_sample: list of
    int arrays (classes present in each sample)."""
    rng = np.random.default_rng(seed)
    cls_to_samples: Dict[int, List[int]] = {c: [] for c in range(num_classes)}
    for i, labels in enumerate(labels_per_sample):
        for c in set(np.asarray(labels).tolist()):
            if 0 <= c < num_classes:
                cls_to_samples[c].append(i)
    total = len(labels_per_sample)
    frac = 1.0 / num_classes
    out: List[int] = []
    for c, samples in cls_to_samples.items():
        if not samples:
            continue
        want = int(total * frac)
        picks = rng.choice(samples, want, replace=True)
        out.extend(picks.tolist())
    if not out:
        return list(range(total))
    return out


@register_dataset("NuScenes")
class NuScenesDetection(DetectionDatasetBase):
    """nuScenes keyframes with multi-sweep accumulation (reference
    nuscenes_dataset.py:101-118) and box targets from sample_annotation.
    Requires the devkit + raw data at runtime."""

    CLASSES = ("car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone")

    def __init__(self, dataroot: str, version: str = "v1.0-trainval",
                 sweeps: int = 10, nusc=None, **kw):
        super().__init__(**kw)
        if nusc is None:
            from nuscenes import NuScenes
            nusc = NuScenes(version=version, dataroot=dataroot,
                            verbose=False)
        self.nusc = nusc
        self.sweeps = sweeps
        self.samples = list(nusc.sample)

    def __len__(self):
        return len(self.samples)

    def _load_cloud(self, sd) -> np.ndarray:
        path = pathlib.Path(self.nusc.dataroot) / sd["filename"]
        from ..native import load_points
        pts, n = load_points(str(path), self.max_points)
        return pts[:n]

    def load_raw(self, index: int) -> Dict:
        sample = self.samples[index]
        sd = self.nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        clouds = [self._load_cloud(sd)]
        # accumulate previous sweeps in the keyframe's ego frame
        prev = sd["prev"]
        for _ in range(self.sweeps - 1):
            if not prev:
                break
            sd_p = self.nusc.get("sample_data", prev)
            clouds.append(self._load_cloud(sd_p))
            prev = sd_p["prev"]
        pts = np.concatenate(clouds, axis=0)

        boxes, labels = [], []
        for tok in sample["anns"]:
            ann = self.nusc.get("sample_annotation", tok)
            name = ann["category_name"]
            cls = next((i for i, c in enumerate(self.CLASSES)
                        if c in name), None)
            if cls is None:
                continue
            from pyquaternion import Quaternion
            q = Quaternion(ann["rotation"])
            yaw = q.yaw_pitch_roll[0]
            w, l, h = ann["size"]
            x, y, z = ann["translation"]
            boxes.append([x, y, z, l, w, h, yaw, 0.0, 0.0])
            labels.append(cls)
        out = {"points": pts, "token": sample["token"]}
        if boxes:
            out["gt_boxes"] = np.asarray(boxes, np.float32)
            out["gt_labels"] = np.asarray(labels, np.int32)
        return out
