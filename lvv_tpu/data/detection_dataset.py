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
                 num_point_features: int = 4, gt_sampler=None):
        self.point_range = tuple(point_range)
        self.max_points = max_points
        self.max_gt = max_gt
        self.do_augment = augment
        self.rng = np.random.default_rng(seed)
        self.num_point_features = num_point_features
        # optional gt-paste augmentor (lvv_tpu.data.gt_sampler.GTSampler),
        # applied on the raw scene before world augmentation — the
        # reference pipeline's gt_sampling step (database_sampler.py)
        self.gt_sampler = gt_sampler

    # subclasses implement raw access
    def load_raw(self, index: int) -> Dict:
        raise NotImplementedError

    def __getitem__(self, index: int) -> DetectionSample:
        raw = self.load_raw(index)
        pts = raw["points"]
        boxes = raw.get("gt_boxes", np.zeros((0, 9), np.float32))
        labels = raw.get("gt_labels", np.zeros((0,), np.int32))
        if self.gt_sampler is not None:
            pts, boxes, labels = self.gt_sampler(pts, boxes, labels)
        pts = mask_points_by_range(pts, self.point_range)
        pts = shuffle_points(pts, self.rng)
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


@register_dataset("Waymo")
class WaymoDetection(DetectionDatasetBase):
    """Waymo Open Dataset over preprocessed infos + per-frame .npy point
    files (reference pcdet/datasets/waymo/waymo_dataset.py:1-827: raw
    tfrecords are decoded once by the devkit into
    `<sequence>/{idx:04d}.npy` [N, 6] (x y z intensity elongation NLZ) and
    info dicts carrying annos in the LIDAR frame; __getitem__ drops
    NLZ-flagged returns, tanh-squashes intensity, and filters 'unknown'
    boxes). Infos are passed in (or loaded from a pickle path) — the
    tfrecord decode step needs the waymo-open-dataset package and happens
    offline, exactly as in the reference."""

    CLASSES = ("Vehicle", "Pedestrian", "Cyclist")

    def __init__(self, dataroot: Optional[str] = None, infos=None,
                 info_path: Optional[str] = None,
                 filter_empty_boxes: bool = True,
                 sequence_offsets: Optional[Sequence[int]] = None, **kw):
        # multi-frame mode (reference SEQUENCE_CONFIG.SAMPLE_OFFSET, e.g.
        # (-4, 0) for MPPNet's 4 past frames) adds a 6th timestamp channel
        kw.setdefault("num_point_features",
                      6 if sequence_offsets is not None else 5)
        super().__init__(**kw)
        self.root = pathlib.Path(dataroot) if dataroot else None
        if infos is None:
            import pickle
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        self.infos = list(infos)
        self.filter_empty_boxes = filter_empty_boxes
        self.sequence_offsets = tuple(sequence_offsets) \
            if sequence_offsets is not None else None
        if self.sequence_offsets is not None:
            # per-sequence ordered info lists + each info's position,
            # mirroring the reference's seq_name_to_infos positional
            # indexing (waymo_dataset.py:295)
            self._seq_infos: Dict[str, List[Dict]] = {}
            self._seq_pos: List[int] = []
            for info in self.infos:
                seq = info["point_cloud"]["lidar_sequence"]
                lst = self._seq_infos.setdefault(seq, [])
                self._seq_pos.append(len(lst))
                lst.append(info)

    def __len__(self):
        return len(self.infos)

    def _frame_feats(self, info: Dict) -> np.ndarray:
        """One frame's [N, 5] features (NLZ-filtered, tanh intensity)."""
        pc = info["point_cloud"]
        path = pathlib.Path(pc["lidar_sequence"]) / \
            f"{pc['sample_idx']:04d}.npy"
        if self.root is not None:
            path = self.root / path
        pts = np.load(path).astype(np.float32)          # [N, 6]
        pts = pts[pts[:, 5] == -1] if pts.shape[1] > 5 else pts
        return np.concatenate(
            [pts[:, :3], np.tanh(pts[:, 3:4]), pts[:, 4:5]], axis=1)

    def _sequence_points(self, index: int, feats: np.ndarray):
        """Accumulate past frames into the current one (reference
        get_sequence_data, waymo_dataset.py:250-337): prior points go
        lidar -> global via their pose, then global -> current lidar via
        the current pose inverse; each frame gets a 0.1 s-per-step
        timestamp channel; prior frames drop ego-radius points."""
        info = self.infos[index]
        seq = info["point_cloud"]["lidar_sequence"]
        seq_list = self._seq_infos[seq]
        pos = self._seq_pos[index]
        off0, off1 = self.sequence_offsets
        pos_pre = np.clip(pos + np.arange(off0, off1), 0, None)[::-1]
        pose_cur = np.asarray(info["pose"], np.float64).reshape(4, 4)
        cur = np.concatenate(
            [feats, np.zeros((len(feats), 1), np.float32)], axis=1)
        chunks, counts = [cur], [len(cur)]
        inv_cur = np.linalg.inv(pose_cur)
        for p in pos_pre:
            info_pre = seq_list[int(p)]
            f_pre = self._frame_feats(info_pre)
            pose_pre = np.asarray(info_pre["pose"], np.float64
                                  ).reshape(4, 4)
            xyz = f_pre[:, :3] @ pose_pre[:3, :3].T + pose_pre[:3, 3]
            xyz = xyz @ inv_cur[:3, :3].T + inv_cur[:3, 3]
            ts = 0.1 * (pos - int(p))
            f_pre = np.concatenate(
                [xyz.astype(np.float32), f_pre[:, 3:],
                 np.full((len(f_pre), 1), ts, np.float32)], axis=1)
            keep = ~((np.abs(f_pre[:, 0]) < 1.0)
                     & (np.abs(f_pre[:, 1]) < 1.0))
            f_pre = f_pre[keep]
            chunks.append(f_pre)
            counts.append(len(f_pre))
        return np.concatenate(chunks, axis=0), np.asarray(counts, np.int32)

    def __getitem__(self, index: int) -> DetectionSample:
        if self.sequence_offsets is None:
            return super().__getitem__(index)
        # sequence mode keeps the frame-contiguous layout (no range mask /
        # shuffle — they would scramble the per-frame grouping MPPNet's
        # stack_sequence_frames relies on) and carries frame_counts
        # through, clipped consistently with the point padding.
        raw = self.load_raw(index)
        pts = raw["points"]
        points, n = pad_points(pts, self.max_points)
        boxes = raw.get("gt_boxes", np.zeros((0, 9), np.float32))
        labels = raw.get("gt_labels", np.zeros((0,), np.int32))
        gb, gl, gm = pad_boxes(boxes, labels, self.max_gt)
        sample = DetectionSample(points=points, num_points=np.int32(n),
                                 gt_boxes=gb, gt_labels=gl, gt_mask=gm,
                                 token=raw.get("token", str(index)))
        fc = np.asarray(raw["frame_counts"], np.int64)
        kept_cum = np.minimum(np.cumsum(fc), self.max_points)
        sample["frame_counts"] = np.diff(
            np.concatenate([[0], kept_cum])).astype(np.int32)
        return sample

    def load_raw(self, index: int) -> Dict:
        info = self.infos[index]
        pc = info["point_cloud"]
        feats = self._frame_feats(info)
        out = {"token": f"{pc['lidar_sequence']}_{pc['sample_idx']}"}
        if self.sequence_offsets is not None:
            feats, frame_counts = self._sequence_points(index, feats)
            out["frame_counts"] = frame_counts
        out["points"] = feats
        annos = info.get("annos")
        if annos is not None and len(annos.get("name", [])):
            names = np.asarray(annos["name"])
            boxes = np.asarray(annos["gt_boxes_lidar"],
                               np.float32).reshape(len(names), -1)
            keep = np.asarray([n in self.CLASSES for n in names], bool)
            if self.filter_empty_boxes and "num_points_in_gt" in annos:
                keep &= np.asarray(annos["num_points_in_gt"]) > 0
            b9 = np.zeros((int(keep.sum()), 9), np.float32)
            b9[:, :min(9, boxes.shape[1])] = \
                boxes[keep][:, :min(9, boxes.shape[1])]
            out["gt_boxes"] = b9
            out["gt_labels"] = np.asarray(
                [self.CLASSES.index(n) for n in names[keep]], np.int32)
        return out


def stack_sequence_frames(points: np.ndarray, frame_counts,
                          max_per_frame: int):
    """Concatenated multi-frame points (WaymoDetection sequence mode) ->
    the fixed ``[T, P, F]`` stack + clipped per-frame counts that
    MPPNet's heads consume (lvv_tpu.models.mppnet: frame_points /
    frame_counts). Frames beyond ``max_per_frame`` truncate, mirroring
    every other fixed-capacity op here."""
    frame_counts = np.asarray(frame_counts, np.int64)
    out = np.zeros((len(frame_counts), max_per_frame, points.shape[1]),
                   points.dtype)
    kept = np.minimum(frame_counts, max_per_frame).astype(np.int32)
    off = 0
    for t, c in enumerate(frame_counts):
        out[t, :kept[t]] = points[off:off + kept[t]]
        off += int(c)
    return out, kept


@register_dataset("ONCE")
class ONCEDetection(DetectionDatasetBase):
    """ONCE dataset over info dicts + .bin point files (reference
    pcdet/datasets/once/once_dataset.py:1-443: infos carry frame_id,
    sequence_id, and annos {name, boxes_3d [G, 7]} already in the LIDAR
    frame; points are float32 [N, 4])."""

    CLASSES = ("Car", "Bus", "Truck", "Pedestrian", "Cyclist")

    def __init__(self, dataroot: Optional[str] = None, infos=None,
                 info_path: Optional[str] = None, **kw):
        super().__init__(**kw)
        self.root = pathlib.Path(dataroot) if dataroot else None
        if infos is None:
            import pickle
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        self.infos = [i for i in infos if "lidar_path" in i or
                      "frame_id" in i]

    def __len__(self):
        return len(self.infos)

    def load_raw(self, index: int) -> Dict:
        info = self.infos[index]
        path = info.get("lidar_path") or (
            pathlib.Path(str(info["sequence_id"])) / "lidar_roof" /
            f"{info['frame_id']}.bin")
        path = pathlib.Path(path)
        if self.root is not None and not path.is_absolute():
            path = self.root / path
        raw = np.fromfile(path, np.float32)
        pts = raw.reshape(-1, 4) if raw.size % 4 == 0 else \
            raw.reshape(-1, 5)[:, :4]
        out = {"points": pts, "token": str(info.get("frame_id", index))}
        annos = info.get("annos")
        if annos is not None:
            names = np.asarray(annos["name"])
            boxes = np.asarray(annos["boxes_3d"],
                               np.float32).reshape(len(names), 7)
            keep = np.asarray([n in self.CLASSES for n in names], bool)
            b9 = np.zeros((int(keep.sum()), 9), np.float32)
            b9[:, :7] = boxes[keep]
            out["gt_boxes"] = b9
            out["gt_labels"] = np.asarray(
                [self.CLASSES.index(n) for n in names[keep]], np.int32)
        return out


@register_dataset("Lyft")
class LyftDetection(DetectionDatasetBase):
    """Lyft Level-5 dataset over info dicts (reference
    pcdet/datasets/lyft/lyft_dataset.py:43-133: same info schema as
    nuScenes — lidar_path + transform_matrix'd sweeps — so the sweep
    machinery is shared with lvv_tpu.data.nuscenes_utils; Lyft lidar rows
    are float32 x 5 like nuScenes). Infos come precomputed or from a
    live lyft-devkit handle via the same duck-typed table interface."""

    CLASSES = ("car", "truck", "bus", "emergency_vehicle", "other_vehicle",
               "motorcycle", "bicycle", "pedestrian", "animal")

    def __init__(self, dataroot: Optional[str] = None, infos=None,
                 info_path: Optional[str] = None, sweeps: int = 1, **kw):
        kw.setdefault("num_point_features", 5)
        super().__init__(**kw)
        self.root = pathlib.Path(dataroot) if dataroot else None
        self.sweeps = sweeps
        if infos is None:
            import pickle
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        self.infos = list(infos)

    def __len__(self):
        return len(self.infos)

    def load_raw(self, index: int) -> Dict:
        from .nuscenes_utils import get_lidar_with_sweeps
        info = self.infos[index]
        pts = get_lidar_with_sweeps(info, max_sweeps=self.sweeps,
                                    root=self.root, rng=self.rng)
        out = {"points": pts.astype(np.float32),
               "token": info.get("token", str(index))}
        names = info.get("gt_names")
        if names is not None and len(names):
            keep = np.asarray([n in self.CLASSES for n in names], bool)
            boxes = np.asarray(info["gt_boxes"],
                               np.float32).reshape(len(names), -1)[keep]
            b9 = np.zeros((len(boxes), 9), np.float32)
            b9[:, :min(9, boxes.shape[1])] = boxes[:, :9]
            out["gt_boxes"] = b9
            out["gt_labels"] = np.asarray(
                [self.CLASSES.index(n) for n in np.asarray(names)[keep]],
                np.int32)
        return out


@register_dataset("Pandaset")
class PandasetDetection(DetectionDatasetBase):
    """Pandaset over preprocessed infos (reference
    pcdet/datasets/pandaset/pandaset_dataset.py:101-130: raw pandas
    pkl.gz frames are decoded offline into ego-frame points + boxes; the
    loader consumes {lidar_path (npy), gt_boxes, gt_names})."""

    CLASSES = ("Car", "Pedestrian", "Pickup Truck", "Semi-truck",
               "Cyclist")

    def __init__(self, dataroot: Optional[str] = None, infos=None,
                 info_path: Optional[str] = None, classes=None, **kw):
        super().__init__(**kw)
        self.root = pathlib.Path(dataroot) if dataroot else None
        if classes is not None:
            self.CLASSES = tuple(classes)
        if infos is None:
            import pickle
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        self.infos = list(infos)

    def __len__(self):
        return len(self.infos)

    def load_raw(self, index: int) -> Dict:
        info = self.infos[index]
        path = pathlib.Path(info["lidar_path"])
        if self.root is not None and not path.is_absolute():
            path = self.root / path
        pts = np.load(path).astype(np.float32) if path.suffix == ".npy" \
            else np.fromfile(path, np.float32).reshape(
                -1, self.num_point_features)
        out = {"points": pts[:, :self.num_point_features],
               "token": f"{info.get('sequence', 0)}_"
                        f"{info.get('frame_idx', index)}"}
        names = info.get("gt_names")
        if names is not None and len(names):
            keep = np.asarray([n in self.CLASSES for n in names], bool)
            boxes = np.asarray(info["gt_boxes"],
                               np.float32).reshape(len(names), -1)[keep]
            b9 = np.zeros((len(boxes), 9), np.float32)
            b9[:, :min(9, boxes.shape[1])] = boxes[:, :9]
            out["gt_boxes"] = b9
            out["gt_labels"] = np.asarray(
                [self.CLASSES.index(n) for n in np.asarray(names)[keep]],
                np.int32)
        return out


@register_dataset("Argo2")
class Argo2Detection(DetectionDatasetBase):
    """Argoverse 2 sensor dataset over preprocessed infos (reference
    pcdet/datasets/argo2/argo2_dataset.py:218-310: the av2 feather sweeps
    are decoded offline into velodyne/<id>.bin [N, 4] + info annos
    {name, gt_boxes_lidar})."""

    CLASSES = ("Regular_vehicle", "Pedestrian", "Bicyclist", "Bicycle",
               "Bus", "Truck", "Motorcyclist", "Motorcycle")

    def __init__(self, dataroot: Optional[str] = None, infos=None,
                 info_path: Optional[str] = None, classes=None, **kw):
        super().__init__(**kw)
        self.root = pathlib.Path(dataroot) if dataroot else None
        if classes is not None:
            self.CLASSES = tuple(classes)
        if infos is None:
            import pickle
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        self.infos = list(infos)

    def __len__(self):
        return len(self.infos)

    def load_raw(self, index: int) -> Dict:
        info = self.infos[index]
        sid = info.get("sample_idx", info.get("frame_id", index))
        path = pathlib.Path(info.get("lidar_path",
                                     f"velodyne/{sid}.bin"))
        if self.root is not None and not path.is_absolute():
            path = self.root / path
        pts = np.fromfile(path, np.float32).reshape(-1, 4)
        out = {"points": pts[:, :self.num_point_features],
               "token": str(sid)}
        annos = info.get("annos")
        if annos is not None and len(annos.get("name", [])):
            names = np.asarray(annos["name"])
            boxes = np.asarray(annos["gt_boxes_lidar"],
                               np.float32).reshape(len(names), -1)
            keep = np.asarray([n in self.CLASSES for n in names], bool)
            b9 = np.zeros((int(keep.sum()), 9), np.float32)
            b9[:, :min(9, boxes.shape[1])] = \
                boxes[keep][:, :min(9, boxes.shape[1])]
            out["gt_boxes"] = b9
            out["gt_labels"] = np.asarray(
                [self.CLASSES.index(n) for n in names[keep]], np.int32)
        return out


@register_dataset("NuScenes")
class NuScenesDetection(DetectionDatasetBase):
    """nuScenes keyframes with ego-motion-compensated multi-sweep
    accumulation and LIDAR-frame box targets.

    Built on lvv_tpu.data.nuscenes_utils (the fill_trainval_infos /
    get_lidar_with_sweeps port — reference nuscenes_dataset.py:85-118,
    nuscenes_utils.py:312-470): every past sweep is transformed by the
    composed ``ref_from_car @ car_from_global @ global_from_car @
    car_from_current`` matrix and carries a time-lag 5th feature channel;
    gt boxes are moved global -> ego -> sensor so points and boxes share
    the keyframe LIDAR frame. Accepts either a live devkit handle (``nusc``,
    duck-typed) or precomputed ``infos``.
    """

    CLASSES = ("car", "truck", "construction_vehicle", "bus", "trailer",
               "barrier", "motorcycle", "bicycle", "pedestrian",
               "traffic_cone")

    def __init__(self, dataroot: Optional[str] = None,
                 version: str = "v1.0-trainval", sweeps: int = 10,
                 nusc=None, infos: Optional[List[Dict]] = None,
                 info_path: Optional[str] = None,
                 balanced_resampling: bool = False, **kw):
        kw.setdefault("num_point_features", 5)  # x y z intensity time_lag
        super().__init__(**kw)
        self.root = pathlib.Path(dataroot) if dataroot else None
        self.sweeps = sweeps
        from .nuscenes_utils import build_sample_info, finalize_info
        if infos is None and info_path is not None:
            import pickle
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        if infos is None:
            if nusc is None:
                try:
                    from nuscenes import NuScenes
                    nusc = NuScenes(version=version, dataroot=dataroot,
                                    verbose=False)
                except ImportError:
                    # devkit-free: the raw JSON tables are all we need
                    from .nuscenes_tables import TableNuScenes
                    nusc = TableNuScenes(version=version,
                                         dataroot=dataroot)
            # same post-build filters as fill_trainval_infos so live-devkit
            # and pickled-info paths produce identical info shapes
            infos = [finalize_info(build_sample_info(
                nusc, s, max_sweeps=sweeps, dataroot=dataroot))
                     for s in nusc.sample]
        self.infos = list(infos)
        if balanced_resampling:
            labels = [self._labels_of(i) for i in self.infos]
            order = balanced_resample_indices(labels, len(self.CLASSES),
                                              seed=kw.get("seed", 0))
            self.infos = [self.infos[i] for i in order]

    def _labels_of(self, info: Dict) -> np.ndarray:
        return np.asarray([self.CLASSES.index(n)
                           for n in info.get("gt_names", [])
                           if n in self.CLASSES], np.int32)

    def __len__(self):
        return len(self.infos)

    def load_raw(self, index: int) -> Dict:
        from .nuscenes_utils import get_lidar_with_sweeps
        info = self.infos[index]
        pts = get_lidar_with_sweeps(info, max_sweeps=self.sweeps,
                                    root=self.root, rng=self.rng)
        out = {"points": pts.astype(np.float32), "token": info["token"]}
        names = info.get("gt_names")
        if names is not None and len(names):
            keep = np.asarray([n in self.CLASSES for n in names], bool)
            boxes = np.asarray(info["gt_boxes"], np.float32)[keep]
            boxes = np.nan_to_num(boxes)  # SET_NAN_VELOCITY_TO_ZEROS
            out["gt_boxes"] = boxes
            out["gt_labels"] = np.asarray(
                [self.CLASSES.index(n) for n in np.asarray(names)[keep]],
                np.int32)
        return out
