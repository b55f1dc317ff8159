"""Box-convention normalization for visualization.

Re-design of the reference's model-flavor handling
(src/rerun-visualization/viz_seq_dataset_with_boxes.py:89-100): VoxelNeXt/
CenterPoint emit [x, y, z, w, l, h, yaw] with a +pi/2 yaw offset relative to
the pcdet convention [x, y, z, l, w, h, heading]; rerun's Boxes3D wants
half-sizes + rotation.
"""
from __future__ import annotations

import numpy as np


def normalize_box_convention(boxes: np.ndarray,
                             flavor: str = "pcdet") -> np.ndarray:
    """-> boxes in pcdet convention [x, y, z, dx(l), dy(w), dz(h), heading].

    flavor: "pcdet" (identity) or "centerpoint" (VoxelNeXt/CenterPoint
    [w, l, h] + yaw + pi/2, reference :89-100).
    """
    boxes = np.asarray(boxes, np.float32).copy()
    if flavor == "pcdet":
        return boxes
    if flavor == "centerpoint":
        out = boxes.copy()
        out[:, 3] = boxes[:, 4]          # l <- second size
        out[:, 4] = boxes[:, 3]          # w <- first size
        out[:, 6] = boxes[:, 6] + np.pi / 2
        return out
    raise ValueError(f"unknown flavor {flavor!r}")


def to_half_sizes(boxes: np.ndarray):
    """pcdet boxes -> (centers [N,3], half_sizes [N,3], yaw [N]) for rerun."""
    return boxes[:, :3], boxes[:, 3:6] * 0.5, boxes[:, 6]
