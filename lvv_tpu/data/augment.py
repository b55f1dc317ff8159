"""Point-cloud augmentation, jit-able.

Re-design of the reference augmentor (pcdet/datasets/augmentor/
data_augmentor.py:1-319: random world flip / rotation / scaling /
translation, applied to points AND gt boxes on host numpy). Here each
transform is a pure jax function over fixed-shape arrays so augmentation
runs on-device inside the input pipeline; randomness comes from explicit
PRNG keys.

gt boxes are [G, 7+] pcdet-convention; points [N, 3+]. The gt-paste
database sampler (database_sampler.py) is a host-side data tool and lands
with the dataset ports.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def random_flip(key, points, boxes, axis: str = "x"):
    """Flip along x (across the y axis) or y with prob 0.5
    (reference random_world_flip)."""
    do = jax.random.bernoulli(key)
    if axis == "x":
        p = points.at[:, 1].multiply(jnp.where(do, -1.0, 1.0))
        b = boxes.at[:, 1].multiply(jnp.where(do, -1.0, 1.0))
        b = b.at[:, 6].multiply(jnp.where(do, -1.0, 1.0))
        if b.shape[1] >= 9:
            b = b.at[:, 8].multiply(jnp.where(do, -1.0, 1.0))
    else:
        p = points.at[:, 0].multiply(jnp.where(do, -1.0, 1.0))
        b = boxes.at[:, 0].multiply(jnp.where(do, -1.0, 1.0))
        b = b.at[:, 6].set(jnp.where(do, jnp.pi - boxes[:, 6], boxes[:, 6]))
        if b.shape[1] >= 9:
            b = b.at[:, 7].multiply(jnp.where(do, -1.0, 1.0))
    return p, b


def random_rotation(key, points, boxes,
                    rot_range: Tuple[float, float] = (-0.3925, 0.3925)):
    """Rotate the whole world around +z (reference random_world_rotation)."""
    ang = jax.random.uniform(key, minval=rot_range[0], maxval=rot_range[1])
    c, s = jnp.cos(ang), jnp.sin(ang)
    rot = jnp.asarray([[c, -s], [s, c]])
    p = points.at[:, :2].set(points[:, :2] @ rot.T)
    b = boxes.at[:, :2].set(boxes[:, :2] @ rot.T)
    b = b.at[:, 6].add(ang)
    if b.shape[1] >= 9:
        b = b.at[:, 7:9].set(boxes[:, 7:9] @ rot.T)
    return p, b


def random_scaling(key, points, boxes,
                   scale_range: Tuple[float, float] = (0.95, 1.05)):
    s = jax.random.uniform(key, minval=scale_range[0], maxval=scale_range[1])
    p = points.at[:, :3].multiply(s)
    b = boxes.at[:, :6].multiply(s)
    if b.shape[1] >= 9:
        b = b.at[:, 7:9].multiply(s)
    return p, b


def random_translation(key, points, boxes, std: float = 0.2):
    off = jax.random.normal(key, (3,)) * std
    p = points.at[:, :3].add(off)
    b = boxes.at[:, :3].add(off)
    return p, b


def augment(key, points, boxes, *, flip_x=True, flip_y=False,
            rot_range=(-0.3925, 0.3925), scale_range=(0.95, 1.05),
            translate_std: float = 0.0):
    """The reference's default chain: flip -> rotate -> scale [-> translate]
    (cbgs_voxel0075_voxelnext.yaml AUGMENTOR config)."""
    keys = jax.random.split(key, 4)
    if flip_x:
        points, boxes = random_flip(keys[0], points, boxes, "x")
    if flip_y:
        points, boxes = random_flip(keys[1], points, boxes, "y")
    points, boxes = random_rotation(keys[2], points, boxes, rot_range)
    points, boxes = random_scaling(keys[3], points, boxes, scale_range)
    if translate_std > 0:
        points, boxes = random_translation(
            jax.random.fold_in(key, 7), points, boxes, translate_std)
    return points, boxes


# ----------------------------------------------------- local (per-box) augs
# Reference augmentor_utils local_* family (data_augmentor.py:158-205):
# each gt box gets its own random transform, applied to the points inside
# it. Fixed-shape: points-in-box membership is a [N, G] mask; a point in
# several boxes follows the last one, like sequential host loops do.


def _in_box_mask(points, boxes):
    """[N, G] rotated-box membership (xy footprint + z extent)."""
    d = points[:, None, :3] - boxes[None, :, :3]
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    lx = c[None, :] * d[..., 0] - s[None, :] * d[..., 1]
    ly = s[None, :] * d[..., 0] + c[None, :] * d[..., 1]
    return ((jnp.abs(lx) <= boxes[None, :, 3] / 2)
            & (jnp.abs(ly) <= boxes[None, :, 4] / 2)
            & (jnp.abs(d[..., 2]) <= boxes[None, :, 5] / 2))


def _apply_per_box(points, boxes, centers_new, delta_yaw, scale):
    """Shared machinery: move each box's interior points with the box."""
    mask = _in_box_mask(points, boxes)                       # [N, G]
    # last-match-wins box assignment per point
    gidx = jnp.where(mask.any(axis=1),
                     (mask.shape[1] - 1)
                     - jnp.argmax(mask[:, ::-1], axis=1), -1)
    owned = gidx >= 0
    g = jnp.clip(gidx, 0, boxes.shape[0] - 1)
    rel = points[:, :3] - boxes[g, :3]
    cy, sy = jnp.cos(delta_yaw)[g], jnp.sin(delta_yaw)[g]
    rx = cy * rel[:, 0] - sy * rel[:, 1]
    ry = sy * rel[:, 0] + cy * rel[:, 1]
    rel_new = jnp.stack([rx, ry, rel[:, 2]], axis=1) * scale[g, None]
    moved = centers_new[g] + rel_new
    xyz = jnp.where(owned[:, None], moved, points[:, :3])
    points = points.at[:, :3].set(xyz)
    boxes = boxes.at[:, :3].set(centers_new)
    boxes = boxes.at[:, 3:6].multiply(scale[:, None])
    boxes = boxes.at[:, 6].add(delta_yaw)
    return points, boxes


def random_local_rotation(key, points, boxes,
                          rot_range=(-0.15707963, 0.15707963)):
    """Per-box rotation about each box center (reference
    random_local_rotation)."""
    ang = jax.random.uniform(key, (boxes.shape[0],),
                             minval=rot_range[0], maxval=rot_range[1])
    return _apply_per_box(points, boxes, boxes[:, :3], ang,
                          jnp.ones(boxes.shape[0]))


def random_local_translation(key, points, boxes, std: float = 0.25,
                             along=("x", "y", "z")):
    """Per-box center jitter (reference random_local_translation)."""
    off = jax.random.normal(key, (boxes.shape[0], 3)) * std
    axes = jnp.asarray(["x" in along, "y" in along, "z" in along],
                       jnp.float32)
    centers = boxes[:, :3] + off * axes[None, :]
    return _apply_per_box(points, boxes, centers,
                          jnp.zeros(boxes.shape[0]),
                          jnp.ones(boxes.shape[0]))


def random_local_scaling(key, points, boxes, scale_range=(0.95, 1.05)):
    """Per-box scaling about each box center (reference
    random_local_scaling)."""
    s = jax.random.uniform(key, (boxes.shape[0],),
                           minval=scale_range[0], maxval=scale_range[1])
    return _apply_per_box(points, boxes, boxes[:, :3],
                          jnp.zeros(boxes.shape[0]), s)


def global_frustum_dropout(key, points, intensity_range=(0.0, 0.2),
                           direction: str = "top"):
    """World frustum dropout (reference random_world_frustum_dropout):
    drops a random azimuth wedge ('top': highest-z fraction instead).
    Returns a keep mask — the host pipeline compacts (fixed-shape callers
    can also zero the dropped rows)."""
    frac = jax.random.uniform(key, (), minval=intensity_range[0],
                              maxval=intensity_range[1])
    if direction == "top":
        zmin, zmax = points[:, 2].min(), points[:, 2].max()
        cut = zmax - frac * (zmax - zmin)
        return points[:, 2] <= cut
    az = jnp.arctan2(points[:, 1], points[:, 0])
    start = jax.random.uniform(key, (), minval=-jnp.pi, maxval=jnp.pi)
    width = frac * 2.0 * jnp.pi
    rel = (az - start) % (2.0 * jnp.pi)
    return rel > width
