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
