"""Pooling ops: points-in-boxes, RoI-aware 3D pooling, LSS BEV pooling.

TPU-native replacements for three reference CUDA extensions:
- `roiaware_pool3d_cuda` (pcdet/ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:
  points_in_boxes_gpu/cpu + RoIAwarePool3d max/avg) -> vectorized
  point-in-rotated-box tests + segment_max/mean over (box, cell) ids.
- `roipoint_pool3d_cuda` (pcdet/ops/roipoint_pool3d): gather raw points per
  RoI into fixed slots.
- `bev_pool_ext` (pcdet/ops/bev_pool/src/bev_pool_cuda.cu QuickCumsum): the
  sorted-rank interval sum is exactly a segment_sum over linearized BEV bin
  ids — XLA's scatter-add handles it natively, autodiff gives the backward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .segment import segment_max, segment_mean, segment_sum


def points_in_rotated_boxes(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """[N,3+] points x [M,7] boxes -> bool [N, M] membership.

    Box frame: translate to center, rotate by -heading, test |u|<=dx/2 etc.
    (reference roiaware_pool3d_utils.points_in_boxes_cpu semantics; z is the
    box center as in pcdet)."""
    px = points[:, 0][:, None] - boxes[:, 0][None, :]
    py = points[:, 1][:, None] - boxes[:, 1][None, :]
    pz = points[:, 2][:, None] - boxes[:, 2][None, :]
    c = jnp.cos(-boxes[:, 6])[None, :]
    s = jnp.sin(-boxes[:, 6])[None, :]
    u = px * c - py * s
    v = px * s + py * c
    return ((jnp.abs(u) <= boxes[:, 3][None, :] * 0.5)
            & (jnp.abs(v) <= boxes[:, 4][None, :] * 0.5)
            & (jnp.abs(pz) <= boxes[:, 5][None, :] * 0.5))


def assign_points_to_boxes(points: jax.Array, boxes: jax.Array,
                           valid_points: jax.Array | None = None
                           ) -> jax.Array:
    """[N] int32: index of the first box containing each point, else -1
    (reference points_in_boxes_gpu contract)."""
    inside = points_in_rotated_boxes(points, boxes)
    if valid_points is not None:
        inside &= valid_points[:, None]
    any_box = jnp.any(inside, axis=1)
    first = jnp.argmax(inside, axis=1).astype(jnp.int32)
    return jnp.where(any_box, first, -1)


def roiaware_pool3d(points: jax.Array, features: jax.Array, boxes: jax.Array,
                    grid: int, *, mode: str = "max",
                    valid_points: jax.Array | None = None) -> jax.Array:
    """RoI-aware pooling (reference RoIAwarePool3d): for each box, a
    [grid,grid,grid] lattice of cells pools the features of points falling
    in each cell. Returns [M, grid, grid, grid, C].

    Each (point, box) pair maps to one cell id; pooled with segment_max or
    segment_mean over M*grid^3 segments. Empty cells are 0.
    """
    n, m = points.shape[0], boxes.shape[0]
    c_dim = features.shape[1]
    # local coords of every point in every box frame
    px = points[:, 0][:, None] - boxes[:, 0][None, :]
    py = points[:, 1][:, None] - boxes[:, 1][None, :]
    pz = points[:, 2][:, None] - boxes[:, 2][None, :]
    cth = jnp.cos(-boxes[:, 6])[None, :]
    sth = jnp.sin(-boxes[:, 6])[None, :]
    u = px * cth - py * sth
    v = px * sth + py * cth
    inside = ((jnp.abs(u) <= boxes[:, 3][None, :] * 0.5)
              & (jnp.abs(v) <= boxes[:, 4][None, :] * 0.5)
              & (jnp.abs(pz) <= boxes[:, 5][None, :] * 0.5))
    if valid_points is not None:
        inside &= valid_points[:, None]
    # cell index per (point, box)
    def cell(coord, size):
        rel = (coord / size[None, :] + 0.5) * grid
        return jnp.clip(rel.astype(jnp.int32), 0, grid - 1)
    xi = cell(u, boxes[:, 3])
    yi = cell(v, boxes[:, 4])
    zi = cell(pz, boxes[:, 5])
    box_ids = jnp.broadcast_to(jnp.arange(m)[None, :], (n, m))
    seg = ((box_ids * grid + xi) * grid + yi) * grid + zi
    num_seg = m * grid ** 3
    seg = jnp.where(inside, seg, num_seg)  # overflow bucket
    feats = jnp.broadcast_to(features[:, None, :], (n, m, c_dim))
    flat_seg = seg.reshape(-1)
    flat_feats = feats.reshape(-1, c_dim)
    if mode == "max":
        pooled = segment_max(flat_feats, flat_seg, num_seg + 1)
        counts = segment_sum(inside.reshape(-1).astype(jnp.int32), flat_seg,
                             num_seg + 1)
        pooled = jnp.where(counts[:, None] > 0, pooled, 0.0)
    elif mode == "avg":
        flat_feats = jnp.where(inside.reshape(-1)[:, None], flat_feats, 0.0)
        pooled = segment_mean(flat_feats, flat_seg, num_seg + 1)
    else:
        raise ValueError(f"mode {mode!r}")
    return pooled[:num_seg].reshape(m, grid, grid, grid, c_dim)


def roipoint_pool3d(points: jax.Array, features: jax.Array, boxes: jax.Array,
                    num_sampled: int,
                    valid_points: jax.Array | None = None):
    """Pool up to `num_sampled` raw points per RoI (reference
    roipoint_pool3d). Returns ([M, num_sampled, 3+C], empty_mask [M]).
    Deterministic: first points by input order."""
    inside = points_in_rotated_boxes(points, boxes)
    if valid_points is not None:
        inside &= valid_points[:, None]
    n, m = inside.shape
    # rank of each point within its box (by input order)
    rank = jnp.cumsum(inside.astype(jnp.int32), axis=0) - 1
    keep = inside & (rank < num_sampled)
    pf = jnp.concatenate([points[:, :3], features], axis=1)
    out = jnp.zeros((m, num_sampled, pf.shape[1]), pf.dtype)
    box_ids = jnp.broadcast_to(jnp.arange(m)[None, :], (n, m))
    out = out.at[jnp.where(keep, box_ids, m - 1).reshape(-1),
                 jnp.where(keep, rank, 0).reshape(-1)].add(
        jnp.where(keep.reshape(-1)[:, None],
                  jnp.broadcast_to(pf[:, None, :], (n, m, pf.shape[1])
                                   ).reshape(-1, pf.shape[1]), 0.0))
    empty = ~jnp.any(inside, axis=0)
    return out, empty


def bev_pool(features: jax.Array, bev_ids: jax.Array, valid: jax.Array,
             num_bins: int) -> jax.Array:
    """LSS-style BEV pooling (reference bev_pool/bev_pool.py:8-97): sum
    frustum features sharing a BEV bin. features [N, C], bev_ids [N] int32
    linearized (b*Z*H*W + ...), valid [N] bool -> [num_bins, C].

    The CUDA interval-cumsum trick exists to avoid atomics; XLA scatter-add
    is already deterministic and fused, and autodiff provides the backward
    (gather), so this is a one-liner."""
    ids = jnp.where(valid, bev_ids, num_bins)
    feats = jnp.where(valid[:, None], features, 0.0)
    return segment_sum(feats, ids, num_bins + 1)[:num_bins]
