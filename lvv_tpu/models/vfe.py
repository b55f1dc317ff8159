"""Dynamic voxel/pillar feature encoders.

Re-design of the reference's dynamic VFE family
(pcdet/models/backbones_3d/vfe/dynamic_mean_vfe.py, dynamic_pillar_vfe.py,
dynamic_voxel_vfe.py, vfe/__init__.py:9-18): "dynamic" means NO
max-points-per-voxel bucketing — every in-range point contributes via
scatter ops (torch_scatter in the reference; jax.ops.segment_* here).

The framework's `ops.voxelize.voxelize_mean` already computes exactly
DynamicMeanVFE semantics (fused voxelize + uncapped per-voxel mean);
this module adds the decorated-point dynamic pillar encoders:

- DynamicPillarVFE: per point, append cluster offset (point - pillar
  point-mean) and pillar-center offset, pointwise Linear+LN+ReLU, then
  segment-MAX per pillar (PFNLayerV2 semantics);
- DynamicPillarVFESimple2D: same without the cluster branch (the
  reference's USE_CLUSTER/ABSLOTE_XYZ toggles collapsed to its defaults).

All fixed-shape: point->pillar slots come from one sort + unique, outputs
pad to max_pillars with -1 coords.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.segment import segment_max, segment_mean, unique_with_inverse
from ..ops.voxelize import VoxelGrid, Voxels
from .layers import Dense


def point_pillar_slots(points: jax.Array, num_points: jax.Array,
                       grid: VoxelGrid, max_pillars: int):
    """-> (slot [N] int32 in [0, max_pillars], valid [N], coords
    [max_pillars, 3] (0, y, x), counts [max_pillars]). 2D pillar ids over
    the xy grid; slot == max_pillars marks dropped/overflow points."""
    nx, ny = grid.grid_size[0], grid.grid_size[1]
    x0, y0 = grid.point_range[0], grid.point_range[1]
    xi = jnp.floor((points[:, 0] - x0) / grid.voxel_size[0]).astype(jnp.int32)
    yi = jnp.floor((points[:, 1] - y0) / grid.voxel_size[1]).astype(jnp.int32)
    zok = (points[:, 2] >= grid.point_range[2]) & \
        (points[:, 2] <= grid.point_range[5])
    valid = ((jnp.arange(points.shape[0]) < num_points)
             & (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny) & zok)
    sent = jnp.int32(jnp.iinfo(jnp.int32).max)
    pid = jnp.where(valid, yi * nx + xi, sent)
    # max_pillars + 1 slots: the unique clamp would otherwise alias every
    # overflow pillar into slot max_pillars-1, corrupting its features —
    # the reserved dump slot turns overflow into a clean drop
    uids, inverse, counts, n_unique = unique_with_inverse(
        pid, sent, max_unique=max_pillars + 1)
    from ..ops.sparse import report_overflow
    report_overflow("dynamic_pillar_vfe", n_unique, max_pillars)
    slot = jnp.where(valid & (inverse < max_pillars), inverse, max_pillars)
    valid = valid & (slot < max_pillars)
    uids = uids[:max_pillars]
    coords = jnp.where(
        (uids != sent)[:, None],
        jnp.stack([jnp.zeros_like(uids), uids // nx, uids % nx], axis=1),
        -1)
    return slot, valid, coords.astype(jnp.int32), counts[:max_pillars]


class DynamicPillarVFE(nn.Module):
    """Uncapped pillar encoder (reference dynamic_pillar_vfe.py
    PFNLayerV2 stack): decorate -> pointwise MLP -> segment max."""
    out_ch: int = 64
    use_cluster: bool = True

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array,
                 grid: VoxelGrid, max_pillars: int) -> Voxels:
        n = points.shape[0]
        slot, valid, coords, counts = point_pillar_slots(
            points, num_points, grid, max_pillars)
        parts = [points]
        if self.use_cluster:
            mean_xyz = segment_mean(
                jnp.where(valid[:, None], points[:, :3], 0.0), slot,
                max_pillars + 1)[:max_pillars]
            safe = jnp.minimum(slot, max_pillars - 1)
            parts.append(points[:, :3] - mean_xyz[safe])
        cx = (coords[:, 2].astype(jnp.float32) + 0.5) * grid.voxel_size[0] \
            + grid.point_range[0]
        cy = (coords[:, 1].astype(jnp.float32) + 0.5) * grid.voxel_size[1] \
            + grid.point_range[1]
        safe = jnp.minimum(slot, max_pillars - 1)
        parts.append(jnp.stack([points[:, 0] - cx[safe],
                                points[:, 1] - cy[safe]], axis=1))
        dec = jnp.where(valid[:, None], jnp.concatenate(parts, axis=1), 0.0)
        h = nn.relu(nn.LayerNorm(name="ln")(Dense(self.out_ch,
                                                  name="fc")(dec)))
        h = jnp.where(valid[:, None], h, -jnp.inf)
        pooled = segment_max(h, jnp.where(valid, slot, max_pillars),
                             max_pillars + 1)[:max_pillars]
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        return Voxels(features=pooled, coords=coords,
                      num_points=counts,
                      num_voxels=jnp.sum((coords[:, 0] >= 0)
                                         .astype(jnp.int32)),
                      point_voxel=jnp.where(valid, slot, -1))


class DynamicPillarVFESimple2D(DynamicPillarVFE):
    """Center-offset-only variant (reference
    dynamic_pillar_vfe_simple2d semantics)."""
    use_cluster: bool = False


class DynamicVoxelVFE(nn.Module):
    """Uncapped 3D voxel encoder (reference dynamic_voxel_vfe.py): the
    decorated-point -> MLP -> segment-max recipe of DynamicPillarVFE over
    TRUE 3D voxels (z participates in the grid and in the center offset).

    `num_layers=2` stacks a second PFNLayerV2 the reference way
    (dynamic_pillar_vfe.py PFNLayerV2: non-last layers segment-max their
    output and concat the pooled voxel feature back onto every point
    before the next pointwise layer) — the DSVT presets use this
    (dsvt yamls: NUM_FILTERS [192, 192])."""
    out_ch: int = 64
    num_layers: int = 1

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array,
                 grid: VoxelGrid, max_voxels: int) -> Voxels:
        from ..ops.voxelize import _point_voxel_ids
        ids, valid, sent = _point_voxel_ids(points, num_points, grid)
        uids, inverse, counts, n_unique = unique_with_inverse(
            ids, sent, max_unique=max_voxels + 1)
        from ..ops.sparse import report_overflow
        report_overflow("dynamic_voxel_vfe", n_unique, max_voxels)
        slot = jnp.where(valid & (inverse < max_voxels), inverse,
                         max_voxels)
        valid = valid & (slot < max_voxels)
        uids = uids[:max_voxels]
        nx, ny, _ = grid.grid_size
        zc = (uids // (nx * ny)).astype(jnp.int32)
        yc = ((uids // nx) % ny).astype(jnp.int32)
        xc = (uids % nx).astype(jnp.int32)
        slot_ok = uids != sent
        coords = jnp.where(slot_ok[:, None],
                           jnp.stack([zc, yc, xc], axis=1), -1)

        mean_xyz = segment_mean(
            jnp.where(valid[:, None], points[:, :3], 0.0), slot,
            max_voxels + 1)[:max_voxels]
        safe = jnp.minimum(slot, max_voxels - 1)
        vs = jnp.asarray(grid.voxel_size, jnp.float32)
        origin = jnp.asarray(grid.point_range[:3], jnp.float32)
        centers = (coords[:, ::-1].astype(jnp.float32) + 0.5) * vs + origin
        dec = jnp.concatenate([points,
                               points[:, :3] - mean_xyz[safe],
                               points[:, :3] - centers[safe]], axis=1)
        dec = jnp.where(valid[:, None], dec, 0.0)
        h = dec
        seg = jnp.where(valid, slot, max_voxels)
        for li in range(self.num_layers):
            h = nn.relu(nn.LayerNorm(name=f"ln{li}" if li else "ln")(
                Dense(self.out_ch, name=f"fc{li}" if li else "fc")(h)))
            h = jnp.where(valid[:, None], h, -jnp.inf)
            pooled = segment_max(h, seg, max_voxels + 1)[:max_voxels]
            pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
            if li < self.num_layers - 1:
                h = jnp.where(valid[:, None], h, 0.0)
                h = jnp.concatenate([h, pooled[safe]], axis=1)
                h = jnp.where(valid[:, None], h, 0.0)
        return Voxels(features=pooled, coords=coords.astype(jnp.int32),
                      num_points=counts[:max_voxels],
                      num_voxels=jnp.sum(slot_ok.astype(jnp.int32)),
                      point_voxel=jnp.where(valid, slot, -1))
