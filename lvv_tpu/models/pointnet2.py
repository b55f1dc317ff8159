"""PointNet++ backbone (set abstraction / feature propagation).

Re-design of the reference's PointNet2Backbone / PointNet2MSG
(pcdet/models/backbones_3d/pointnet2_backbone.py over the
pointnet2_batch CUDA ops): the FPS / ball-query / grouping / 3-NN
interpolation primitives come from lvv_tpu.ops.sampling; per-group MLPs are
batched dense layers (MXU work); everything fixed-shape (static npoint /
nsample), single-sample modules vmapped for batch.

Used by PointRCNN-style detectors; also standalone as a point-feature
extractor.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sampling import (ball_query, farthest_point_sample, knn,
                            three_interpolate)


class SetAbstraction(nn.Module):
    """Single-scale grouping SA layer (reference PointnetSAModule)."""
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, feats, valid=None):
        """xyz [N,3], feats [N,C] (or None) -> (new_xyz [M,3],
        new_feats [M, mlp[-1]], new_valid [M])."""
        idx = farthest_point_sample(xyz, self.npoint, valid)
        new_xyz = xyz[idx]
        group_idx, cnt = ball_query(new_xyz, xyz, self.radius, self.nsample,
                                    valid)
        grouped = xyz[group_idx] - new_xyz[:, None, :]   # [M, K, 3]
        if feats is not None:
            grouped = jnp.concatenate([grouped, feats[group_idx]], axis=-1)
        x = grouped
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, name=f"fc{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        # mask empty slots before max-pool
        k_ids = jnp.arange(self.nsample)[None, :]
        mask = k_ids < jnp.maximum(cnt, 1)[:, None]
        x = jnp.where(mask[..., None], x, -1e9)
        pooled = jnp.max(x, axis=1)
        new_valid = cnt > 0
        pooled = jnp.where(new_valid[:, None], pooled, 0.0)
        return new_xyz, pooled, new_valid


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA (reference PointnetSAModuleMSG)."""
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, feats, valid=None):
        idx = farthest_point_sample(xyz, self.npoint, valid)
        new_xyz = xyz[idx]
        outs, any_valid = [], None
        for si, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            group_idx, cnt = ball_query(new_xyz, xyz, radius, nsample, valid)
            grouped = xyz[group_idx] - new_xyz[:, None, :]
            if feats is not None:
                grouped = jnp.concatenate([grouped, feats[group_idx]],
                                          axis=-1)
            x = grouped
            for i, ch in enumerate(mlp):
                x = nn.Dense(ch, name=f"s{si}_fc{i}")(x)
                x = nn.LayerNorm(name=f"s{si}_ln{i}")(x)
                x = nn.relu(x)
            mask = (jnp.arange(nsample)[None, :]
                    < jnp.maximum(cnt, 1)[:, None])
            x = jnp.where(mask[..., None], x, -1e9)
            outs.append(jnp.max(x, axis=1))
            v = cnt > 0
            any_valid = v if any_valid is None else (any_valid | v)
        out = jnp.concatenate(outs, axis=-1)
        out = jnp.where(any_valid[:, None], out, 0.0)
        return new_xyz, out, any_valid


class FeaturePropagation(nn.Module):
    """FP layer: 3-NN inverse-distance upsample + unit MLP
    (reference PointnetFPModule)."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_dst, feats_dst, xyz_src, feats_src,
                 valid_src=None):
        d, idx = knn(xyz_dst, xyz_src, k=3, valid=valid_src)
        interp = three_interpolate(feats_src, idx, d)
        x = interp if feats_dst is None else \
            jnp.concatenate([interp, feats_dst], axis=-1)
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, name=f"fc{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = nn.relu(x)
        return x


class PointNet2Backbone(nn.Module):
    """4-SA / 4-FP encoder-decoder over raw points (reference
    PointNet2Backbone topology, per-point output features)."""
    npoints: Sequence[int] = (1024, 256, 64, 16)
    radii: Sequence[float] = (0.5, 1.0, 2.0, 4.0)
    nsamples: Sequence[int] = (16, 16, 16, 16)
    channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 64

    @nn.compact
    def __call__(self, points, valid=None):
        """points [N, 3+C] -> per-point features [N, out_channels]."""
        xyz = points[:, :3]
        feats = points[:, 3:] if points.shape[1] > 3 else None

        xs, fs, vs = [xyz], [feats], [valid]
        for i, (npoint, radius, nsample, ch) in enumerate(
                zip(self.npoints, self.radii, self.nsamples, self.channels)):
            x, f, v = SetAbstraction(npoint, radius, nsample,
                                     (ch, ch), name=f"sa{i}")(
                xs[-1], fs[-1], vs[-1])
            xs.append(x)
            fs.append(f)
            vs.append(v)

        f = fs[-1]
        for i in range(len(self.npoints) - 1, -1, -1):
            ch = self.channels[max(i - 1, 0)] if i > 0 else self.out_channels
            f = FeaturePropagation((ch, ch), name=f"fp{i}")(
                xs[i], fs[i], xs[i + 1], f, vs[i + 1])
        return f
