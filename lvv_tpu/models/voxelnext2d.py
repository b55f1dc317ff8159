"""VoxelNeXt2D — the pillar (2D sparse) VoxelNeXt backbone.

Re-design of the reference VoxelNeXt2D
(pcdet/models/backbones_3d/spconv_backbone_voxelnext2d.py): the VoxelNeXt
recipe on 2D pillars — sparse residual stages to stride 32, the stride-16
and stride-32 stages re-indexed x2/x4 back onto the stride-8 grid and
merged (the multi-stride concat trick, same as the 3D backbone at
spconv_backbone_voxelnext.py:194-197), then a sparse 2D output conv. Pairs
with DynamicPillarVFE(Simple2D) exactly like the reference config.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse import (SparseTensor, merge_add, reindex_upscale)
from ..ops.sparse import build_subm_rulebook
from .voxelnext import SparseBasicBlock, SparseConvLayer


class VoxelNeXt2DBackbone(nn.Module):
    """[pillars] -> stride-8 sparse 2D tensor with 16/32-stride features
    folded in."""
    channels: Tuple[int, ...] = (32, 64, 128, 256, 256)
    capacity: int = 0

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        chs = self.channels
        cap = self.capacity or st.ids.shape[0]
        rb = build_subm_rulebook(st, ndim2d=True)
        st = SparseConvLayer(chs[0], ndim2d=True, name="conv_input")(st, rb)
        st = SparseBasicBlock(chs[0], ndim2d=True, name="res1")(st, rb)
        stages = []
        for i, ch in enumerate(chs[1:], start=1):
            cap = max(cap * 3 // 4, 1024)
            st = SparseConvLayer(ch, subm=False, stride=2, ndim2d=True,
                                 out_capacity=cap, name=f"down{i}")(st)
            rb = build_subm_rulebook(st, ndim2d=True)
            st = SparseBasicBlock(ch, ndim2d=True,
                                  name=f"res{i + 1}a")(st, rb)
            st = SparseBasicBlock(ch, ndim2d=True,
                                  name=f"res{i + 1}b")(st, rb)
            stages.append(st)
        # stages: stride 2, 4, 8, 16(, 32) — fold the last two onto the
        # stride-8 grid
        s8, s16 = stages[2], stages[3]
        tgt = s8.grid
        up16 = reindex_upscale(s16, 2, tgt)
        # channel-align coarser stages before merging
        up16 = SparseConvLayer(s8.features.shape[-1], kernel=1,
                               ndim2d=True, name="align16")(up16)
        merged = merge_add(s8, up16, capacity=s8.ids.shape[0])
        if len(stages) > 4:
            up32 = reindex_upscale(stages[4], 4, tgt)
            up32 = SparseConvLayer(s8.features.shape[-1], kernel=1,
                                   ndim2d=True, name="align32")(up32)
            merged = merge_add(merged, up32, capacity=s8.ids.shape[0])
        return SparseConvLayer(chs[3], ndim2d=True, name="conv_out")(merged)
