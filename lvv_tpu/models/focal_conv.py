"""Focal sparse convolution (learned voxel dilation).

Re-design of the reference focal sparse conv
(pcdet/models/backbones_3d/focal_sparse_conv/focal_sparse_conv.py +
spconv_backbone_focal.py, "Focal Sparse Convolutional Networks for 3D
Object Detection"): a submanifold conv whose active set GROWS where it
matters — each voxel predicts a cubic importance map over its kernel
neighborhood; high-importance empty neighbor positions join the active
set before convolving, and features are gated by the center importance.
Importance is supervised with voxel-in-gt-box labels (focal loss in the
reference's get_loss).

TPU-first: "above threshold" becomes a fixed top-K over all V*K^d
candidate sites (static shapes), the set union is the framework's
sorted-id merge, and gating keeps gradients flowing into the importance
head without the straight-through tricks the reference needs.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.sparse import (SENTINEL, SparseTensor, _lookup, _offsets,
                          delinearize, linearize, submanifold_conv)
from .layers import Dense


class FocalSparseConv(nn.Module):
    """subm conv with learned dilation; returns (out, center_importance).

    `use_img=True` is the reference's multimodal mode
    (focal_sparse_conv.py:51-113,203-224): per-voxel image features are
    gathered at the voxel centers' camera projections, concatenated into
    the importance prediction, and summed into the conv output
    (fuse_sum). Pass `image_feat` ([H, W, C] — e.g. a
    models.semseg.PyramidFeat2D layer, C must equal out_ch for the
    post-conv sum), `proj` ([3, 4] combined lidar->pixel matrix),
    `voxel_size`/`pc_range`, and the tensor's `stride`.
    """
    out_ch: int
    kernel: int = 3
    spawn: int = 256          # new active sites added (fixed top-K)
    use_img: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, image_feat=None, proj=None,
                 voxel_size=None, pc_range=None,
                 stride: int = 1) -> Tuple[SparseTensor, jax.Array]:
        v = st.ids.shape[0]
        offs = _offsets(self.kernel, ndim2d=False)
        k = offs.shape[0]
        imp_in = st.features
        if self.use_img:
            from .semseg import gather_image_features, \
                project_voxels_to_image
            if image_feat is None or proj is None:
                raise ValueError("use_img=True needs image_feat and proj")

            def img_at(ids, valid):
                cs = delinearize(ids, st.grid)
                uv, infront = project_voxels_to_image(
                    cs, voxel_size, pc_range, proj, stride)
                return gather_image_features(image_feat, uv,
                                             infront & valid)

            # importance sees image evidence too (reference
            # construct_multimodal_features concat, :105-108)
            imp_in = jnp.concatenate(
                [img_at(st.ids, st.valid).astype(st.features.dtype),
                 st.features], axis=-1)
        imp = jax.nn.sigmoid(
            Dense(k, name="importance")(imp_in).astype(jnp.float32))
        center_idx = k // 2
        imp_center = imp[:, center_idx]

        # candidate neighbor sites: coord + offset, scored by
        # imp_center * imp_offset, only where currently EMPTY
        coords = delinearize(st.ids, st.grid)
        from ..ops.sparse import (_DENSE_LOOKUP_MAX_CELLS, _occupancy_table,
                                  _table_lookup)
        nx, ny, nz = st.grid
        table = (_occupancy_table(st)
                 if nx * ny * nz <= _DENSE_LOOKUP_MAX_CELLS else None)
        cand_ids, cand_scores = [], []
        for oi, off in enumerate(offs):
            if oi == center_idx:
                continue
            nid = linearize(coords + jnp.asarray(off, jnp.int32)[None],
                            st.grid)
            nid = jnp.where(st.valid, nid, SENTINEL)
            if table is not None:
                _, hit = _table_lookup(table, nid)
            else:
                _, hit = _lookup(st.ids, nid)
            score = imp_center * imp[:, oi]
            cand_ids.append(jnp.where(hit, SENTINEL, nid))
            cand_scores.append(jnp.where(hit | ~st.valid, -1.0, score))
        cand_ids = jnp.concatenate(cand_ids)
        cand_scores = jnp.concatenate(cand_scores)
        top_scores, top_idx = jax.lax.top_k(cand_scores, self.spawn)
        new_ids = jnp.where(top_scores > 0.5, cand_ids[top_idx], SENTINEL)

        # union with zero features for spawned sites (they get filled by
        # the conv); duplicates collapse through the sorted merge
        all_ids = jnp.concatenate([st.ids, new_ids])
        all_feats = jnp.concatenate(
            [st.features * imp_center[:, None].astype(st.features.dtype),
             jnp.zeros((self.spawn, st.features.shape[1]),
                       st.features.dtype)])
        order = jnp.argsort(all_ids, stable=True)
        s_ids, s_feats = all_ids[order], all_feats[order]
        # dedupe: keep the first occurrence of each id (real voxels sort
        # stably before spawned zeros only by position; zero features make
        # duplicates harmless under sum)
        is_dup = jnp.concatenate([jnp.zeros((1,), bool),
                                  s_ids[1:] == s_ids[:-1]])
        s_ids = jnp.where(is_dup, SENTINEL, s_ids)
        s_feats = jnp.where(is_dup[:, None], 0.0, s_feats)
        order2 = jnp.argsort(s_ids, stable=True)
        expanded = SparseTensor(s_ids[order2][:v + self.spawn],
                                s_feats[order2][:v + self.spawn], st.grid)

        w = self.param("kernel_w", nn.initializers.he_normal(
            in_axis=(0, 1), out_axis=2),
            (k, st.features.shape[1], self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        out = submanifold_conv(expanded, w, b, kernel=self.kernel)
        feats = out.features
        if self.use_img:
            # fuse_sum on the EXPANDED set (reference re-gathers at the
            # output indices, forward :218-219)
            feats = feats + img_at(out.ids, out.valid).astype(feats.dtype)
        f = nn.relu(nn.LayerNorm(name="ln")(feats))
        f = jnp.where(out.valid[:, None], f, 0.0).astype(out.features.dtype)
        return SparseTensor(out.ids, f, out.grid), imp_center


def focal_importance_loss(imp_center: jax.Array, centers: jax.Array,
                          valid: jax.Array, gt_boxes: jax.Array,
                          gt_mask: jax.Array, alpha: float = 0.25,
                          gamma: float = 2.0) -> jax.Array:
    """Focal BCE on center importance vs voxel-in-gt membership
    (reference focal_sparse_conv get_loss)."""
    from ..ops.pool import points_in_rotated_boxes
    inside = points_in_rotated_boxes(centers, gt_boxes[:, :7])
    tgt = jnp.any(inside & gt_mask[None, :], axis=1).astype(jnp.float32)
    p = jnp.clip(imp_center, 1e-6, 1 - 1e-6)
    ce = -(tgt * jnp.log(p) + (1 - tgt) * jnp.log(1 - p))
    p_t = p * tgt + (1 - p) * (1 - tgt)
    a_t = alpha * tgt + (1 - alpha) * (1 - tgt)
    focal = a_t * (1 - p_t) ** gamma * ce
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(focal * valid) / n


class FocalMultiScaleBackbone3D(nn.Module):
    """VoxelBackBone8xFocal equivalent (reference spconv_backbone_focal.py
    :101-224): the multi-scale sparse trunk with a focal conv closing
    stages 1-3 (learned dilation where it matters) and, with `use_img`, a
    multimodal focal conv right after the input stage whose importance
    sees camera features gathered at voxel projections.

    Returns (stages [stride 1/2/4/8], aux) where aux is a list of
    (imp_center, metric centers, valid) tuples for focal_importance_loss
    (the reference accumulates loss_box_of_pts the same way).
    """
    cfg: "VoxelNeXtConfig"
    capacity: int
    use_img: bool = False
    spawn: int = 256

    @nn.compact
    def __call__(self, st: SparseTensor, image_feat=None, proj=None,
                 voxel_size=None, pc_range=None):
        from ..ops.sparse import build_subm_rulebook
        from .voxelnext import SparseBasicBlock, SparseConvLayer

        def centers_of(s, stride):
            cs = delinearize(s.ids, s.grid).astype(jnp.float32)
            vs = jnp.asarray(voxel_size, jnp.float32) * stride
            lo = jnp.asarray(pc_range[:3], jnp.float32)
            return cs * vs[None] + lo[None]

        chs = self.cfg.channels[:4]
        cap = self.capacity
        aux = []
        rb = build_subm_rulebook(st)
        st = SparseConvLayer(chs[0], name="conv_input")(st, rb)
        if self.use_img:
            pre = st   # imp rows align with the conv INPUT tensor
            st, imp = FocalSparseConv(
                chs[0], spawn=self.spawn, use_img=True,
                name="focal_multimodal")(pre, image_feat, proj,
                                         voxel_size, pc_range, 1)
            aux.append((imp, centers_of(pre, 1), pre.valid))
        st = SparseBasicBlock(chs[0], name="res1")(
            st, build_subm_rulebook(st))
        pre = st
        st, imp = FocalSparseConv(chs[0], spawn=self.spawn,
                                  name="focal1")(pre)
        aux.append((imp, centers_of(pre, 1), pre.valid))
        stages = [st]
        sched = getattr(self.cfg, "capacity_schedule", None)
        for i, ch in enumerate(chs[1:], start=1):
            cap = sched[i - 1] if sched and i - 1 < len(sched) else \
                max(cap * 3 // 4, 1024)
            st = SparseConvLayer(ch, subm=False, stride=2, out_capacity=cap,
                                 name=f"down{i}")(st)
            st = SparseBasicBlock(ch, name=f"res{i + 1}")(
                st, build_subm_rulebook(st))
            if i < 3:   # reference: focal conv in conv1..conv3 only
                pre = st
                st, imp = FocalSparseConv(ch, spawn=self.spawn,
                                          name=f"focal{i + 1}")(pre)
                aux.append((imp, centers_of(pre, 2 ** i), pre.valid))
            stages.append(st)
        return stages, aux


def focal_aux_loss(aux, gt_boxes, gt_labels, gt_mask,
                   weight: float = 1.0) -> jax.Array:
    """Sum of the per-focal-conv importance losses (reference
    loss_box_of_pts accumulation across SparseSequentialBatchdict)."""
    total = 0.0
    for imp, centers, valid in aux:
        total = total + focal_importance_loss(imp, centers, valid,
                                              gt_boxes, gt_mask)
    return weight * total
