"""DSVT — Dynamic Sparse Voxel Transformer backbone (true rotated sets).

Re-design of the reference DSVT (pcdet/models/backbones_3d/dsvt.py, 616
LoC over the `ingroup_inds` CUDA op; "DSVT: Dynamic Sparse Voxel
Transformer with Rotated Sets", arXiv 2301.06051). The real mechanics,
all kept here:

- TWO window shifts per stage (shift 1 offsets the grid by half a window,
  get_window_coors); blocks alternate which shift they use
  (DSVTBlock.forward: shift_id = block_id % 2);
- inside every window, voxels are ordered along an axis and chopped into
  size-equivalent SETS of `set_size` voxels (get_set_single_shift);
  each block runs TWO attention layers — one over the y-sorted sets, one
  over the x-sorted sets (the "rotated set" pair, set_id = layer index);
- learned positional embeddings of the in-window coordinates are added to
  q/k per layer (get_pos_embed / PositionEmbeddingLearned).

TPU-first shape discipline: the reference pads every set to exactly
set_size by DUPLICATING voxels (Eq. 3 proportional selection) and masks
duplicates; here each voxel belongs to exactly one set per (shift, axis)
— set = in-window axis-rank // set_size — and short sets pad with masked
slots. Both schemes attend over the same voxel groups; masking replaces
duplication. Set bucketing is sorts + `ingroup_inds` + one scatter into a
dense [max_sets, set_size, C] tensor; attention is the fused batched op.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.attention import attention
from ..ops.segment import ingroup_inds, unique_with_inverse
from ..ops.sparse import SENTINEL, SparseTensor, delinearize
from .layers import Dense


def window_coords(st: SparseTensor, window: Tuple[int, int, int],
                  shift: bool):
    """-> (window id [V], in-window coords [V, 3] (z, y, x)) per the
    reference get_window_coors: shift 1 offsets by half a window."""
    coords = delinearize(st.ids, st.grid)            # (z, y, x)
    wz, wy, wx = window
    # the reference forces shift_z = 0 when the window covers the full z
    # extent (dsvt_utils.py get_window_coors:56-57, sparse_shape_z ==
    # win_shape_z): shifting a full-column window would split every pillar
    # column into two z-windows and destroy the full-column attention the
    # voxel variant is designed around
    nz = int(st.grid[2])
    shift_z = shift and wz < nz
    off = jnp.asarray([wz // 2 if shift_z else 0, wy // 2 if shift else 0,
                       wx // 2 if shift else 0], jnp.int32)
    shifted = coords + off[None]
    win = jnp.asarray([wz, wy, wx], jnp.int32)[None]
    wc = shifted // win
    inner = shifted - wc * win
    nx = -(-st.grid[0] // wx) + 1
    ny = -(-st.grid[1] // wy) + 1
    wid = (wc[:, 0] * ny + wc[:, 1]) * nx + wc[:, 2]
    wid = jnp.where(st.valid, wid, SENTINEL)
    inner = jnp.where(st.valid[:, None], inner, 0)
    return wid, inner


def rotated_set_partition(wid: jax.Array, inner: jax.Array,
                          valid: jax.Array, window: Tuple[int, int, int],
                          set_size: int, max_sets: int, axis: str):
    """Axis-sorted set assignment (reference get_set_single_shift): order
    each window's voxels by y-major or x-major in-window key, rank them
    (ingroup_inds over the sort), and cut into sets of `set_size`.

    Returns (set_row [V], col [V], ok [V]) for a scatter into
    [max_sets, set_size] tables."""
    wz, wy, wx = window
    if axis == "y":
        key = inner[:, 1] * (wz * wx) + inner[:, 2] * wz + inner[:, 0]
    else:
        key = inner[:, 2] * (wz * wy) + inner[:, 1] * wz + inner[:, 0]
    max_key = wz * wy * wx
    # rank within window under the axis order: sort by (wid, key) once
    composite = jnp.where(valid, wid * max_key + key, SENTINEL)
    order = jnp.argsort(composite, stable=True)
    rank_sorted = ingroup_inds(wid[order], valid[order])
    rank = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
    set_in_win = jnp.where(valid, rank // set_size, 0)
    col = jnp.where(valid, rank % set_size, 0)
    max_sets_per_win = -(-max_key // set_size)
    gset = jnp.where(valid, wid * max_sets_per_win + set_in_win, SENTINEL)
    # max_sets + 1 slots: unique_with_inverse CLAMPS overflow runs to its
    # last slot, so reserving slot max_sets as a dump row turns the clamp
    # into a real drop (overflowed sets land there, never aliasing a live
    # set — and invalid voxels route there too)
    _, inverse, _, n_unique = unique_with_inverse(gset, SENTINEL,
                                                  max_sets + 1)
    from ..ops.sparse import report_overflow
    report_overflow("dsvt_sets", n_unique, max_sets)
    ok = valid & (inverse < max_sets)
    return jnp.where(ok, inverse, max_sets), col, ok


def plan_max_sets(ids, grid, window: Tuple[int, int, int],
                  set_size: int, bucket: int = 1024) -> int:
    """Host-side capacity planner: the EXACT set count this cloud needs.

    Under jit the set tables are fixed-shape, so "auto-resize" on TPU means
    recompile-per-capacity-bucket: run this on a representative batch (or
    per scene, outside jit) and pass the result as DSVTBackbone.max_sets.
    Counts Σ_w ceil(n_w / set_size) over non-empty windows for both shift
    phases (the per-axis rotated partitions share the same count), takes
    the max, and rounds up to `bucket` so capacities quantize to few
    distinct compiled programs. The ceil(V/set_size)*2 default in
    DSVTBackbone under-provisions scattered clouds (worst case is one set
    per occupied window); overflow drops are telemetry-reported
    (ops.sparse.set_overflow_debug) — this planner makes them zero.
    """
    import numpy as np
    ids = np.asarray(ids)
    ids = ids[ids != int(SENTINEL)]
    if ids.size == 0:
        return bucket
    nx, ny, nz = grid
    z = ids // (nx * ny)
    y = (ids // nx) % ny
    x = ids % nx
    wz, wy, wx = window
    need = 0
    for shift in (False, True):
        # mirror window_coords: no z shift when the window spans full z
        oz = wz // 2 if (shift and wz < nz) else 0
        oy, ox = ((wy // 2, wx // 2) if shift else (0, 0))
        wc = ((z + oz) // wz, (y + oy) // wy, (x + ox) // wx)
        n_wx = -(-nx // wx) + 1
        n_wy = -(-ny // wy) + 1
        wid = (wc[0] * n_wy + wc[1]) * n_wx + wc[2]
        _, counts = np.unique(wid, return_counts=True)
        need = max(need, int(np.sum(-(-counts // set_size))))
    return -(-need // bucket) * bucket


class SetAttentionLayer(nn.Module):
    """Pre-gather set attention + FFN (reference SetAttention +
    DSVT_EncoderLayer): q/k get the learned in-window pos embedding."""
    num_heads: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, feats: jax.Array, pos: jax.Array, set_row, col, ok,
                 max_sets: int, set_size: int) -> jax.Array:
        c = feats.shape[-1]
        v_in = feats + pos
        # max_sets + 1 rows: row max_sets is the dump for invalid/
        # overflowed voxels (their writes must never collide with a live
        # set's slot)
        sets = jnp.zeros((max_sets + 1, set_size, c), feats.dtype)
        sets = sets.at[set_row, col].set(
            jnp.where(ok[:, None], v_in, 0.0))
        counts = jnp.zeros((max_sets + 1,), jnp.int32).at[set_row].add(
            ok.astype(jnp.int32))

        q = Dense(c, name="q")(sets)
        k = Dense(c, name="k")(sets)
        v = Dense(c, name="v")(sets)
        hd = c // self.num_heads

        def heads(x):
            return x.reshape(max_sets + 1, set_size, self.num_heads,
                             hd).transpose(0, 2, 1, 3)

        o = attention(heads(q), heads(k), heads(v),
                      kv_len=jnp.maximum(counts, 1))
        o = o.transpose(0, 2, 1, 3).reshape(max_sets + 1, set_size, c)
        o = Dense(c, name="proj")(o)
        # gather back + residual + LN + FFN (reference SetAttention mlp)
        y = feats + jnp.where(ok[:, None], o[set_row, col], 0.0)
        y = nn.LayerNorm(name="ln1")(y)
        h = Dense(int(c * self.mlp_ratio), name="fc1")(y)
        h = Dense(c, name="fc2")(nn.relu(h))
        return nn.LayerNorm(name="ln2")(y + h)


class DSVTBlock(nn.Module):
    """Two rotated-set attention layers in one window shift (reference
    DSVTBlock: layer 0 over y-sorted sets, layer 1 over x-sorted sets)."""
    num_heads: int
    window: Tuple[int, int, int]
    set_size: int
    max_sets: int
    shift: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        wid, inner = window_coords(st, self.window, self.shift)
        pos = Dense(st.features.shape[-1], name="pos_embed")(
            inner.astype(st.features.dtype)
            / jnp.asarray(self.window, st.features.dtype)[None])
        f = st.features
        for li, axis in enumerate(("y", "x")):
            row, col, ok = rotated_set_partition(
                wid, inner, st.valid, self.window, self.set_size,
                self.max_sets, axis)
            f = SetAttentionLayer(self.num_heads,
                                  name=f"layer_{li}")(
                f, pos, row, col, ok, self.max_sets, self.set_size)
        f = jnp.where(st.valid[:, None], f, 0.0)
        return SparseTensor(st.ids, f, st.grid)


class ZPoolAttention(nn.Module):
    """Attention-based inter-stage z-downsampling (reference
    Stage_ReductionAtt_Block, pcdet dsvt.py:292-310 + get_pooling_index,
    dsvt_utils.py:87-127): voxels group by (z // stride, y, x); per group
    the query is the masked max-pool over the group's voxels, keys are the
    voxels plus a learned per-slot position embedding, one MHA layer, and
    the output is LN(attn + query). Emits the pooled sparse tensor on the
    z-reduced grid."""
    stride: int
    num_heads: int = 8

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        v, c = st.features.shape
        nx, ny, nz = (int(g) for g in st.grid)
        coords = delinearize(st.ids, st.grid)             # (z, y, x)
        zp = coords[:, 0] // self.stride
        slot = coords[:, 0] % self.stride                 # index in pool
        nz_out = -(-nz // self.stride)
        pooled_ids = (zp * ny + coords[:, 1]) * nx + coords[:, 2]
        pooled_ids = jnp.where(st.valid, pooled_ids, SENTINEL)
        # each output voxel has >= 1 source, so V rows always suffice;
        # row v is the dump slot for invalid voxels
        uniq, inverse, _, _ = unique_with_inverse(pooled_ids, SENTINEL,
                                                  v + 1)
        ok = st.valid & (inverse < v)
        row = jnp.where(ok, inverse, v)

        pre = jnp.zeros((v + 1, self.stride, c), st.features.dtype)
        pre = pre.at[row, slot].set(
            jnp.where(ok[:, None], st.features, 0.0))
        filled = jnp.zeros((v + 1, self.stride), bool).at[row, slot].set(ok)

        # query: masked max-pool over the group (reference MaxPool1d)
        neg = jnp.asarray(-1e30, pre.dtype)
        q = jnp.max(jnp.where(filled[..., None], pre, neg), axis=1)
        q = jnp.where(jnp.any(filled, axis=1)[:, None], q, 0.0)[:, None]

        pos = self.param("pos_embedding", nn.initializers.normal(0.01),
                         (self.stride, c))
        key = pre + pos[None].astype(pre.dtype)
        from .layers import MultiHeadAttention

        # torch F.multi_head_attention with key_padding_mask; kv_len-style
        # right-pad masking does not apply (holes can be interior), so use
        # an additive bias on the scores
        def mha(qx, kx, vx, mask):
            d = qx.shape[-1]
            hd = d // self.num_heads
            qp = Dense(d, name="q_proj")(qx)
            kp = Dense(d, name="k_proj")(kx)
            vp = Dense(d, name="v_proj")(vx)

            def split(x):
                b, s, _ = x.shape
                return x.reshape(b, s, self.num_heads, hd).transpose(
                    0, 2, 1, 3)
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(
                jnp.float32)
            o = attention(split(qp), split(kp), split(vp), bias=bias)
            b, h, s, _ = o.shape
            o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
            return Dense(d, name="o_proj")(o)

        out = mha(q, key, pre, filled)[:, 0]
        out = nn.LayerNorm(name="norm")(out + q[:, 0])

        # keep the input capacity V (slot v is the dump row; n_out <= V
        # always since every output voxel has at least one source)
        uniq = uniq[:v]
        valid_out = uniq != SENTINEL
        out = jnp.where(valid_out[:, None], out[:v], 0.0)
        return SparseTensor(uniq, out, (nx, ny, nz_out))


class DSVTBackbone(nn.Module):
    """DSVT trunk with alternating window shifts (reference DSVT stage
    loop; shift_id = block_id % 2) and optional multi-stage progressive
    z-downsampling (reference dsvt_voxel.yaml: window z 32 -> 8 -> 2 -> 1
    via downsample_stride [[1,1,4],[1,1,4],[1,1,2]] with attention-based
    reduction between stages).

    `stage_blocks`/`stage_windows`/`downsample` empty = the single-stage
    path (the pillar variant, and the pre-round-4 voxel simplification)."""
    channels: int = 64
    num_blocks: int = 4
    num_heads: int = 4
    window: Tuple[int, int, int] = (4, 8, 8)
    set_size: int = 32
    max_sets: int = 0      # 0 -> derived from voxel capacity
    stage_blocks: Sequence[int] = ()
    stage_windows: Sequence[Tuple[int, int, int]] = ()
    downsample: Sequence[int] = ()     # z-stride between stages

    @nn.compact
    def __call__(self, st: SparseTensor) -> SparseTensor:
        f = Dense(self.channels, name="in_proj")(st.features)
        f = jnp.where(st.valid[:, None], f, 0.0)
        st = SparseTensor(st.ids, f, st.grid)
        # every voxel occupies exactly one set slot per partition, so
        # ceil(V / set_size) sets (+1 window-straddle slack) always fit
        max_sets = self.max_sets or \
            (-(-st.ids.shape[0] // self.set_size) * 2)
        if not self.stage_blocks:
            for i in range(self.num_blocks):
                st = DSVTBlock(self.num_heads, self.window,
                               set_size=self.set_size, max_sets=max_sets,
                               shift=bool(i % 2), name=f"block_{i}")(st)
            return st
        assert len(self.stage_windows) == len(self.stage_blocks)
        assert len(self.downsample) == len(self.stage_blocks) - 1
        for s, (nb, win) in enumerate(zip(self.stage_blocks,
                                          self.stage_windows)):
            for i in range(nb):
                st = DSVTBlock(self.num_heads, tuple(win),
                               set_size=self.set_size, max_sets=max_sets,
                               shift=bool(i % 2),
                               name=f"stage_{s}_block_{i}")(st)
            if s < len(self.downsample):
                st = ZPoolAttention(int(self.downsample[s]),
                                    name=f"stage_{s}_reduction")(st)
        return st


class DSVTDetector(nn.Module):
    """Registered DSVT assembly (reference tools/cfgs/waymo_models/
    dsvt_pillar.yaml + dsvt_voxel.yaml: DynamicVoxelVFE/DynamicPillarVFE_3d
    -> DSVT -> PointPillarScatter3d -> BaseBEVResBackbone -> CenterHead):
    learned dynamic VFE (2-layer PFN over absolute-xyz + cluster + center
    offsets; `dsvt_learned_vfe=False` falls back to mean voxelize) ->
    DSVTBackbone set attention -> z-collapse to a dense BEV map (sum over
    the column, reference PointPillarScatter3d semantics for nz==1; for
    voxels this single segment-sum z-fold SIMPLIFIES the reference voxel
    variant's progressive attention-based z-downsampling, 12x12x32 -> 8 ->
    2 -> 1) -> 3-level residual 2D trunk upsampled back to stride 1 ->
    dense center head."""
    det_cfg: "VoxelNeXtConfig"
    vox_cfg: "VoxelizeConfig"

    def voxel_grid(self):
        from ..ops.voxelize import VoxelGrid
        return VoxelGrid.create(self.vox_cfg.point_range,
                                self.vox_cfg.voxel_size)

    @nn.compact
    def __call__(self, points: jax.Array, num_points: jax.Array):
        from ..ops.sparse import bev_collapse, from_voxels, to_dense
        from ..ops.voxelize import voxelize_mean
        from .pointpillars import BaseBEVResBackbone, DenseCenterHead
        from .vfe import DynamicVoxelVFE

        cfg = self.det_cfg
        grid = self.voxel_grid()
        if cfg.dsvt_learned_vfe:
            vox = DynamicVoxelVFE(out_ch=cfg.dsvt_channels, num_layers=2,
                                  name="vfe")(
                points, num_points, grid,
                max_voxels=self.vox_cfg.max_voxels)
        else:
            vox = voxelize_mean(points, num_points, grid,
                                max_voxels=self.vox_cfg.max_voxels)
        st = from_voxels(vox.coords, vox.features, grid.grid_size)
        st = DSVTBackbone(channels=cfg.dsvt_channels,
                          num_blocks=cfg.dsvt_blocks,
                          num_heads=cfg.dsvt_heads,
                          window=tuple(cfg.dsvt_window),
                          set_size=cfg.dsvt_set_size,
                          max_sets=cfg.dsvt_max_sets,
                          stage_blocks=tuple(cfg.dsvt_stage_blocks),
                          stage_windows=tuple(
                              tuple(w) for w in cfg.dsvt_stage_windows),
                          downsample=tuple(cfg.dsvt_downsample),
                          name="backbone3d")(st)
        # with the progressive stages the final grid is already nz == 1
        # (reference PointPillarScatter3d consumes the stage-3 coords);
        # the residual z-fold is the single-stage fallback's collapse
        bev = to_dense(bev_collapse(st))[:, 0]        # [C, ny, nx]
        bev = BaseBEVResBackbone(layer_channels=tuple(cfg.dsvt_bev_channels),
                                 layer_strides=tuple(cfg.dsvt_bev_strides),
                                 layer_nums=tuple(cfg.dsvt_bev_nums),
                                 upsample_channels=tuple(
                                     cfg.dsvt_bev_upsample),
                                 name="backbone2d")(bev)
        preds = DenseCenterHead(cfg.num_classes, name="head")(bev)
        return {"bev_dense": bev, "preds": preds}

    def detect(self, points, num_points):
        from .pointpillars import decode_dense
        out = self(points, num_points)
        return decode_dense(out["preds"], self.det_cfg, self.vox_cfg,
                            stride=1)
