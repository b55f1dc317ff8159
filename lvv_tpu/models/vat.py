"""VAT query-compression transformers.

Re-designs of the reference's fusion modules
(src/encoder-decoder/training/models/):
- VATBlock (vat_blocks.py:7-47): pre-LN self-attn on queries -> cross-attn
  (queries attend kv) -> MLP.
- VATLiDAR (vat_lidar.py:42-304): BEV [B,C,H,W] -> depthwise refine + GELU
  (replaces input, :82-85) -> 1x1 proj to d_model + LN -> continuous
  geometric PE over [x,y,r,sin,cos] (geo_mlp width = d_model, :93-97) ->
  6-sector camera-aligned view embeddings (added to BEV tokens and to 6
  equal groups of learned queries) -> VAT blocks -> final_ln -> post head
  (LN/Linear/GELU/Linear, replaces q, :114-121) -> [B, n_q, d_model].
- VATVision (vat_vision.py:20-235): [B,1536,2048] tokens + learned queries
  (n_q = 1536/compression_factor; optional per-view groups with feasibility
  auto-disable) -> VAT blocks in d_in space -> final_ln -> post head
  (:121-128) -> projection stack LN/Linear/GELU/Linear/LN to d_model
  (:131-138).

TPU-first differences from the reference: the geometric PE grid and sector
ids are closed-over compile-time constants per (H, W) — no runtime cache
dict (vat_lidar.py:124-126); all attention runs through the fused Pallas op;
the per-sample Python loops become batched tensor ops.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import MLP, Dense, LayerNorm, MultiHeadAttention

NUM_VIEWS = 6  # nuScenes camera/sector count (reference vat_lidar.py NUM_VIEWS)

# the reference uses torch nn.GELU() = exact erf; flax nn.gelu defaults to
# the tanh approximation (up to ~5e-4 apart) — answer-token parity with
# converted reference weights needs the exact flavor
import functools  # noqa: E402

_gelu = functools.partial(nn.gelu, approximate=False)

# torch nn.LayerNorm default (the reference never overrides it)
_LN_EPS = 1e-5


class VATBlock(nn.Module):
    """Pre-LN query-compression block (reference vat_blocks.py:7-47)."""
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, kv, deterministic: bool = True):
        d = q.shape[-1]
        q = q + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   name="self_attn")(
            LayerNorm(eps=_LN_EPS, name="ln_self")(q))
        q = q + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   name="cross_attn")(
            LayerNorm(eps=_LN_EPS, name="ln_cross_q")(q), kv)
        q = q + MLP(int(d * self.mlp_ratio), act=_gelu, dtype=self.dtype,
                    dropout=self.dropout, name="mlp")(
            LayerNorm(eps=_LN_EPS, name="ln_mlp")(q), deterministic=deterministic)
        return q


def bev_geometry(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-cell geometric features and sector ids for an HxW BEV grid.

    Returns (geo [H*W, 5] float32 = [x, y, r, sin, cos] with x,y in [-1,1]
    and r = clamp(sqrt(x²+y²), 0, 1), sector [H*W] int32 in [0,6)) —
    reference vat_lidar.py:127-186 `_grid`. The sector numbering follows the
    reference's camera-aligned 60° bins exactly (front=0, front_right=1,
    front_left=2, back=3, back_right=4, back_left=5) so converted
    `view_embed` rows land on the same cells. Computed in numpy at
    module-construction time: a compile-time constant.
    """
    ys, xs = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w),
                         indexing="ij")
    r = np.clip(np.sqrt(xs ** 2 + ys ** 2), 0.0, 1.0)
    theta = np.arctan2(ys, xs)  # [-pi, pi]
    geo = np.stack([xs, ys, r, np.sin(theta), np.cos(theta)],
                   axis=-1).reshape(-1, 5).astype(np.float32)
    ft = theta.reshape(-1)
    pi = math.pi
    sector = np.zeros(h * w, np.int32)
    sector[(ft >= pi / 3) & (ft < 2 * pi / 3)] = 0      # front
    sector[(ft >= 0.0) & (ft < pi / 3)] = 1             # front_right
    sector[(ft >= 2 * pi / 3) & (ft <= pi)] = 2         # front_left
    sector[(ft >= -2 * pi / 3) & (ft < -pi / 3)] = 3    # back
    sector[(ft >= -pi / 3) & (ft < 0.0)] = 4            # back_right
    sector[(ft >= -pi) & (ft < -2 * pi / 3)] = 5        # back_left
    return geo, sector


class VATLiDAR(nn.Module):
    """BEV feature compressor (reference vat_lidar.py:42-304)."""
    d_model: int
    n_queries: int
    n_blocks: int = 4
    n_heads: int = 8
    mlp_ratio: float = 4.0
    pe_hidden: int = 0   # <=0 selects the reference width (= d_model)
    dw_kernel: int = 3
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, bev, deterministic: bool = True):
        """bev [B, C, H, W] -> [B, n_queries, d_model]."""
        b, c, h, w = bev.shape
        x = jnp.transpose(bev, (0, 2, 3, 1)).astype(self.dtype)  # NHWC

        # depthwise refine + GELU, REPLACING the input (reference :82-85
        # `refine = Sequential(Conv2d(groups=c), GELU)`; forward :216)
        x = nn.Conv(c, (self.dw_kernel, self.dw_kernel), padding="SAME",
                    feature_group_count=c, dtype=self.dtype,
                    name="dw_refine")(x)
        x = _gelu(x)
        # 1x1 projection to d_model + LN (reference :88-89, 222-225)
        x = Dense(self.d_model, dtype=self.dtype, name="in_proj")(x)
        x = LayerNorm(eps=_LN_EPS, name="in_ln")(x)
        tokens = x.reshape(b, h * w, self.d_model)

        # continuous geometric PE (reference :93-97 geo_mlp is
        # Linear(5, d_model) -> GELU -> Linear(d_model, d_model); pe_hidden
        # <= 0 selects that reference width, a nonzero value is a knob)
        geo_np, sector_np = bev_geometry(h, w)
        geo = jnp.asarray(geo_np, self.dtype)
        pe_hidden = self.pe_hidden if self.pe_hidden > 0 else self.d_model
        pe = Dense(pe_hidden, dtype=self.dtype, name="pe_fc1")(geo)
        pe = _gelu(pe)
        pe = Dense(self.d_model, dtype=self.dtype, name="pe_fc2")(pe)
        tokens = tokens + pe[None]

        # 6-sector view embeddings (reference :99-101, 243-247)
        sec_emb = self.param("sector_embed", nn.initializers.normal(0.02),
                             (NUM_VIEWS, self.d_model))
        sec_emb = sec_emb.astype(self.dtype)
        tokens = tokens + sec_emb[jnp.asarray(sector_np)][None]

        # learned queries in 6 equal contiguous sector groups
        # (reference :103-105, 255-270)
        queries = self.param("queries", nn.initializers.normal(0.02),
                             (self.n_queries, self.d_model)).astype(self.dtype)
        q_sector = jnp.arange(self.n_queries) * NUM_VIEWS // self.n_queries
        queries = queries + sec_emb[q_sector]
        q = jnp.broadcast_to(queries[None], (b,) + queries.shape)

        for i in range(self.n_blocks):
            q = VATBlock(self.n_heads, self.mlp_ratio, dtype=self.dtype,
                         dropout=self.dropout, name=f"block_{i}")(
                q, tokens, deterministic=deterministic)

        # final LN, then the post head REPLACES q (reference :114-121,
        # 293-296: post = LN -> Linear(d, d) -> GELU -> Drop -> Linear(d, d))
        q = LayerNorm(eps=_LN_EPS, name="final_ln")(q)
        q = LayerNorm(eps=_LN_EPS, name="post_ln")(q)
        q = Dense(self.d_model, dtype=self.dtype, name="post_fc1")(q)
        q = _gelu(q)
        if self.dropout > 0:
            q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        q = Dense(self.d_model, dtype=self.dtype, name="post_fc2")(q)
        return q


class VATVision(nn.Module):
    """Image-token compressor (reference vat_vision.py:20-235)."""
    d_in: int           # 2048
    d_model: int        # LLM width
    n_tokens: int       # input token count (6 * 256)
    compression_factor: int = 2
    n_blocks: int = 4
    n_heads: int = 8
    mlp_ratio: float = 4.0
    per_view_queries: bool = True
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @property
    def n_queries(self) -> int:
        return self.n_tokens // self.compression_factor

    @nn.compact
    def __call__(self, kv, deterministic: bool = True):
        """kv [B, n_tokens, d_in] -> [B, n_queries, d_model]."""
        b = kv.shape[0]
        n_q = self.n_queries
        kv = kv.astype(self.dtype)

        queries = self.param("queries", nn.initializers.normal(0.02),
                             (n_q, self.d_in)).astype(self.dtype)
        # per-view query-group embeddings with feasibility auto-disable
        # (reference vat_vision.py:74-96: requires n_q % NUM_VIEWS == 0)
        if self.per_view_queries and n_q % NUM_VIEWS == 0:
            view_emb = self.param("view_embed", nn.initializers.normal(0.02),
                                  (NUM_VIEWS, self.d_in)).astype(self.dtype)
            q_view = jnp.arange(n_q) * NUM_VIEWS // n_q
            queries = queries + view_emb[q_view]
        q = jnp.broadcast_to(queries[None], (b, n_q, self.d_in))

        for i in range(self.n_blocks):
            q = VATBlock(self.n_heads, self.mlp_ratio, dtype=self.dtype,
                         dropout=self.dropout, name=f"block_{i}")(
                q, kv, deterministic=deterministic)

        # final LN, then post head REPLACES q (reference :121-128, 233-236:
        # post = LN -> Linear(d_in, d_in) -> GELU -> Drop -> Linear(d_in,
        # d_in)), then the projection stack to d_model (reference :131-138:
        # LN -> Linear(d_in, d_model) -> GELU -> Drop -> Linear(d_model,
        # d_model) -> LN)
        q = LayerNorm(eps=_LN_EPS, name="final_ln")(q)
        q = LayerNorm(eps=_LN_EPS, name="post_ln")(q)
        q = Dense(self.d_in, dtype=self.dtype, name="post_fc1")(q)
        q = _gelu(q)
        if self.dropout > 0:
            q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        q = Dense(self.d_in, dtype=self.dtype, name="post_fc2")(q)
        q = LayerNorm(eps=_LN_EPS, name="proj_ln")(q)
        q = Dense(self.d_model, dtype=self.dtype, name="proj_fc1")(q)
        q = _gelu(q)
        if self.dropout > 0:
            q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        q = Dense(self.d_model, dtype=self.dtype, name="proj_fc2")(q)
        q = LayerNorm(eps=_LN_EPS, name="out_ln")(q)
        return q


class VisionAdapter(nn.Module):
    """Per-camera view adapter (reference vision_adapter.py:35-145): a
    learned per-view embedding added to each view's tokens, LN + dropout,
    views concatenated along the token axis."""
    d_model: int        # 2048
    num_views: int = NUM_VIEWS
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, view_tokens, deterministic: bool = True):
        """view_tokens [B, V, T, d] -> [B, V*T, d]."""
        b, v, t, d = view_tokens.shape
        assert v == self.num_views
        emb = self.param("view_embed", nn.initializers.normal(0.02),
                         (self.num_views, d)).astype(self.dtype)
        x = view_tokens.astype(self.dtype) + emb[None, :, None, :]
        x = LayerNorm(eps=_LN_EPS, name="ln")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x.reshape(b, v * t, d)
