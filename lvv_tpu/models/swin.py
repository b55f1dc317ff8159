"""Swin Transformer image backbone.

Re-design of the reference's Swin (pcdet/models/backbones_image/swin.py,
736 LoC + swin_utils.py 659 — the BEVFusion image backbone): 4x4 patch
embedding, stages of windowed attention blocks with relative position bias,
alternating cyclic-shifted windows with cross-region masking, and
PatchMerging downsampling between stages.

TPU-first notes: window partition/shift are reshapes + jnp.roll (static
shapes); the relative-position bias is gathered once per block from the
compile-time index table; the shifted-window attention mask is a
compile-time constant folded into the additive bias, so both window flavors
run through the same fused attention op. Weight layout mirrors transformers
SwinModel (convert/swin_torch.py), which itself matches the reference's
mmcv-style checkpoints.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import attention
from .layers import Dense, LayerNorm


def relative_position_index(window: int) -> np.ndarray:
    """[w*w, w*w] indices into the (2w-1)^2 bias table (Swin paper)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]     # [2, N, N]
    rel = rel.transpose(1, 2, 0) + window - 1
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(h: int, w: int, window: int,
                        shift: int) -> np.ndarray:
    """[nW, w*w, w*w] additive mask (-100 across shift regions)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // window, window, w // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)


def window_unpartition(x: jax.Array, window: int, h: int, w: int,
                       b: int) -> jax.Array:
    x = x.reshape(b, h // window, w // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class SwinBlock(nn.Module):
    num_heads: int
    window: int
    shift: int = 0
    mlp_ratio: float = 4.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        window = min(self.window, h, w)
        shift = self.shift if window < min(h, w) else 0
        head_dim = c // self.num_heads
        n = window * window

        shortcut = x
        y = LayerNorm(eps=self.eps, name="ln1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        wins = window_partition(y, window)              # [B*nW, n, C]

        q = Dense(c, name="q")(wins)
        k = Dense(c, name="k")(wins)
        v = Dense(c, name="v")(wins)

        def heads(t):
            return t.reshape(-1, n, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)

        table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                           ((2 * window - 1) ** 2, self.num_heads))
        idx = relative_position_index(window)
        bias = table[idx].transpose(2, 0, 1)[None]      # [1, H, n, n]
        if shift:
            mask = shifted_window_mask(h, w, window, shift)
            n_win = mask.shape[0]
            mask_b = jnp.asarray(mask)[None, :, None]   # [1, nW, 1, n, n]
            bias = bias[:, None] + mask_b               # [1, nW, H, n, n]
            bias = jnp.broadcast_to(
                bias, (b, n_win, self.num_heads, n, n)).reshape(
                b * n_win, self.num_heads, n, n)
        else:
            bias = jnp.broadcast_to(bias, (wins.shape[0], self.num_heads,
                                           n, n))
        o = attention(heads(q), heads(k), heads(v), bias=bias)
        o = o.transpose(0, 2, 1, 3).reshape(-1, n, c)
        o = Dense(c, name="proj")(o)
        o = window_unpartition(o, window, h, w, b)
        if shift:
            o = jnp.roll(o, (shift, shift), axis=(1, 2))
        x = shortcut + o

        y = LayerNorm(eps=self.eps, name="ln2")(x)
        y = Dense(int(c * self.mlp_ratio), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = Dense(c, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]]
        y = jnp.concatenate(parts, axis=-1)             # [B, H/2, W/2, 4C]
        y = LayerNorm(eps=self.eps, name="norm")(y)
        return Dense(2 * c, use_bias=False, name="reduction")(y)


class SwinBackbone(nn.Module):
    """transformers-SwinModel-compatible backbone: [B, 3, H, W] ->
    [B, H/4/2^(S-1) * W/4/2^(S-1), embed_dim * 2^(S-1)] tokens (post final
    LN, matching SwinModel.last_hidden_state)."""
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, img_nchw: jax.Array, out_indices=None):
        """Default: final tokens [B, H'W', C'] (SwinModel.last_hidden_state
        compatible). With `out_indices` (e.g. (1, 2, 3) — the reference
        BEVFusion image backbone, bevfusion.yaml OUT_INDICES): a list of
        per-stage NCHW maps [B, embed*2^i, H/4/2^i, W/4/2^i], each behind
        its own LayerNorm like the reference mmdet Swin's per-out-index
        norms (pcdet backbones_image/swin.py)."""
        x = jnp.transpose(img_nchw, (0, 2, 3, 1))
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID",
                    name="patch_embed")(x)
        x = LayerNorm(eps=self.eps, name="embed_norm")(x)

        pyramid = []
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(self.num_heads[si], self.window,
                              shift=(self.window // 2) if bi % 2 else 0,
                              mlp_ratio=self.mlp_ratio, eps=self.eps,
                              name=f"stage{si}_block{bi}")(x)
            if out_indices is not None and si in out_indices:
                y = LayerNorm(eps=self.eps, name=f"out_norm{si}")(x)
                pyramid.append(jnp.transpose(y, (0, 3, 1, 2)))
            if si < len(self.depths) - 1:
                x = PatchMerging(eps=self.eps, name=f"downsample{si}")(x)

        if out_indices is not None:
            return pyramid
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        return LayerNorm(eps=self.eps, name="final_norm")(x)
