"""MlpProjector — multimodal projector family.

Re-design of the reference's projector zoo
(src/deepencoder/build_linear.py:7-172): seven projector types selected by
config, used in the VQA stack as `linear` 2048->2048
(deepencoder_infer.py:310,455-458). Token pooling / downsampling variants
operate on a square token grid.

Types (reference names preserved for config parity):
- identity
- linear
- mlp_gelu                       (depth x [Dense, GELU])
- downsample_mlp_gelu            (sxs token-space downsample then MLP)
- normlayer_downsample_mlp_gelu  (LN before downsample)
- low_high_hybrid_split_mlp_gelu (separate low/high towers, concat)
- hybrid_split_feature_mlp_gelu  (split the feature dim in two towers)
- low_high_split_mlp_gelu        (independent towers, token concat)
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import Dense, LayerNorm


def _mlp(x, dims, dtype, name, act_first=False):
    for i, d in enumerate(dims):
        if i > 0 or act_first:
            x = nn.gelu(x)
        x = Dense(d, dtype=dtype, name=f"{name}_{i}")(x)
    return x


def token_downsample(x: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """[B, T, D] on a square grid -> [B, T/ratio^2, D*ratio^2] by folding
    ratio x ratio neighborhoods into channels (reference
    downsample_mlp_gelu's unfold)."""
    b, t, d = x.shape
    side = int(math.isqrt(t))
    assert side * side == t, "token grid must be square for downsampling"
    x = x.reshape(b, side // ratio, ratio, side // ratio, ratio, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (side // ratio) ** 2, ratio * ratio * d)


class MlpProjector(nn.Module):
    kind: str = "linear"
    n_embed: int = 2048
    depth: int = 2
    mlp_ratio: int = 1
    downsample_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, high: Optional[jnp.ndarray] = None):
        """x [B, T, D] (low tower input); `high` feeds the hybrid variants."""
        k = self.kind
        d = self.n_embed
        if k == "identity":
            return x
        if k == "linear":
            return Dense(d, dtype=self.dtype, name="proj")(x)
        if k == "mlp_gelu":
            dims = [d * self.mlp_ratio] * (self.depth - 1) + [d]
            return _mlp(x, dims, self.dtype, "mlp")
        if k in ("downsample_mlp_gelu", "normlayer_downsample_mlp_gelu"):
            if k.startswith("normlayer"):
                x = LayerNorm(name="pre_ln")(x)
            x = token_downsample(x, self.downsample_ratio)
            dims = [d * self.mlp_ratio] * (self.depth - 1) + [d]
            return _mlp(x, dims, self.dtype, "mlp")
        if k == "low_high_hybrid_split_mlp_gelu":
            assert high is not None
            lo = Dense(d // 2, dtype=self.dtype, name="low")(x)
            hi = Dense(d // 2, dtype=self.dtype, name="high")(high)
            y = jnp.concatenate([lo, hi], axis=-1)
            dims = [d] * (self.depth - 1) + [d]
            return _mlp(y, dims, self.dtype, "mlp", act_first=True)
        if k == "hybrid_split_feature_mlp_gelu":
            half = x.shape[-1] // 2
            lo = Dense(d // 2, dtype=self.dtype, name="low")(x[..., :half])
            hi = Dense(d // 2, dtype=self.dtype, name="high")(x[..., half:])
            y = jnp.concatenate([lo, hi], axis=-1)
            dims = [d] * (self.depth - 1) + [d]
            return _mlp(y, dims, self.dtype, "mlp", act_first=True)
        if k == "low_high_split_mlp_gelu":
            assert high is not None
            dims = [d // 2] * self.depth
            lo = _mlp(x, dims, self.dtype, "low_mlp")
            hi = _mlp(high, dims, self.dtype, "high_mlp")
            return jnp.concatenate([lo, hi], axis=-1)
        raise ValueError(f"unknown projector kind {k!r}")


def projector_flops_per_sample(kind: str, n_tokens: int, d_in: int,
                               n_embed: int, depth: int = 2,
                               mlp_ratio: int = 1,
                               downsample_ratio: int = 2) -> int:
    """Analytic FLOPs estimate (reference build_linear.get_flops_per_sample)."""
    if kind == "identity":
        return 0
    if kind == "linear":
        return 2 * n_tokens * d_in * n_embed
    if kind == "mlp_gelu":
        total, cur = 0, d_in
        for d in [n_embed * mlp_ratio] * (depth - 1) + [n_embed]:
            total += 2 * n_tokens * cur * d
            cur = d
        return total
    if "downsample" in kind:
        t = n_tokens // downsample_ratio ** 2
        cin = d_in * downsample_ratio ** 2
        total, cur = 0, cin
        for d in [n_embed * mlp_ratio] * (depth - 1) + [n_embed]:
            total += 2 * t * cur * d
            cur = d
        return total
    # hybrid variants: two half-width towers + fuse MLP
    return 2 * n_tokens * d_in * n_embed * depth
