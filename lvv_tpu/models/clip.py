"""CLIP ViT-L/14 vision transformer with SAM patch-bypass.

Re-design of the reference's "clip_sdpa" tower
(src/deepencoder/clip_sdpa.py:123-169 CLIPVisionEmbeddings with the
`patch_embeds` bypass, :188-230 NoTPAttention, :284-365 VitModel): instead of
CLIP's own 14x14 patch conv, the embeddings accept SAM's [B, 1024, 16, 16]
feature map, flatten it to 256 tokens, prepend the CLS token, and add
bicubically-resampled position embeddings (reference get_abs_pos); then a
24-layer pre-LN transformer (hidden 1024, 16 heads, FFN 4096, QuickGELU)
produces [B, 257, 1024].

LoRA attaches to the attention projections via Dense(lora_rank=...) — the
reference wraps with PEFT and patches the forward signature
(lora_utils.py:41-57 patch_clip_peft_forward); here adapters are plain extra
params, no wrapper needed.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fused_mlp
from .layers import Dense, LayerNorm, MultiHeadAttention, quick_gelu


def resample_abs_pos(pos: jax.Array, tgt_hw: int) -> jax.Array:
    """[1 + S*S, D] position table -> [1 + T*T, D] with bicubic resampling of
    the spatial part (reference clip_sdpa.py get_abs_pos)."""
    n = pos.shape[0] - 1
    side = int(round(n ** 0.5))
    if side == tgt_hw:
        return pos
    cls, grid = pos[:1], pos[1:]
    grid = grid.reshape(side, side, -1)
    grid = jax.image.resize(grid, (tgt_hw, tgt_hw, grid.shape[-1]),
                            method="cubic")
    return jnp.concatenate([cls, grid.reshape(tgt_hw * tgt_hw, -1)], axis=0)


class CLIPEncoderLayer(nn.Module):
    """Pre-LN CLIP layer (reference NoTPTransformer block)."""
    num_heads: int
    intermediate_size: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    # W8A8 the fused MLP (serving lever, same machinery as the SAM trunk;
    # LoRA deltas fold into the effective weight BEFORE quantization)
    quant8: bool = False

    @nn.compact
    def __call__(self, x):
        y = LayerNorm(eps=self.eps, name="ln1")(x)
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   lora_rank=self.lora_rank,
                                   lora_alpha=self.lora_alpha,
                                   name="attn")(y)
        ln2 = LayerNorm(eps=self.eps, name="ln2")
        fc1 = Dense(self.intermediate_size, dtype=self.dtype, name="fc1")
        fc2 = Dense(x.shape[-1], dtype=self.dtype, name="fc2")
        if fused_mlp.kernel_ok(x.shape[-1], self.intermediate_size):
            from .sam import _q8_scope
            ls, lb = ln2(x, return_params=True)
            w1, b1 = fc1(x, return_params=True)
            w2, b2 = fc2(jnp.zeros((1, self.intermediate_size), x.dtype),
                         return_params=True)
            return fused_mlp.ln_mlp_residual(
                x, ls, lb, w1, b1, w2, b2, eps=self.eps, act="quick_gelu",
                quant8=self.quant8 and "mlp" in _q8_scope())
        y = ln2(x)
        y = fc1(y)
        y = quick_gelu(y)
        y = fc2(y)
        return x + y


class CLIPVisionTower(nn.Module):
    """CLIP-L/14 with optional SAM patch bypass (reference VitModel)."""
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    quant8: bool = False

    @nn.compact
    def __call__(self, pixel_values: Optional[jax.Array] = None,
                 patch_embeds: Optional[jax.Array] = None):
        """Either pixel_values [B,3,H,W] (own patcher) or patch_embeds
        [B, hidden, Gh, Gw] from SAM (bypass, reference
        clip_sdpa.py:147-169). Returns [B, 1+G*G, hidden]."""
        if patch_embeds is not None:
            x = patch_embeds
            b, c, gh, gw = x.shape
            assert c == self.hidden_size
            tokens = x.reshape(b, c, gh * gw).transpose(0, 2, 1)
        else:
            img = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
            tokens = nn.Conv(self.hidden_size,
                             (self.patch_size, self.patch_size),
                             strides=self.patch_size, padding="VALID",
                             use_bias=False, dtype=self.dtype,
                             name="patch_embed")(img)
            b, gh, gw, _ = tokens.shape
            tokens = tokens.reshape(b, gh * gw, self.hidden_size)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (self.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(tokens.dtype),
                               (b, 1, self.hidden_size))
        x = jnp.concatenate([cls, tokens], axis=1)

        n_pos = (self.image_size // self.patch_size) ** 2 + 1
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (n_pos, self.hidden_size))
        pos = resample_abs_pos(pos.astype(jnp.float32), gh)
        x = x + pos[None].astype(x.dtype)

        x = LayerNorm(eps=self.layer_norm_eps, name="pre_ln")(x)
        for i in range(self.num_layers):
            x = CLIPEncoderLayer(self.num_heads, self.intermediate_size,
                                 eps=self.layer_norm_eps, dtype=self.dtype,
                                 lora_rank=self.lora_rank,
                                 lora_alpha=self.lora_alpha,
                                 quant8=self.quant8,
                                 name=f"layer_{i}")(x)
        return x
