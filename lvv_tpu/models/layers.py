"""Shared neural layers (flax.linen) used across the model stack.

Conventions:
- params live in float32; `dtype` selects the compute dtype (bfloat16 on TPU)
- all attention goes through lvv_tpu.ops.attention (Pallas on TPU)
- LayerNorm accumulates in float32 regardless of compute dtype (the
  reference keeps a dedicated LayerNormfp32 for CLIP, clip_sdpa.py:119)
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..ops.fused_mlp import norm_fast


def quick_gelu(x):
    """CLIP's QuickGELU (reference clip_sdpa.py NoTPTransformer MLP)."""
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 internals."""
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if return_params:
            # param-only mode: lets fused kernels (ops.fused_mlp) consume the
            # exact same param tree this module owns
            return scale, bias
        return norm_fast(x, scale, bias, eps=self.eps)


class RMSNorm(nn.Module):
    """RMSNorm (Qwen2-style), fp32 internals."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return norm_fast(x, scale, eps=self.eps, rms=True)


class Dense(nn.Module):
    """Linear layer with optional additive LoRA branch.

    LoRA (reference lora_utils.py:10-38 via PEFT): y = x W + b + (alpha/r)
    * (x A) B with A ~ N(0, 1/r) init, B zero-init so the adapter starts as
    identity. The base kernel is typically frozen by the optimizer partition
    (train/optim.py), not by stop_gradient, so the same module serves both
    full-finetune and adapter regimes.
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_dim, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        lora = None
        if self.lora_rank > 0:
            a = self.param("lora_a", nn.initializers.normal(
                1.0 / self.lora_rank), (in_dim, self.lora_rank))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.lora_rank, self.features))
            lora = (a, b, self.lora_alpha / self.lora_rank)
        quantized = isinstance(kernel, dict)   # weight-only int8 serving
        if return_params:
            # param-only mode for fused kernels: fold LoRA into an effective
            # kernel (gradients still reach a/b through the fold)
            w = (kernel["q"].astype(jnp.float32) * kernel["s"][None, :]
                 if quantized else kernel)
            if lora is not None:
                a, b, scaling = lora
                w = w + (a @ b) * scaling
            return w.astype(self.dtype), (None if bias is None
                                          else bias.astype(self.dtype))
        if quantized:
            # {"q": int8 [K, N], "s": f32 [N]} from ops.quant.
            # quantize_llm_params. The dequant (convert + scale) fuses
            # into the XLA dot's operand read, so the matvec streams int8
            # bytes at full HBM rate: 0.81 ms/token whole-stack vs 1.49
            # bf16 and 1.94 via the pallas qmv kernel
            # (benchmarks/decode_stream_micro.json) — decode is
            # weight-bandwidth-bound, and XLA's own fusion beats a
            # hand-rolled kernel here.
            # Scale applied OUTPUT-side so the f32 per-column scales are
            # never rounded into the weights (the weight-side form
            # double-rounded every element through self.dtype, ~0.4% extra
            # relative error), and the [M, N] multiply is far cheaper than
            # a [K, N] one.
            y = ((x.astype(self.dtype) @ kernel["q"].astype(self.dtype))
                 * kernel["s"]).astype(self.dtype)
        else:
            y = x @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        if lora is not None:
            a, b, scaling = lora
            y = y + (x @ a.astype(self.dtype)) @ b.astype(self.dtype) * scaling
        return y


class MLP(nn.Module):
    """Transformer MLP block."""
    hidden: int
    out: Optional[int] = None
    act: Callable = nn.gelu
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_params: bool = False):
        out = self.out if self.out is not None else x.shape[-1]
        fc1 = Dense(self.hidden, dtype=self.dtype, name="fc1")
        fc2 = Dense(out, dtype=self.dtype, name="fc2")
        if return_params:
            w1b1 = fc1(x, return_params=True)
            w2b2 = fc2(jnp.zeros((1, self.hidden), x.dtype),
                       return_params=True)
            return w1b1, w2b2
        x = fc1(x)
        x = self.act(x)
        x = fc2(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """Self/cross multi-head attention over the fused attention op.

    Mirrors torch nn.MultiheadAttention semantics (used by the reference VAT
    blocks, vat_blocks.py:7-47): packed qkv projections, output projection,
    optional distinct kv input for cross-attention.
    """
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0
    qkv_bias: bool = True
    force_reference: bool = False

    @nn.compact
    def __call__(self, q_in, kv_in=None, *, causal: bool = False,
                 kv_len=None):
        kv_in = q_in if kv_in is None else kv_in
        d = q_in.shape[-1]
        head_dim = d // self.num_heads
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha)
        q = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="q_proj", **lora)(q_in)
        k = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="k_proj", **lora)(kv_in)
        v = Dense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="v_proj", **lora)(kv_in)

        def split(x):
            b, s, _ = x.shape
            return x.reshape(b, s, self.num_heads, head_dim).transpose(
                0, 2, 1, 3)

        out = attention(split(q), split(k), split(v), causal=causal,
                        kv_len=kv_len, force_reference=self.force_reference)
        b, h, s, hd = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return Dense(d, dtype=self.dtype, name="o_proj", **lora)(out)
