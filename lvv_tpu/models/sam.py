"""SAM ViT-B image tower with the VARY compression head.

Re-design of the reference's "vision_tower_high"
(src/deepencoder/sam_vary_sdpa.py:100-186 ImageEncoderViT, :240-296
Attention with decomposed relative position bias, :299-345 window
partition/unpartition, :348-413 rel-pos helpers, :441-511 builder): a
1024x1024 image -> 16x16-patch ViT (windowed attention, window 14; global
attention at layers {2,5,8,11}) -> conv neck to 256ch -> VARY head `net_2`
(256->512, stride 2) + `net_3` (512->1024, stride 2) -> [B, 1024, 16, 16].

TPU-first notes:
- everything is NHWC (TPU conv layout); the public API still speaks NCHW at
  the DeepEncoder boundary for reference parity.
- window partition is reshape/transpose (compile-time shapes; the 64x64
  token grid pads to 70x70 = 5x5 windows of 14).
- the decomposed rel-pos bias is computed as an attention bias tensor and
  fed through ops.attention (bias path). The bias depends only on (q, rel
  tables), so XLA fuses its einsums into the attention matmul chain.
- all 6 camera views batch through one jit call (the reference loops views
  in Python, trainer.py:527-556 — its biggest CPU bottleneck).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import fused_mlp
from ..ops.attention import attention
from .layers import MLP, Dense, LayerNorm


def resize_rel_pos(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """Interpolate a [L, head_dim] rel-pos table to 2*max(q,k)-1 entries
    (reference sam_vary_sdpa.py get_rel_pos :348-370)."""
    max_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_dist, rel_pos.shape[1]), method="linear")
    # relative coordinates of each q to each k
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def decomposed_rel_pos_bias(q: jax.Array, rel_h: jax.Array, rel_w: jax.Array,
                            hw: Tuple[int, int]) -> jax.Array:
    """[B*, nH, H*W, dim] q + rel tables -> additive bias [B*, nH, HW, HW]
    (reference add_decomposed_rel_pos :373-413)."""
    h, w = hw
    bsz, n_heads, _, dim = q.shape
    rh = resize_rel_pos(rel_h, h, h)    # [h, h, dim]
    rw = resize_rel_pos(rel_w, w, w)    # [w, w, dim]
    qr = q.reshape(bsz, n_heads, h, w, dim)
    bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh,
                        preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qr, rw,
                        preferred_element_type=jnp.float32)
    bias = bias_h[..., :, None] + bias_w[..., None, :]
    return bias.reshape(bsz, n_heads, h * w, h * w)


def window_partition(x: jax.Array, window: int):
    """[B, H, W, C] -> [B*nW, win, win, C] with bottom/right padding
    (reference window_partition :299-320)."""
    b, h, w, c = x.shape
    ph, pw = (-h) % window, (-w) % window
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x: jax.Array, window: int, padded_hw, hw):
    """Inverse of window_partition (reference :323-345)."""
    hp, wp = padded_hw
    h, w = hw
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _q8_scope() -> frozenset:
    """Which sub-paths quant8 applies to — a trace-time tuning knob
    (LVV_Q8_SCOPE env: comma-set of dense,mlp,attn).

    Default = "mlp", the measured-best set (e2e A/B on v5e, r2):
      float 5.59 fps | mlp 5.73 | dense-only 5.20 | attn-only 5.37.
    The fused-MLP int8 kernel wins because the quantize work rides inside
    an already-fused VMEM pass; the standalone W8A8 projections and int8
    p@v lose — their extra VPU/HBM work outweighs the MXU doubling at
    these shapes. The losing paths stay available for other shapes."""
    import os
    return frozenset(os.environ.get("LVV_Q8_SCOPE", "mlp").split(","))


def _relpos_kernel_ok(h: int, w: int, head_dim: int) -> bool:
    """Eligibility for the in-kernel rel-pos flash path (TPU, MXU head
    dims). Covers BOTH the 64x64 global layers and the 14x14 windowed
    layers — the kernel pads any S to a lane-aligned block and masks the
    padded kv columns, so the [S, S] bias never materializes anywhere.
    fused_mlp._FORCE_INTERPRET lets CPU tests drive the kernel paths."""
    import jax as _jax
    del h, w
    return ((fused_mlp._FORCE_INTERPRET
             or _jax.default_backend() == "tpu")
            and head_dim in (64, 128))


class SAMAttention(nn.Module):
    """ViT attention with optional decomposed rel-pos bias
    (reference sam_vary_sdpa.py:240-296)."""
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: jnp.dtype = jnp.float32
    # W8A8 the qkv/proj projections (serving lever for the frozen trunk:
    # int8 MXU path runs ~2x bf16 TOPS, benchmarks/int8_sam_micro.json)
    quant8: bool = False

    def _dense(self, name: str, feats: int, inp):
        layer = Dense(feats, dtype=self.dtype, name=name)
        if self.quant8 and "dense" in _q8_scope():
            from ..ops.quant import w8a8_matmul
            w, bias = layer(inp, return_params=True)
            return w8a8_matmul(inp, w, bias)
        return layer(inp)

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        qkv = self._dense("qkv", 3 * c, x.reshape(b, h * w, c))
        if (self.use_rel_pos and h == w and h * w <= 512
                and _relpos_kernel_ok(h, w, head_dim)):
            # windowed layers: packed-qkv kernel — no head-split transposes,
            # rel-pos bias built in-kernel (ops/attention.py
            # window_attention_packed); the XLA glue this replaces measured
            # 1.8 ms/layer (benchmarks/sam_block_bisect.json relpos_prep)
            import math as _math
            from ..ops.attention import window_attention_packed
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
            rh = resize_rel_pos(rel_h.astype(qkv.dtype), h, h)
            rw = resize_rel_pos(rel_w.astype(qkv.dtype), w, w)
            out = window_attention_packed(
                qkv, rh, rw, scale=1.0 / _math.sqrt(head_dim),
                heads=self.num_heads, win=h,
                interpret=fused_mlp._FORCE_INTERPRET)
            out = self._dense("proj", c, out)
            return out.reshape(b, h, w, c)
        if (self.use_rel_pos and h * w > 512 and (h * w) % 1024 == 0
                and head_dim + h <= 128 and w <= 128
                # kernel divisibility (flash_attention_relpos_hpacked
                # asserts s % block_q == 0, block_k % grid_w == 0 for
                # block_q=min(s,4096), block_k=1024): ineligible shapes
                # (e.g. h=40, w=128) fall through to the XLA-glue path
                # instead of dying at trace time
                and (h * w) % min(h * w, 4096) == 0 and 1024 % w == 0
                and _relpos_kernel_ok(h, w, head_dim)):
            # global layers: head-packed kernel straight off the qkv Dense
            # output — no head split/merge transposes, q·R einsums stay
            # token-major, bias_h inside the score matmul (ops/attention.py
            # flash_attention_relpos_hpacked; replaces ~1.6 ms/layer of XLA
            # glue, benchmarks/stage_bisect.json gattn_glue)
            import math as _math
            from ..ops.attention import flash_attention_relpos_hpacked
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
            rh = resize_rel_pos(rel_h.astype(qkv.dtype), h, h)
            rw = resize_rel_pos(rel_w.astype(qkv.dtype), w, w)
            out = flash_attention_relpos_hpacked(
                qkv, rh, rw, scale=1.0 / _math.sqrt(head_dim),
                grid_w=w, heads=self.num_heads,
                block_q=min(h * w, 4096), block_k=1024,
                quant8=self.quant8 and "attn" in _q8_scope(),
                # "qk" scope: int8 SCORE matmul (2x MXU TOPS), operands
                # quantized outside the kernel — see
                # _flash_hpacked_qk8_kernel
                qk8=self.quant8 and "qk" in _q8_scope(),
                interpret=fused_mlp._FORCE_INTERPRET)
            out = self._dense("proj", c, out)
            return out.reshape(b, h, w, c)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, head_dim))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, head_dim))
            # original SAM adds q·R with UNSCALED q (the 1/sqrt(d) factor
            # applies only to the q·k term, which the attention op handles).
            if _relpos_kernel_ok(h, w, head_dim):
                # global layers on TPU: flash kernel computes the bias from
                # the decomposed tables IN-KERNEL — the [S, S] bias/logits
                # (~2.4 GB per layer per view at 64x64 tokens) never exist
                import math as _math
                from ..ops.attention import flash_attention_relpos
                rh = resize_rel_pos(rel_h.astype(q.dtype), h, h)
                rw = resize_rel_pos(rel_w.astype(q.dtype), w, w)
                qr = q.reshape(b, self.num_heads, h, w, head_dim)
                q_rh = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh,
                                  preferred_element_type=jnp.float32
                                  ).reshape(b, self.num_heads, h * w, h)
                q_rw = jnp.einsum("bnhwc,wkc->bnhwk", qr, rw,
                                  preferred_element_type=jnp.float32
                                  ).reshape(b, self.num_heads, h * w, w)
                # global layers: fused-bias kernel (bias_h folded into the
                # score matmul's contraction-depth padding, exp2 softmax);
                # 4096x1024 tiles measured best — 6.51 -> 5.35 ms/layer
                # (benchmarks/gattn_fused_micro.json)
                bq = 256 if h * w <= 256 else 4096
                bk = 256 if h * w <= 256 else 1024
                out = flash_attention_relpos(
                    q, k, v, q_rh.astype(q.dtype), q_rw.astype(q.dtype),
                    scale=1.0 / _math.sqrt(head_dim), grid_w=w,
                    block_q=bq, block_k=bk,
                    quant8=self.quant8 and "attn" in _q8_scope(),
                    interpret=fused_mlp._FORCE_INTERPRET)
                out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
                out = self._dense("proj", c, out)
                return out.reshape(b, h, w, c)
            # windowed / CPU path: materialized bias through XLA attention
            # (small windows keep this cheap; bias stored in compute dtype)
            bias = decomposed_rel_pos_bias(
                q, rel_h.astype(q.dtype), rel_w.astype(q.dtype),
                (h, w)).astype(self.dtype)
        else:
            bias = None
        out = attention(q, k, v, bias=bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = self._dense("proj", c, out)
        return out.reshape(b, h, w, c)


class SAMBlock(nn.Module):
    """ViT block with optional window attention (reference Block :205-237)."""
    num_heads: int
    window_size: int = 14
    mlp_ratio: float = 4.0
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (64, 64)
    dtype: jnp.dtype = jnp.float32
    quant8: bool = False

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = LayerNorm(eps=1e-6, name="ln1")(x)
        if self.window_size > 0:
            hw = y.shape[1:3]
            y, padded = window_partition(y, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        y = SAMAttention(self.num_heads, self.use_rel_pos, attn_size,
                         dtype=self.dtype, quant8=self.quant8,
                         name="attn")(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, padded, hw)
        x = shortcut + y
        hidden = int(x.shape[-1] * self.mlp_ratio)
        ln2 = LayerNorm(eps=1e-6, name="ln2")
        # exact erf gelu: the reference trunk (HF Sam / torch nn.GELU) is
        # erf; flax's default tanh approximation drifts up to ~5e-4 per
        # activation, visible in answer-token parity
        import functools as _ft
        gelu_exact = _ft.partial(nn.gelu, approximate=False)
        mlp = MLP(hidden, act=gelu_exact, dtype=self.dtype, name="mlp")
        if fused_mlp.kernel_ok(x.shape[-1], hidden):
            # fused LN2+MLP+residual: one HBM round-trip instead of four
            # (the two LayerNorms alone cost ~2 ms/block through XLA on v5e,
            # benchmarks/sam_block_bisect.json)
            ls, lb = ln2(x, return_params=True)
            (w1, b1), (w2, b2) = mlp(x, return_params=True)
            # NOTE: "gelu" (tanh approx) here, NOT gelu_exact — Mosaic has
            # no erf/erfc lowering; the ~5e-4 flavor delta is far below the
            # bf16 rounding this serving path already carries. The unfused
            # path below uses exact erf for fp32 torch-oracle parity.
            return fused_mlp.ln_mlp_residual(x, ls, lb, w1, b1, w2, b2,
                                             eps=1e-6, act="gelu",
                                             quant8=self.quant8 and
                                             "mlp" in _q8_scope())
        return x + mlp(ln2(x))


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC maps (reference LayerNorm2d in the neck)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return fused_mlp.norm_fast(x, w, b, eps=self.eps)


class SAMImageEncoder(nn.Module):
    """ImageEncoderViT + neck + VARY net_2/net_3
    (reference sam_vary_sdpa.py:100-186)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    vary_dims: Sequence[int] = (512, 1024)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False   # jax.checkpoint per block (training memory)
    # stop_gradient before the VARY head: the reference freezes all of SAM
    # except net_2/net_3 (deepencoder_infer.py:406-416); this encodes that
    # freeze structurally and keeps the backward pass out of the
    # global-attention pallas kernels (no VJP needed for frozen weights)
    frozen_trunk: bool = True
    # W8A8 int8 on the trunk's qkv/proj/mlp matmuls (inference serving
    # lever; the trunk is frozen so training never sees quantized grads)
    quant8: bool = False

    @nn.compact
    def __call__(self, x_nchw):
        """[B, 3, S, S] in [-1, 1] -> [B, vary_dims[-1], S/64, S/64]."""
        x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(self.dtype)
        grid = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, grid, grid, self.embed_dim))
        x = x + pos.astype(self.dtype)

        block_cls = nn.remat(SAMBlock) if self.remat else SAMBlock
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = block_cls(self.num_heads, window_size=ws,
                          mlp_ratio=self.mlp_ratio,
                          use_rel_pos=self.use_rel_pos,
                          input_size=(grid, grid), dtype=self.dtype,
                          quant8=self.quant8, name=f"block_{i}")(x)

        # neck (frozen in the reference; trainable flags live in the optimizer)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        if self.frozen_trunk:
            x = jax.lax.stop_gradient(x)

        # VARY compression head (trainable; reference :171-172 net_2/net_3 =
        # Conv2d(k=3, stride=2, padding=1) — explicit (1,1) padding, NOT
        # "SAME": at stride 2 flax SAME pads (0,1) which shifts the sampling
        # grid one pixel vs torch)
        x = nn.Conv(self.vary_dims[0], (3, 3), strides=2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="net_2")(x)
        x = nn.Conv(self.vary_dims[1], (3, 3), strides=2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="net_3")(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # NCHW at the boundary
