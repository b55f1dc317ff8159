"""Attention ops: Pallas TPU flash attention + XLA reference.

The reference stack uses torch SDPA / flash-attn in four places (SAM
sam_vary_sdpa.py:240-296, CLIP clip_sdpa.py:188-230, VAT blocks via
nn.MultiheadAttention vat_blocks.py:7-47, and the HF Qwen decoder). Here one
fused kernel serves all of them.

Design:
- `attention(q, k, v, ...)` dispatches: Pallas flash kernel on TPU (with
  automatic head-dim / sequence padding to lane multiples), pure-XLA
  `attention_reference` otherwise — the reference path is also the numeric
  oracle in tests.
- fp32 online-softmax accumulation regardless of input dtype (bf16 inputs).
- Masking model: `causal` flag + optional per-batch `kv_len` (right-padded
  keys). This covers every use in the stack: encoder attention (no mask),
  LLM training (causal + padded keys), KV-cache decode (kv_len = cache fill).
- GQA (num_q_heads > num_kv_heads) handled in the kernel's index maps —
  KV is never materialized per-query-head.
- Flash kernel pattern: 4D grid (batch, head, q_tile, kv_tile) with the KV
  dimension sequential ("arbitrary") and the online-softmax state carried in
  VMEM scratch across kv steps, so KV streams through VMEM block by block
  (full rows of 32k BEV tokens would not fit the ~16 MB VMEM budget).

Shapes: q [B, Hq, Sq, D], k/v [B, Hkv, Sk, D] -> out [B, Hq, Sq, D].
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANE = 128


def _repeat_kv(k: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return k
    b, h, s, d = k.shape
    return jnp.broadcast_to(k[:, :, None], (b, h, n_rep, s, d)).reshape(
        b, h * n_rep, s, d)


def attention_reference(q, k, v, *, causal: bool = False,
                        kv_len: Optional[jax.Array] = None,
                        bias: Optional[jax.Array] = None,
                        scale: Optional[float] = None) -> jax.Array:
    """Pure-XLA attention; numeric oracle and CPU fallback."""
    orig_dtype = q.dtype
    n_rep = q.shape[1] // k.shape[1]
    k, v = _repeat_kv(k, n_rep), _repeat_kv(v, n_rep)
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    # keep inputs in their storage dtype (bf16 on TPU feeds the MXU at full
    # rate) and accumulate in fp32 via preferred_element_type
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    sq, sk = q.shape[2], k.shape[2]
    if causal:
        qi = jnp.arange(sq)[:, None] + (sk - sq)
        ki = jnp.arange(sk)[None, :]
        logits = jnp.where(ki <= qi, logits, _NEG_INF)
    if kv_len is not None:
        ki = jnp.arange(sk)[None, None, None, :]
        logits = jnp.where(ki < kv_len[:, None, None, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


# ----------------------------------------------------------------------------
# Pallas flash attention (forward).
# ----------------------------------------------------------------------------

def _flash_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref, *,
                  causal: bool, scale: float, sq: int, sk: int,
                  use_kvlen: bool):
    bq, d = q_ref.shape[2], q_ref.shape[3]
    bk = k_ref.shape[2]
    b_idx, qi, ki = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    num_kv = pl.num_programs(3)
    q_start, k_start = qi * bq, ki * bk
    offset = sk - sq  # causal alignment when sq != sk (e.g. chunked prefill)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    limit = kvlen_ref[b_idx] if use_kvlen else sk
    if causal:
        limit = jnp.minimum(limit, q_start + bq + offset)

    @pl.when(k_start < limit)
    def _update():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        kb = k_ref[0, 0].astype(jnp.float32)
        vb = v_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kv_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if causal:
            q_ids = q_start + offset + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            s = jnp.where(kv_ids <= q_ids, s, _NEG_INF)
        if use_kvlen:
            s = jnp.where(kv_ids < kvlen_ref[b_idx], s, _NEG_INF)

        m_prev = m_ref[:, 0]
        l_prev = l_ref[:, 0]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1)
        acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "causal", "scale", "block_q", "block_k", "interpret"))
def _flash_attention_tpu(q, k, v, kv_len, *, causal: bool, scale: float,
                         block_q: int, block_k: int,
                         interpret: bool = False):
    b, hq, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    n_rep = hq // hkv
    use_kvlen = kv_len is not None
    if kv_len is None:
        kv_len = jnp.full((b,), sk, jnp.int32)

    grid = (b, hq, sq // block_q, sk // block_k)
    kernel = functools.partial(
        _flash_kernel, causal=causal, scale=scale, sq=sq, sk=sk,
        use_kvlen=use_kvlen)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h, i, j, kvl: (b_, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h, i, j, kvl: (b_, h // n_rep, j, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h, i, j, kvl: (b_, h // n_rep, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h, i, j, kvl: (b_, h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), q, k, v)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_padded(q, k, v, kv_len, *, causal: bool, scale: float,
                  block_q: int, block_k: int, interpret: bool):
    b, hq, sq, d = q.shape
    sk = k.shape[2]
    d_p = max(_pad_to(d, _LANE), _LANE) if d > 64 else 64
    block_q = min(block_q, _pad_to(sq, 8))
    block_k = min(block_k, _pad_to(sk, _LANE))
    sq_p, sk_p = _pad_to(sq, block_q), _pad_to(sk, block_k)

    if sk_p != sk and kv_len is None:
        kv_len = jnp.full((b,), sk, jnp.int32)
    pad = lambda x, s_p, d_p: jnp.pad(
        x, ((0, 0), (0, 0), (0, s_p - x.shape[2]), (0, d_p - x.shape[3])))
    qp, kp, vp = pad(q, sq_p, d_p), pad(k, sk_p, d_p), pad(v, sk_p, d_p)

    out = _flash_attention_tpu(qp, kp, vp, kv_len, causal=causal,
                               scale=scale, block_q=block_q, block_k=block_k,
                               interpret=interpret)
    return out[:, :, :sq, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_diff(q, k, v, kv_len, use_kvlen, causal, scale, block_q, block_k,
                interpret):
    return _flash_padded(q, k, v, kv_len if use_kvlen else None,
                         causal=causal, scale=scale, block_q=block_q,
                         block_k=block_k, interpret=interpret)


def _flash_diff_fwd(q, k, v, kv_len, use_kvlen, causal, scale, block_q,
                    block_k, interpret):
    out = _flash_diff(q, k, v, kv_len, use_kvlen, causal, scale, block_q,
                      block_k, interpret)
    return out, (q, k, v, kv_len)


def _flash_diff_bwd(use_kvlen, causal, scale, block_q, block_k, interpret,
                    res, g):
    # Recompute-backward in XLA: pallas_call has no autodiff rule, and the
    # LLM-LoRA training path differentiates THROUGH causal attention. The
    # [B, H, Sq, Sk] logits materialize only inside this per-layer backward
    # (fine under the per-layer remat policy used for training).
    q, k, v, kv_len = res

    def fwd(q, k, v):
        return attention_reference(q, k, v, causal=causal,
                                   kv_len=kv_len if use_kvlen else None,
                                   scale=scale)

    _, pullback = jax.vjp(fwd, q, k, v)
    dq, dk, dv = pullback(g)
    return dq, dk, dv, None


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(q, k, v, *, causal: bool = False,
                    kv_len: Optional[jax.Array] = None,
                    scale: Optional[float] = None,
                    block_q: int = 512, block_k: int = 2048,
                    interpret: bool = False) -> jax.Array:
    """Flash attention with automatic padding to TPU tile multiples.

    Pads head dim to a lane multiple (zero K/Q columns contribute nothing to
    logits; extra V columns are sliced off) and sequences to block multiples
    (padded queries discarded, padded keys masked via kv_len). Differentiable
    via a recompute-backward custom VJP (XLA reference path).
    """
    scale = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    use_kvlen = kv_len is not None
    if kv_len is None:
        kv_len = jnp.full((q.shape[0],), k.shape[2], jnp.int32)
    return _flash_diff(q, k, v, kv_len.astype(jnp.int32), use_kvlen, causal,
                       scale, block_q, block_k, interpret)


# ----------------------------------------------------------------------------
# Flash attention with decomposed relative-position bias (SAM global layers).
# ----------------------------------------------------------------------------

def _flash_relpos_kernel(q_ref, k_ref, v_ref, qrh_ref, qrw_ref, eh_ref,
                         sv_ref, o_ref, acc_ref, m_ref, l_ref, *,
                         scale: float, w: int, s_valid: int, quant8: bool):
    """Flash tile with bias computed in-kernel from the decomposed tables.

    qrh_ref [1,1,bq,GH]: full rows of q·Rh; qrw_ref [1,1,bq,W]: q·Rw for
    all kw. bias[q, kv] = qrh[q, kv // w] + qrw[q, kv % w]. The kh columns
    this kv block needs are picked with one-hot matmuls (Mosaic requires
    lane blocks of 128 or full width, so slicing the tiny GH dim is out);
    when w | bk the width bias is a cheap tiled concat instead. `s_valid`
    masks padded kv columns (windowed SAM: 196 true tokens in 256 pads).
    """
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]
    gh = qrh_ref.shape[-1]
    ki = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]
    kb = k_ref[0, 0]
    vb = v_ref[0, 0]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    qrw = qrw_ref[0, 0].astype(jnp.float32)           # [bq, W]
    # 4D block (ragged path) or 5D banded block (aligned path) -> [bq, *]
    qrh = qrh_ref[...].reshape(bq, qrh_ref.shape[-1]).astype(jnp.float32)
    k_start = ki * bk
    if bk % w == 0:
        # aligned kv tiles: the BlockSpec already sliced qrh to this tile's
        # kh band (GH*bk/S columns), so the expander matmul contracts over
        # that thin band instead of the full GH one-hot (was ~1/3 of the
        # global-layer MXU work, stage_bisect.json) — and the selector is a
        # precomputed constant, no per-program iota build
        bias_h = jax.lax.dot_general(qrh, eh_ref[...],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        bias_w = jnp.concatenate([qrw] * (bk // w), axis=1)   # [bq, bk]
    else:
        # ragged tiles: one-hot selector matmuls
        rows = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (gh, bk), 1)
        sel = (rows == (k_start + cols) // w).astype(jnp.float32)
        bias_h = jax.lax.dot_general(qrh, sel, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
        cols_w = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 1)
        sel_w = (rows_w == (k_start + cols_w) % w).astype(jnp.float32)
        bias_w = jax.lax.dot_general(qrw, sel_w, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    s = s + bias_h + bias_w
    if s_valid > 0:
        col_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col_ids < s_valid, s, _NEG_INF)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    smax = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, smax)
    p = jnp.exp(s - m_new[:, None])
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1)
    if quant8:
        # int8 p@v: per-row dynamic scale is FREE — the row max of p is
        # exactly exp(smax - m_new), already computed for the online
        # softmax (diffuse rows would lose badly under a static scale).
        # v arrives pre-quantized per column (sv). The kv-depth
        # contraction gets the full int8 MXU doubling (q@k cannot —
        # contraction depth = head_dim 64).
        sp = jnp.maximum(jnp.exp(smax - m_new), 1e-30)
        p8 = jnp.round(p * (127.0 / sp)[:, None]).astype(jnp.int8)
        z = jax.lax.dot_general(p8, vb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sv = sv_ref[...].reshape(1, z.shape[-1]).astype(jnp.float32)
        pv = (z.astype(jnp.float32) * (sp * (1.0 / 127.0))[:, None]) * sv
    else:
        pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + pv
    m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


def _relpos_mh_kernel(q_ref, k_ref, v_ref, qrh_ref, qrw_ref, o_ref, *,
                      scale: float, w: int, s_valid: int, heads: int):
    """Whole-sequence rel-pos attention with ALL heads in one program.

    For the windowed SAM layers (196 tokens padded to 256) the per-(window,
    head) grid of the streaming kernel costs 6 views x 25 windows x 12 heads
    = 1800 program launches per layer — launch overhead dominated the
    measured time (benchmarks/sam_block_bisect.json: rel-pos attention
    ~3 ms/block vs a ~0.05 ms flop floor). One program per window with a
    static head loop cuts launches 12x; single-block softmax needs no
    online-softmax state.
    """
    s = q_ref.shape[2]
    gh = qrh_ref.shape[3]
    rows = jax.lax.broadcasted_iota(jnp.int32, (gh, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (gh, s), 1)
    sel_h = (rows == cols // w).astype(jnp.float32)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (w, s), 0)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (w, s), 1)
    sel_w = (rows_w == cols_w % w).astype(jnp.float32)
    for h in range(heads):
        logits = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        bias_h = jax.lax.dot_general(
            qrh_ref[0, h].astype(jnp.float32), sel_h,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        bias_w = jax.lax.dot_general(
            qrw_ref[0, h].astype(jnp.float32), sel_w,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        logits = logits + bias_h + bias_w
        if s_valid > 0:
            kv_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(kv_ids < s_valid, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "grid_w", "block_q",
                                             "block_k", "quant8", "fused",
                                             "interpret"))
def flash_attention_relpos(q, k, v, q_rh, q_rw, *, scale: float, grid_w: int,
                           block_q: int = 1024, block_k: int = 1024,
                           quant8: bool = False, fused: bool = True,
                           interpret: bool = False):
    """Self-attention with decomposed rel-pos bias, never materializing the
    [S, S] logits/bias (SAM global layers: S=4096 saves ~2.4 GB/layer/view).

    q/k/v [B, H, S, D] with S = grid_h * grid_w; q_rh [B, H, S, grid_h] and
    q_rw [B, H, S, grid_w] are einsum(q, Rh/Rw) — tiny.

    S may be any size: sequences pad up to a lane-aligned block multiple
    and the kernel masks padded kv columns (windowed SAM: 196-token
    windows pad to 256 and run as one block per (window, head) program).
    """
    b, h, s, d = q.shape
    gh = s // grid_w
    if (fused and s > 512 and s % block_q == 0 and s % block_k == 0
            and block_k % grid_w == 0 and d + gh <= _LANE):
        # aligned big-S case (SAM global layers): the fused-bias kernel —
        # bias_h rides inside the score matmul's contraction-depth padding
        # for free (6.51 -> 5.35 ms at the global shape,
        # benchmarks/gattn_fused_micro.json)
        return flash_attention_relpos_fused(
            q, k, v, q_rh, q_rw, scale=scale, grid_w=grid_w,
            block_q=block_q, block_k=block_k, quant8=quant8,
            interpret=interpret)
    block_k = min(block_k, _pad_to(s, _LANE))
    block_q = min(block_q, _pad_to(s, _LANE))
    s_pad = _pad_to(s, max(block_q, block_k))
    block_q = min(block_q, s_pad)
    block_k = min(block_k, s_pad)
    s_valid = s if s_pad != s else 0        # 0 = no masking needed
    if s_pad != s:
        padq = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = (jnp.pad(t, padq) for t in (q, k, v))
        q_rh = jnp.pad(q_rh, padq)
        q_rw = jnp.pad(q_rw, padq)
    s_out = s
    s = s_pad
    if s_pad <= 512:
        # small windows: one program per window, heads looped in-kernel
        kernel = functools.partial(_relpos_mh_kernel, scale=scale, w=grid_w,
                                   s_valid=s_valid, heads=h)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, s, d), lambda b_: (b_, 0, 0, 0)),
                pl.BlockSpec((1, h, s, d), lambda b_: (b_, 0, 0, 0)),
                pl.BlockSpec((1, h, s, d), lambda b_: (b_, 0, 0, 0)),
                pl.BlockSpec((1, h, s, gh), lambda b_: (b_, 0, 0, 0)),
                pl.BlockSpec((1, h, s, grid_w), lambda b_: (b_, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, s, d), lambda b_: (b_, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(q, k, v, q_rh, q_rw)[:, :, :s_out]
    if quant8:
        # per-(batch, head, channel) symmetric int8 for v; padded rows are
        # zeros and quantize to 0. p is quantized IN-kernel (static scale
        # 127 — softmax rows have max exactly 1).
        sv = jnp.maximum(jnp.max(jnp.abs(v.astype(jnp.float32)), axis=2,
                                 keepdims=True) / 127.0, 1e-8)
        v = jnp.clip(jnp.round(v.astype(jnp.float32) / sv), -127,
                     127).astype(jnp.int8)
    else:
        sv = jnp.ones((b, h, 1, d), jnp.float32)
    kernel = functools.partial(_flash_relpos_kernel, scale=scale, w=grid_w,
                               s_valid=s_valid, quant8=quant8)
    grid = (b, h, s // block_q, s // block_k)

    if block_k % grid_w == 0:
        # aligned tiles: hand the kernel only this kv tile's kh band, plus
        # a constant one-hot expander eh[r, col] = (col // w == r). TPU
        # lowering requires the last block dim be lane-divisible or full,
        # so the band becomes a full 5th dim: [B, H, n_kv, Sq, ghb]
        ghb = gh * block_k // s
        n_kv = s // block_k
        q_rh = q_rh.reshape(b, h, s, n_kv, ghb).transpose(0, 1, 3, 2, 4)
        qrh_spec = pl.BlockSpec((1, 1, 1, block_q, ghb),
                                lambda b_, h_, i, j: (b_, h_, j, i, 0))
        eh = (jnp.arange(ghb)[:, None]
              == (jnp.arange(block_k) // grid_w)[None, :]
              ).astype(jnp.float32)
    else:
        qrh_spec = pl.BlockSpec((1, 1, block_q, gh),
                                lambda b_, h_, i, j: (b_, h_, i, 0))
        eh = jnp.zeros((8, block_k), jnp.float32)   # unused placeholder

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j: (b_, h_, j, 0)),
            qrh_spec,
            pl.BlockSpec((1, 1, block_q, grid_w),
                         lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec(eh.shape, lambda b_, h_, i, j: (0, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda b_, h_, i, j: (b_, h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # full-kv blocking (block_k = S) holds a (block_q, S) fp32
            # logits tile — beyond the default 16 MB scope, well within
            # physical VMEM
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(q, k, v, q_rh, q_rw, eh, sv)[:, :, :s_out]


# ----------------------------------------------------------------------------
# Fused-bias rel-pos flash attention (SAM global layers, aligned tiles).
#
# The streaming kernel above spends ~25% of its device time on the bias_h
# expander matmul (16-deep fp32 contraction -> ~12% MXU efficiency) plus two
# VPU bias adds per score element (benchmarks/stage_bisect.json). This
# variant makes bias_h FREE: q is augmented with q·Rh (GH=64 columns) and k
# with a one-hot kh indicator, so the score contraction depth goes 64 -> 128
# — exactly one MXU pass either way (depth-64 bf16 already pads to the
# 128-deep MXU tile), and s = (q·k)*scale + bias_h falls out of one dot.
# bias_w is added via an in-kernel lane tiling of q·Rw (its one-hot is
# periodic with w | block_k). exp() runs as exp2() with log2(e) folded into
# the augmented q/qrw at construction time — one fewer VPU pass over the
# [bq, bk] scores.
# ----------------------------------------------------------------------------

_LOG2E = math.log2(math.e)


def _flash_relpos_fused_kernel(q_ref, k_ref, v_ref, qrw_ref, sv_ref, o_ref,
                               acc_ref, m_ref, l_ref, *,
                               w: int, s_valid: int, quant8: bool):
    """Flash tile over augmented q/k: scores arrive with bias_h built in.

    q_ref [1,1,bq,D+GH] = concat(q*scale*log2e, q_rh*log2e);
    k_ref [1,1,bk,D+GH] = concat(k, onehot(kh)). qrw_ref [1,1,bq,W] is
    q·Rw*log2e; bias_w[q, kv] = qrw[q, kv % w] via lane tiling (w | bk).
    All softmax math is base-2 (exp2), exact-equivalent to exp.
    """
    bq = q_ref.shape[2]
    bk = k_ref.shape[2]
    ki = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0]
    kb = k_ref[0, 0]
    vb = v_ref[0, 0]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qrw = qrw_ref[0, 0].astype(jnp.float32)           # [bq, W]
    s = s + jnp.concatenate([qrw] * (bk // w), axis=1)
    if s_valid > 0:
        col_ids = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col_ids < s_valid, s, _NEG_INF)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    smax = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, smax)
    p = jnp.exp2(s - m_new[:, None])
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1)
    if quant8:
        sp = jnp.maximum(jnp.exp2(smax - m_new), 1e-30)
        p8 = jnp.round(p * (127.0 / sp)[:, None]).astype(jnp.int8)
        z = jax.lax.dot_general(p8, vb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sv = sv_ref[...].reshape(1, z.shape[-1]).astype(jnp.float32)
        pv = (z.astype(jnp.float32) * (sp * (1.0 / 127.0))[:, None]) * sv
    else:
        pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + pv
    m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0, 0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "grid_w", "block_q",
                                             "block_k", "quant8",
                                             "interpret"))
def flash_attention_relpos_fused(q, k, v, q_rh, q_rw, *, scale: float,
                                 grid_w: int, block_q: int = 2048,
                                 block_k: int = 1024, quant8: bool = False,
                                 interpret: bool = False):
    """Drop-in for `flash_attention_relpos` when S is tile-aligned and
    w | block_k (the SAM global layers: S = 4096, grid 64x64).

    Numerically equivalent (fp32 accumulation; base-2 softmax); the [S, S]
    logits/bias never materialize.
    """
    b, h, s, d = q.shape
    gh = s // grid_w
    assert s % block_q == 0 and s % block_k == 0 and block_k % grid_w == 0, (
        s, block_q, block_k, grid_w)
    f32 = jnp.float32
    # augmented operands: one extra MXU pass is avoided as long as d+gh
    # stays within the 128-lane contraction tile that depth-d already pads to
    q_aug = jnp.concatenate(
        [q.astype(f32) * (scale * _LOG2E), q_rh.astype(f32) * _LOG2E],
        axis=-1).astype(q.dtype)
    kh_onehot = (jnp.arange(gh)[None, :]
                 == (jnp.arange(s) // grid_w)[:, None]).astype(k.dtype)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(kh_onehot, (b, h, s, gh))], axis=-1)
    qrw = (q_rw.astype(f32) * _LOG2E).astype(q.dtype)

    if quant8:
        sv = jnp.maximum(jnp.max(jnp.abs(v.astype(f32)), axis=2,
                                 keepdims=True) / 127.0, 1e-8)
        v = jnp.clip(jnp.round(v.astype(f32) / sv), -127, 127).astype(
            jnp.int8)
    else:
        sv = jnp.ones((b, h, 1, d), f32)
    kernel = functools.partial(_flash_relpos_fused_kernel, w=grid_w,
                               s_valid=0, quant8=quant8)
    da = d + gh
    return pl.pallas_call(
        kernel,
        grid=(b, h, s // block_q, s // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, da),
                         lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, block_k, da),
                         lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, block_q, grid_w),
                         lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, 1, d), lambda b_, h_, i, j: (b_, h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(q_aug, k_aug, v, qrw, sv)


def _flash_hpacked_kernel(q_ref, k_ref, v_ref, qrw_ref, sv_ref, o_ref,
                          acc_ref, m_ref, l_ref, *, w: int, quant8: bool,
                          qrw_off: int = 0):
    """Head-packed twin of `_flash_relpos_fused_kernel`: operands arrive in
    [B, S, H*128] layout (each head's lane-block = [payload | augmentation])
    so the head axis is addressed by the BlockSpec index_map instead of an
    HBM transpose. Same math: augmented-contraction scores (bias_h inside
    the matmul), lane-tiled bias_w add, base-2 online softmax."""
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    ki = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qrw = qrw_ref[0][:, qrw_off:qrw_off + w].astype(
        jnp.float32)                                  # [bq, W] (lane pad cut)
    s = s + jnp.concatenate([qrw] * (bk // w), axis=1)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    smax = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, smax)
    p = jnp.exp2(s - m_new[:, None])
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1)
    if quant8:
        sp = jnp.maximum(jnp.exp2(smax - m_new), 1e-30)
        p8 = jnp.round(p * (127.0 / sp)[:, None]).astype(jnp.int8)
        z = jax.lax.dot_general(p8, vb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sv = sv_ref[...].reshape(1, z.shape[-1]).astype(jnp.float32)
        pv = (z.astype(jnp.float32) * (sp * (1.0 / 127.0))[:, None]) * sv
    else:
        pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + pv
    m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


def _flash_hpacked_qk8_kernel(q_ref, k_ref, v_ref, qrw_ref,
                              o_ref, acc_ref, m_ref, l_ref, *, w: int,
                              d: int):
    """hpacked flash tile with the SCORE matmul on the int8 MXU path
    (2x bf16 TOPS on v5e). q/k arrive pre-quantized per (token, head)
    128-lane block — the quantize work rides OUTSIDE the kernel in XLA
    (the r2 in-kernel p-quantize variant lost to its own VPU cost); the
    kernel only rescales the int32 scores with the row/col scales (two
    fused VPU multiplies) before the usual base-2 online softmax. The
    scales ride in otherwise-free LANES of inputs the kernel already
    loads — sq in qrw's lane w, sk in v's lane d — because a standalone
    [b, heads, s] scale input cannot satisfy Mosaic's (8, 128) block
    tiling (the lowering rejects a 1-wide sublane block). p@v stays bf16
    (its int8 variant measured a loss, BASELINE.md r5); the sk lane
    pollutes only output lane d, which the caller slices away."""
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    ki = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q8 = q_ref[0]                                     # [bq, 128] int8
    k8 = k_ref[0]                                     # [bk, 128] int8
    vb = v_ref[0]
    z = jax.lax.dot_general(q8, k8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sq = qrw_ref[0][:, w].astype(jnp.float32)         # [bq] stashed lane
    sk = vb[:, d].astype(jnp.float32)                 # [bk] stashed lane
    s = z.astype(jnp.float32) * sq[:, None] * sk[None, :]
    qrw = qrw_ref[0][:, :w].astype(jnp.float32)       # [bq, W]
    s = s + jnp.concatenate([qrw] * (bk // w), axis=1)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    smax = jnp.max(s, axis=-1)
    m_new = jnp.maximum(m_prev, smax)
    p = jnp.exp2(s - m_new[:, None])
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(p.astype(vb.dtype), vb,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + pv
    m_ref[...] = jnp.broadcast_to(m_new[:, None], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(ki == num_kv - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, 0], 1e-30)
        o_ref[0] = (acc_ref[...] / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "grid_w", "heads",
                                             "block_q", "block_k", "quant8",
                                             "qk8", "interpret"))
def flash_attention_relpos_hpacked(qkv, rel_h, rel_w, *, scale: float,
                                   grid_w: int, heads: int,
                                   block_q: int = 4096, block_k: int = 1024,
                                   quant8: bool = False, qk8: bool = False,
                                   interpret: bool = False):
    """Global SAM attention straight from the packed qkv Dense output —
    the head axis never transposes in HBM.

    qkv [B, S, 3C] (C = heads*d, S = grid_h*grid_w, row-major tokens);
    rel_h [grid_h, grid_h, d] / rel_w [grid_w, grid_w, d] are the resized
    decomposed tables (resize_rel_pos, reference sam_vary_sdpa.py:240-296).
    Returns [B, S, C] (pre-projection).

    Layout: each head packs to a 128-lane block — q side
    [q*scale*log2e | q·Rh*log2e], k side [k | onehot(kh)], v side [v | 0] —
    so the BlockSpec index_map addresses head h at lane offset h*128 and
    the augmented contraction (depth d+grid_h = 128) computes q·k + bias_h
    in ONE MXU pass, exactly like `flash_attention_relpos_fused`. Replaces
    that path's XLA glue (q/k/v head split/merge transposes + f32 q·R
    einsum materialization + aug concats: ~1.6 ms/layer on v5e,
    benchmarks/stage_bisect.json gattn_glue)."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    gh = s // grid_w
    assert d + gh <= _LANE and grid_w <= _LANE, (d, gh, grid_w)
    assert s % block_q == 0 and s % block_k == 0 and block_k % grid_w == 0
    f32 = jnp.float32
    cd = qkv.dtype
    qr = qkv[..., :c].reshape(b, s, heads, d)
    kr = qkv[..., c:2 * c].reshape(b, s, heads, d)
    vr = qkv[..., 2 * c:].reshape(b, s, heads, d)
    # q·R einsums on the token-major layout (no head transpose); bf16 out
    q5 = qr.reshape(b, gh, grid_w, heads, d)
    q_rh = jnp.einsum("bGwnc,Gkc->bGwnk", q5, rel_h.astype(cd),
                      preferred_element_type=f32).reshape(b, s, heads, gh)
    q_rw = jnp.einsum("bGwnc,wkc->bGwnk", q5, rel_w.astype(cd),
                      preferred_element_type=f32).reshape(b, s, heads,
                                                          grid_w)
    pad_h = _LANE - d - gh
    q_aug = jnp.concatenate(
        [qr.astype(f32) * (scale * _LOG2E), q_rh * _LOG2E] +
        ([jnp.zeros((b, s, heads, pad_h), f32)] if pad_h else []),
        axis=-1).astype(cd).reshape(b, s, heads * _LANE)
    kh_onehot = (jnp.arange(gh)[None, :]
                 == (jnp.arange(s) // grid_w)[:, None]).astype(cd)
    k_aug = jnp.concatenate(
        [kr, jnp.broadcast_to(kh_onehot[None, :, None, :],
                              (b, s, heads, gh))] +
        ([jnp.zeros((b, s, heads, pad_h), cd)] if pad_h else []),
        axis=-1).reshape(b, s, heads * _LANE)
    v_pad = jnp.concatenate(
        [vr, jnp.zeros((b, s, heads, _LANE - d), cd)],
        axis=-1).reshape(b, s, heads * _LANE)
    qrw_pad = jnp.concatenate(
        [(q_rw * _LOG2E).astype(cd),
         jnp.zeros((b, s, heads, _LANE - grid_w), cd)],
        axis=-1).reshape(b, s, heads * _LANE)
    if qk8:
        # per-(token, head) symmetric int8 of the augmented operands; the
        # quantize runs in XLA (fuses into the aug construction). Scales
        # stash into free lanes: sq -> qrw lane w, sk -> v lane d (see
        # kernel docstring for why a standalone scale input can't tile).
        assert grid_w < _LANE and d < _LANE, (grid_w, d)

        def q8_blocks(aug):
            a4 = aug.reshape(b, s, heads, _LANE).astype(f32)
            sc = jnp.maximum(jnp.max(jnp.abs(a4), axis=-1) / 127.0, 1e-8)
            a8 = jnp.clip(jnp.round(a4 / sc[..., None]), -127,
                          127).astype(jnp.int8)
            return a8.reshape(b, s, heads * _LANE), sc   # sc [b, s, heads]
        q8a, sq = q8_blocks(q_aug)
        k8a, sk = q8_blocks(k_aug)
        qrw4 = qrw_pad.reshape(b, s, heads, _LANE)
        qrw_q8 = jnp.concatenate(
            [qrw4[..., :grid_w], sq[..., None].astype(cd),
             qrw4[..., grid_w + 1:]], axis=-1).reshape(b, s, heads * _LANE)
        v4 = v_pad.reshape(b, s, heads, _LANE)
        v_q8 = jnp.concatenate(
            [v4[..., :d], sk[..., None].astype(cd),
             v4[..., d + 1:]], axis=-1).reshape(b, s, heads * _LANE)
        kernel = functools.partial(_flash_hpacked_qk8_kernel, w=grid_w,
                                   d=d)
        out = pl.pallas_call(
            kernel,
            grid=(b, heads, s // block_q, s // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, _LANE),
                             lambda b_, h_, i, j: (b_, i, h_)),
                pl.BlockSpec((1, block_k, _LANE),
                             lambda b_, h_, i, j: (b_, j, h_)),
                pl.BlockSpec((1, block_k, _LANE),
                             lambda b_, h_, i, j: (b_, j, h_)),
                pl.BlockSpec((1, block_q, _LANE),
                             lambda b_, h_, i, j: (b_, i, h_)),
            ],
            out_specs=pl.BlockSpec((1, block_q, _LANE),
                                   lambda b_, h_, i, j: (b_, i, h_)),
            out_shape=jax.ShapeDtypeStruct((b, s, heads * _LANE), cd),
            scratch_shapes=[
                pltpu.VMEM((block_q, _LANE), jnp.float32),
                pltpu.VMEM((block_q, _LANE), jnp.float32),
                pltpu.VMEM((block_q, _LANE), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
                vmem_limit_bytes=64 * 2 ** 20),
            interpret=interpret,
        )(q8a, k8a, v_q8, qrw_q8)
        return out.reshape(b, s, heads, _LANE)[..., :d].reshape(b, s, c)

    if quant8:
        sv = jnp.maximum(jnp.max(jnp.abs(vr.astype(f32)), axis=1) / 127.0,
                         1e-8)                        # [b, heads, d]
        v_pad = jnp.clip(
            jnp.round(v_pad.astype(f32)
                      / jnp.pad(sv, ((0, 0), (0, 0), (0, _LANE - d)),
                                constant_values=1.0
                                ).reshape(b, 1, heads * _LANE)),
            -127, 127).astype(jnp.int8)
        sv_in = jnp.pad(sv, ((0, 0), (0, 0), (0, _LANE - d))
                        ).reshape(b, 1, heads * _LANE)
    else:
        sv_in = jnp.ones((b, 1, heads * _LANE), f32)

    kernel = functools.partial(_flash_hpacked_kernel, w=grid_w,
                               quant8=quant8)
    out = pl.pallas_call(
        kernel,
        grid=(b, heads, s // block_q, s // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, _LANE),
                         lambda b_, h_, i, j: (b_, i, h_)),
            pl.BlockSpec((1, block_k, _LANE),
                         lambda b_, h_, i, j: (b_, j, h_)),
            pl.BlockSpec((1, block_k, _LANE),
                         lambda b_, h_, i, j: (b_, j, h_)),
            pl.BlockSpec((1, block_q, _LANE),
                         lambda b_, h_, i, j: (b_, i, h_)),
            pl.BlockSpec((1, 1, _LANE), lambda b_, h_, i, j: (b_, 0, h_)),
        ],
        out_specs=pl.BlockSpec((1, block_q, _LANE),
                               lambda b_, h_, i, j: (b_, i, h_)),
        out_shape=jax.ShapeDtypeStruct((b, s, heads * _LANE), cd),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(q_aug, k_aug, v_pad, qrw_pad, sv_in)
    # un-pad the per-head lane blocks: [B, S, H, 128][..., :d] -> [B, S, C]
    return out.reshape(b, s, heads, _LANE)[..., :d].reshape(b, s, c)


@functools.partial(jax.jit, static_argnames=("scale", "grid_w", "heads",
                                             "block_q", "block_k",
                                             "interpret"))
def flash_attention_relpos_hpacked_prepped(qkv, rel_h, rel_w, *,
                                           scale: float, grid_w: int,
                                           heads: int, block_q: int = 4096,
                                           block_k: int = 1024,
                                           interpret: bool = False):
    """hpacked global attention with the aug-pack built by the pallas prep
    kernels (hpacked_prep_pallas) instead of XLA concats/einsums. Same
    math and same flash kernel; v_aug doubles as the qrw source (lanes
    [hd:hd+grid_w] of the q-row blocks)."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    gh = s // grid_w
    assert d + gh <= _LANE and grid_w <= _LANE, (d, gh, grid_w)
    assert s % block_q == 0 and s % block_k == 0 and block_k % grid_w == 0
    q_aug, k_aug, v_aug = hpacked_prep_pallas(
        qkv, rel_h, rel_w, heads=heads, grid_w=grid_w, scale=scale,
        interpret=interpret)
    cd = qkv.dtype
    sv_in = jnp.ones((b, 1, heads * _LANE), jnp.float32)
    kernel = functools.partial(_flash_hpacked_kernel, w=grid_w,
                               quant8=False, qrw_off=d)
    out = pl.pallas_call(
        kernel,
        grid=(b, heads, s // block_q, s // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, _LANE),
                         lambda b_, h_, i, j: (b_, i, h_)),
            pl.BlockSpec((1, block_k, _LANE),
                         lambda b_, h_, i, j: (b_, j, h_)),
            pl.BlockSpec((1, block_k, _LANE),
                         lambda b_, h_, i, j: (b_, j, h_)),
            pl.BlockSpec((1, block_q, _LANE),
                         lambda b_, h_, i, j: (b_, i, h_)),
            pl.BlockSpec((1, 1, _LANE), lambda b_, h_, i, j: (b_, 0, h_)),
        ],
        out_specs=pl.BlockSpec((1, block_q, _LANE),
                               lambda b_, h_, i, j: (b_, i, h_)),
        out_shape=jax.ShapeDtypeStruct((b, s, heads * _LANE), cd),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(q_aug, k_aug, v_aug, v_aug, sv_in)
    return out.reshape(b, s, heads, _LANE)[..., :d].reshape(b, s, c)


# ----------------------------------------------------------------------------
# Packed-qkv window attention (SAM windowed layers).
# ----------------------------------------------------------------------------

def _window_packed_kernel(qkv_ref, rhf_ref, rwf_ref, eh_ref, ew_ref, o_ref,
                          *, scale: float, heads: int, win: int,
                          bias_bf16: bool = False, fold_expand: bool = False):
    """One program per window; heads looped; NO head-split transposes.

    qkv_ref [1, S, 3*C] is the raw qkv Dense output (S = win*win tokens).
    The decomposed rel-pos bias is built in-kernel from tiny tables:
      bias[t, kh*win+kw] = q[t]·rel_h[qh(t), kh] + q[t]·rel_w[qw(t), kw]
    computed as two mask-select matmuls — qtile = concat([q]*win) along
    lanes, masked by (lane//hd == qh(t)) resp. (lane//hd == qw(t)), then
    dotted with rhf/rwf [(win*hd), win] and expanded to [S, S] with the
    one-hot expanders eh/ew [win, S]. Replaces the XLA glue around the old
    per-head kernel (head split/merge transposes + q·R einsums) that
    measured 1.8 ms/layer on v5e (benchmarks/sam_block_bisect.json
    relpos_prep) — all of it becomes in-VMEM math.
    """
    s = qkv_ref.shape[1]
    c = qkv_ref.shape[2] // 3
    hd = c // heads
    bdt = qkv_ref.dtype if bias_bf16 else jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, win * hd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, win * hd), 1)
    mask_h = (cols // hd == rows // win).astype(bdt)
    mask_w = (cols // hd == rows % win).astype(bdt)
    qkv = qkv_ref[0]
    rhf = rhf_ref[...].astype(bdt)
    rwf = rwf_ref[...].astype(bdt)
    eh = eh_ref[...]
    ew = ew_ref[...]
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        qtile = jnp.concatenate([q.astype(bdt)] * win, axis=1)
        if fold_expand:
            # rhf/rwf arrive pre-composed with the one-hot expanders
            # ([win*hd, S]); the bias lands at [S, S] in one dot per table.
            logits = logits + jax.lax.dot_general(
                qtile * mask_h, rhf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = logits + jax.lax.dot_general(
                qtile * mask_w, rwf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            bias_h = jax.lax.dot_general(
                qtile * mask_h, rhf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            bias_w = jax.lax.dot_general(
                qtile * mask_w, rwf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = (logits
                      + jax.lax.dot_general(bias_h, eh,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                      + jax.lax.dot_general(bias_w, ew,
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32))
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "win",
                                             "bias_bf16", "fold_expand",
                                             "interpret"))
def window_attention_packed(qkv, rel_h, rel_w, *, scale: float, heads: int,
                            win: int, bias_bf16: bool = False,
                            fold_expand: bool = False,
                            interpret: bool = False) -> jax.Array:
    """Window self-attention over packed qkv with decomposed rel-pos bias.

    qkv [B, S, 3*C] (S = win*win, token order row-major in the window);
    rel_h/rel_w [win, win, hd] = resize_rel_pos tables indexed
    [q_coord, k_coord, channel]. Returns [B, S, C] (pre-projection).
    `bias_bf16` runs the mask-select bias pipeline in the input dtype
    (halves its VPU traffic and doubles its dot throughput); `fold_expand`
    pre-composes the expanders into the tables so bias lands in one dot.
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    assert s == win * win, (s, win)
    # rhf[(r*hd + ch), kh] = rel_h[r, kh, ch]
    rhf = rel_h.transpose(0, 2, 1).reshape(win * hd, win)
    rwf = rel_w.transpose(0, 2, 1).reshape(win * hd, win)
    kh = jnp.arange(s) // win
    kw = jnp.arange(s) % win
    eh = (jnp.arange(win)[:, None] == kh[None, :]).astype(jnp.float32)
    ew = (jnp.arange(win)[:, None] == kw[None, :]).astype(jnp.float32)
    if fold_expand:
        rhf = rhf.astype(jnp.float32) @ eh                   # [win*hd, S]
        rwf = rwf.astype(jnp.float32) @ ew
    kernel = functools.partial(_window_packed_kernel, scale=scale,
                               heads=heads, win=win, bias_bf16=bias_bf16,
                               fold_expand=fold_expand)
    rtab_n = s if fold_expand else win
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((win * hd, rtab_n), lambda i: (0, 0)),
            pl.BlockSpec((win * hd, rtab_n), lambda i: (0, 0)),
            pl.BlockSpec((win, s), lambda i: (0, 0)),
            pl.BlockSpec((win, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(qkv, rhf, rwf, eh, ew)


def _window_fused_kernel(qkv_ref, qrh_ref, qrw_ref, et_ref, o_ref, *,
                         heads: int, scale: float, wchunk: int = 1):
    """One program per window; heads looped; bias folded into the score
    contraction.

    qkv_ref [1, S, 3*C] is the raw qkv Dense output. qrh_ref/qrw_ref
    [1, heads, S, win] carry q·Rh / q·Rw (tiny, XLA-side transpose-light
    einsums), pre-scaled by log2(e). et_ref [S, 2*win] = concat(
    onehot(kh), onehot(kw)). Per head the kernel builds augmented
    operands in VMEM — q_aug = concat(q*scale*log2e, qrh_h, qrw_h),
    k_aug = concat(k, et) — and the score matmul's contraction depth goes
    hd=64 -> hd+2*win=92, still inside the one 128-deep MXU pass that
    depth-64 bf16 already pads to. Both decomposed rel-pos bias terms
    therefore ride for free: no qtile broadcast, no masked-select
    matmuls, no one-hot expander matmuls, no [S, S] bias adds (the
    packed kernel's per-head bias construction). Softmax is base-2."""
    s = qkv_ref.shape[1]
    c = qkv_ref.shape[2] // 3
    hd = c // heads
    et = et_ref[...]
    qscale = jnp.float32(scale * _LOG2E)
    for wi in range(wchunk):
        qkv = qkv_ref[wi]
        for h in range(heads):
            # operands stay in the storage dtype (bf16 feeds the MXU at
            # full rate); only the scale multiply runs in fp32 first
            q = qkv[:, h * hd:(h + 1) * hd]
            qs = (q.astype(jnp.float32) * qscale).astype(q.dtype)
            k = qkv[:, c + h * hd:c + (h + 1) * hd]
            v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
            q_aug = jnp.concatenate([qs, qrh_ref[wi, h], qrw_ref[wi, h]],
                                    axis=1)
            k_aug = jnp.concatenate([k, et], axis=1)
            logits = jax.lax.dot_general(q_aug, k_aug,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[wi, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "win",
                                             "wchunk", "interpret"))
def window_attention_fused(qkv, rel_h, rel_w, *, scale: float, heads: int,
                           win: int, wchunk: int = 1,
                           interpret: bool = False) -> jax.Array:
    """Window self-attention over packed qkv with the rel-pos bias folded
    into the score contraction (the fused-bias trick from the SAM global
    layers applied to the 14x14 windows).

    qkv [B, S, 3*C] (S = win*win, row-major window tokens); rel_h/rel_w
    [win, win, hd] = resize_rel_pos tables indexed [q_coord, k_coord,
    channel]. Returns [B, S, C] (pre-projection).

    The only XLA-side prep is the q·Rh / q·Rw einsums over the
    head-innermost reshape of the q slice — [B, heads, S, win] outputs,
    ~10 MB at the SAM shape (the full augmented-operand variant that
    materialized [B, S, heads*128] tensors in HBM LOST the A/B: 3.6 ms vs
    2.4 ms packed — HBM traffic ate the kernel win). Requires
    hd + 2*win <= 128.
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    assert s == win * win and hd + 2 * win <= _LANE, (s, win, hd)
    f32 = jnp.float32
    q = qkv[..., :c].reshape(b, win, win, heads, hd)
    # log2(e) folded in: the kernel's softmax runs base-2 (exact-equivalent)
    rh = rel_h.astype(f32) * _LOG2E
    rw = rel_w.astype(f32) * _LOG2E
    # original SAM adds q·R with UNSCALED q (sam_vary_sdpa.py:373-413)
    q_rh = jnp.einsum("bxyhd,xkd->bhxyk", q.astype(f32), rh,
                      preferred_element_type=f32)
    q_rw = jnp.einsum("bxyhd,ykd->bhxyk", q.astype(f32), rw,
                      preferred_element_type=f32)
    q_rh = q_rh.reshape(b, heads, s, win).astype(qkv.dtype)
    q_rw = q_rw.reshape(b, heads, s, win).astype(qkv.dtype)

    kh = jnp.arange(s) // win
    kw = jnp.arange(s) % win
    eh = (kh[:, None] == jnp.arange(win)[None, :])
    ew = (kw[:, None] == jnp.arange(win)[None, :])
    et = jnp.concatenate([eh, ew], axis=1).astype(qkv.dtype)   # [S, 2*win]

    assert b % wchunk == 0, (b, wchunk)
    kernel = functools.partial(_window_fused_kernel, heads=heads,
                               scale=scale, wchunk=wchunk)
    return pl.pallas_call(
        kernel,
        grid=(b // wchunk,),
        in_specs=[
            pl.BlockSpec((wchunk, s, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((wchunk, heads, s, win), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((wchunk, heads, s, win), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((s, 2 * win), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((wchunk, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # wchunk > 4 holds several windows' qkv blocks at once
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(qkv, q_rh, q_rw, et)


def _window_fused2_kernel(qkv_ref, qrhw_ref, et_ref, o_ref, *,
                          heads: int, scale: float):
    """One program per window; heads looped; rel-pos bias via a SECOND
    tiny dot instead of in-kernel operand concats.

    `_window_fused_kernel` folds the bias into ONE augmented dot but pays
    two lane-axis concatenations per head in VMEM (cross-lane shuffles).
    Here scores = dot(q*scale, k^T) + dot(qrhw_h, et^T): the first dot's
    depth-64 contraction pads to the same 128-deep MXU pass either way,
    and the second dot ([S, 2win] @ [2win, S], contraction 28) is one
    extra MXU pass with NO vector-unit data motion at all. qrhw_ref
    [1, heads, S, 2*win] = concat(q·Rh, q·Rw)*log2e built by XLA outside;
    et_ref [S, 2*win] = concat(onehot(kh), onehot(kw))."""
    c = qkv_ref.shape[2] // 3
    hd = c // heads
    et = et_ref[...]
    qscale = jnp.float32(scale * _LOG2E)
    qkv = qkv_ref[0]
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        qs = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        k = qkv[:, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
        logits = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        logits = logits + jax.lax.dot_general(
            qrhw_ref[0, h], et, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp2(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "win",
                                             "interpret"))
def window_attention_fused2(qkv, rel_h, rel_w, *, scale: float, heads: int,
                            win: int, interpret: bool = False) -> jax.Array:
    """Window self-attention, rel-pos bias as a second tiny score dot
    (see `_window_fused2_kernel`). Same contract as
    `window_attention_packed`: qkv [B, S, 3*C], rel tables [win, win, hd],
    returns [B, S, C]."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    assert s == win * win, (s, win)
    f32 = jnp.float32
    q = qkv[..., :c].reshape(b, win, win, heads, hd)
    rh = rel_h.astype(f32) * _LOG2E
    rw = rel_w.astype(f32) * _LOG2E
    # original SAM adds q·R with UNSCALED q (sam_vary_sdpa.py:373-413)
    q_rh = jnp.einsum("bxyhd,xkd->bhxyk", q.astype(f32), rh,
                      preferred_element_type=f32)
    q_rw = jnp.einsum("bxyhd,ykd->bhxyk", q.astype(f32), rw,
                      preferred_element_type=f32)
    qrhw = jnp.concatenate([q_rh.reshape(b, heads, s, win),
                            q_rw.reshape(b, heads, s, win)],
                           axis=-1).astype(qkv.dtype)        # [B,H,S,2win]

    kh = jnp.arange(s) // win
    kw = jnp.arange(s) % win
    eh = (kh[:, None] == jnp.arange(win)[None, :])
    ew = (kw[:, None] == jnp.arange(win)[None, :])
    et = jnp.concatenate([eh, ew], axis=1).astype(qkv.dtype)   # [S, 2*win]

    kernel = functools.partial(_window_fused2_kernel, heads=heads,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, heads, s, 2 * win), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((s, 2 * win), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(qkv, qrhw, et)


# ----------------------------------------------------------------------------
# Pallas aug-pack prep for the hpacked global kernel.
#
# flash_attention_relpos_hpacked's operands (q_aug/k_aug/v_pad/qrw_pad in
# [B, S, H*128] head-lane-block layout) were assembled by XLA concats +
# token-major q·R einsums — ~1.65 ms/layer of pure glue on v5e
# (benchmarks/stage_bisect.json gattn_glue). These two kernels build them
# directly:
# - grid over the 64 qh rows: all tokens sharing qh sit in one contiguous
#   [B, 1, grid_w, 3C] slab, so q·Rh is ONE [B*grid_w, d] @ kron-table
#   matmul per program; the same program emits q_aug = [q*scale*log2e |
#   q·Rh*log2e] and k_aug = [k | onehot(kh)] (onehot is a per-program
#   constant row).
# - grid over the 64 qw columns (via a transposed view): emits
#   v_aug = [v | q·Rw*log2e] — the kv-side PV payload and the q-side bias_w
#   rows share one tensor; the attention kernel reads it twice (rows j for
#   v, rows i lanes 64: for qrw).
# ----------------------------------------------------------------------------

def _gaug_qk_kernel(qkv_ref, th_ref, oh_ref, oq_ref, ok_ref, *, heads: int,
                    scale: float):
    b, _, w, c3 = qkv_ref.shape
    c = c3 // 3
    hd = c // heads
    pad = _LANE - hd
    rows = b * w
    qkv = qkv_ref[...].reshape(rows, c3)
    q = qkv[:, :c]
    qrh = jax.lax.dot_general(
        q, th_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(oq_ref.dtype)
    sc = jnp.asarray(scale * _LOG2E, jnp.float32)

    def put(ref, lo, width, val2d):
        ref[..., lo:lo + width] = val2d.reshape(
            ref.shape[:-1] + (width,))

    oh = oh_ref[...]                                   # [1, pad] onehot row
    for h in range(heads):
        put(oq_ref, h * _LANE,
            hd, (q[:, h * hd:(h + 1) * hd].astype(jnp.float32) * sc
                 ).astype(oq_ref.dtype))
        put(oq_ref, h * _LANE + hd, pad, qrh[:, h * pad:(h + 1) * pad])
        put(ok_ref, h * _LANE, hd,
            qkv[:, c + h * hd:c + (h + 1) * hd].astype(ok_ref.dtype))
        put(ok_ref, h * _LANE + hd, pad,
            jnp.broadcast_to(oh, (rows, pad)).astype(ok_ref.dtype))


def _gaug_v_kernel(qkvt_ref, tw_ref, ov_ref, *, heads: int):
    b, _, gh, c3 = qkvt_ref.shape
    c = c3 // 3
    hd = c // heads
    pad = _LANE - hd
    rows = b * gh
    qkv = qkvt_ref[...].reshape(rows, c3)
    qrw = jax.lax.dot_general(
        qkv[:, :c], tw_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(ov_ref.dtype)

    def put(ref, lo, width, val2d):
        ref[..., lo:lo + width] = val2d.reshape(
            ref.shape[:-1] + (width,))

    for h in range(heads):
        put(ov_ref, h * _LANE, hd,
            qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd].astype(
                ov_ref.dtype))
        put(ov_ref, h * _LANE + hd, pad, qrw[:, h * pad:(h + 1) * pad])


def _gaug_tables(rel, heads: int, hd: int, pad: int, scale_log2e: float,
                 dtype):
    """kron tables [grid, heads*hd, heads*pad]:
    tab[g, h*hd+d, h*pad+k] = rel[g, k, d] * scale_log2e (k beyond the
    table width lands in zero columns)."""
    g, kw, _ = rel.shape
    eye = jnp.eye(heads, dtype=jnp.float32)
    relp = jnp.pad(rel.astype(jnp.float32) * scale_log2e,
                   ((0, 0), (0, pad - kw), (0, 0)))
    t = jnp.einsum("ab,gkd->gadbk", eye, relp)
    return t.reshape(g, heads * hd, heads * pad).astype(dtype)


def hpacked_prep_pallas(qkv, rel_h, rel_w, *, heads: int, grid_w: int,
                        scale: float, interpret: bool = False):
    """-> (q_aug, k_aug, v_aug) in [B, S, H*128] layout for
    flash_attention_relpos_hpacked, built without XLA glue."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    gh = s // grid_w
    pad = _LANE - hd
    assert gh <= pad and grid_w <= pad, (gh, grid_w, pad)
    cd = qkv.dtype
    th = _gaug_tables(rel_h, heads, hd, pad, _LOG2E, cd)
    tw = _gaug_tables(rel_w, heads, hd, pad, _LOG2E, cd)
    onehot = (jnp.arange(gh)[:, None]
              == jnp.arange(pad)[None, :]).astype(cd)    # [gh, pad]
    q4 = qkv.reshape(b, gh, grid_w, c3)
    kern_qk = functools.partial(_gaug_qk_kernel, heads=heads, scale=scale)
    q_aug, k_aug = pl.pallas_call(
        kern_qk,
        grid=(gh,),
        in_specs=[
            pl.BlockSpec((b, 1, grid_w, c3), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((1, heads * hd, heads * pad), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, pad), lambda g: (g, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, 1, grid_w, heads * _LANE),
                         lambda g: (0, g, 0, 0)),
            pl.BlockSpec((b, 1, grid_w, heads * _LANE),
                         lambda g: (0, g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, gh, grid_w, heads * _LANE), cd),
            jax.ShapeDtypeStruct((b, gh, grid_w, heads * _LANE), cd),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q4, th, onehot)
    q4t = q4.transpose(0, 2, 1, 3)           # [b, qw, qh, c3]
    v_aug = pl.pallas_call(
        functools.partial(_gaug_v_kernel, heads=heads),
        grid=(grid_w,),
        in_specs=[
            pl.BlockSpec((b, 1, gh, c3), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((1, heads * hd, heads * pad), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, 1, gh, heads * _LANE),
                               lambda g: (0, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, grid_w, gh, heads * _LANE), cd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q4t, tw).transpose(0, 2, 1, 3)
    hl = heads * _LANE
    return (q_aug.reshape(b, s, hl), k_aug.reshape(b, s, hl),
            v_aug.reshape(b, s, hl))


# ----------------------------------------------------------------------------
# Window attention v4: pallas-prepped q·R bias + expander-dot kernel.
#
# The cost bisect (winattn_bisect2/3.json) showed: (a) the attention kernel
# with SUPPLIED bias rows costs only 1.38 ms/layer vs 2.39 for the shipped
# mask-select kernel, but (b) computing qrh/qrw in XLA costs ~0.9-3.8 ms
# because every formulation needs 5D transposes or tiny batched matmuls.
# This variant computes the bias rows in a separate PALLAS kernel whose grid
# runs over the 14 qh (resp. qw) coordinate values: all rows sharing a
# coordinate sit in one BlockSpec block ([B, 14, C] slab of the qkv tensor,
# via a [B, 14, 14, C] view for qw), so each program is ONE
# [B*14, 768] @ [768, heads*16] matmul against a precomputed
# kron(I_heads, rel[g]) table — large, MXU-friendly, no transposes anywhere.
# ----------------------------------------------------------------------------

def _wbias_prep_kernel(q_ref, tab_ref, o_ref):
    rows = q_ref.shape[0] * q_ref.shape[1] * q_ref.shape[2]
    q = q_ref[...].reshape(rows, q_ref.shape[3])
    t = tab_ref[0]
    o_ref[...] = jax.lax.dot_general(
        q, t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype).reshape(
        o_ref.shape)


def _window_bias_prep(qkv, rel_h, rel_w, *, heads: int, win: int,
                      interpret: bool = False):
    """-> (qrh, qrw) [B, S, heads*16] bf16, pre-scaled by LOG2E.

    Tables: kron(I_heads, rel[g].T) per coordinate g, built once per call in
    XLA (tiny). qh rows are contiguous 14-blocks of the token axis; qw rows
    are the stride-14 comb, addressed via a [B, win, win, C] view."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    kp = max(8, -(-win // 8) * 8)
    cd = qkv.dtype
    eye = jnp.eye(heads, dtype=jnp.float32)
    # tab[g, h*hd+d, h*kp+k] = rel[g, k, d] * LOG2E
    def mk_tab(rel):
        t = jnp.einsum("ab,gkd->gadbk", eye,
                       rel.astype(jnp.float32) * _LOG2E)
        return t.reshape(win, heads * hd, heads * kp).astype(cd)

    th = mk_tab(jnp.pad(rel_h, ((0, 0), (0, kp - win), (0, 0))))
    tw = mk_tab(jnp.pad(rel_w, ((0, 0), (0, kp - win), (0, 0))))
    q4 = qkv[..., :c].reshape(b, win, win, c)
    qrh = pl.pallas_call(
        _wbias_prep_kernel,
        grid=(win,),
        in_specs=[
            pl.BlockSpec((b, 1, win, c), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((1, heads * hd, heads * kp), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, 1, win, heads * kp),
                               lambda g: (0, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, win, win, heads * kp), cd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q4, th).reshape(b, s, heads * kp)
    # qw grouping: Mosaic needs the sliced dim out of the trailing two, so
    # ride a cheap XLA transpose (q-part only, ~22 MB at the SAM shape)
    q4t = q4.transpose(0, 2, 1, 3)                           # [b, qw, qh, c]
    qrw = pl.pallas_call(
        _wbias_prep_kernel,
        grid=(win,),
        in_specs=[
            pl.BlockSpec((b, 1, win, c), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((1, heads * hd, heads * kp), lambda g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, 1, win, heads * kp),
                               lambda g: (0, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, win, win, heads * kp), cd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q4t, tw).transpose(0, 2, 1, 3).reshape(b, s, heads * kp)
    return qrh, qrw


def _window_v4_kernel(qkv_ref, qrh_ref, qrw_ref, eh_ref, ew_ref, o_ref, *,
                      heads: int, scale: float, win: int):
    s = qkv_ref.shape[1]
    c = qkv_ref.shape[2] // 3
    hd = c // heads
    kp = qrh_ref.shape[2] // heads
    cs = scale * _LOG2E
    eh = eh_ref[...]
    ew = ew_ref[...]
    qkv = qkv_ref[0]
    qrh = qrh_ref[0]
    qrw = qrw_ref[0]
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
        st = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * cs
        st = st + jax.lax.dot_general(
            qrh[:, h * kp:(h + 1) * kp], eh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        st = st + jax.lax.dot_general(
            qrw[:, h * kp:(h + 1) * kp], ew, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(st, axis=-1, keepdims=True)
        p = jnp.exp2(st - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "win",
                                             "interpret"))
def window_attention_v4(qkv, rel_h, rel_w, *, scale: float, heads: int,
                        win: int, interpret: bool = False) -> jax.Array:
    """Window self-attention with pallas-prepped q·R bias (see above).

    qkv [B, S, 3*C]; rel_h/rel_w [win, win, hd]. Returns [B, S, C]."""
    b, s, c3 = qkv.shape
    c = c3 // 3
    assert s == win * win, (s, win)
    cd = qkv.dtype
    kp = max(8, -(-win // 8) * 8)
    qrh, qrw = _window_bias_prep(qkv, rel_h, rel_w, heads=heads, win=win,
                                 interpret=interpret)
    kh = jnp.arange(s) // win
    kw = jnp.arange(s) % win
    eh = (jnp.arange(kp)[:, None] == kh[None, :]).astype(cd)
    ew = (jnp.arange(kp)[:, None] == kw[None, :]).astype(cd)
    kernel = functools.partial(_window_v4_kernel, scale=scale, heads=heads,
                               win=win)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, heads * kp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, heads * kp), lambda i: (i, 0, 0)),
            pl.BlockSpec((kp, s), lambda i: (0, 0)),
            pl.BlockSpec((kp, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(qkv, qrh, qrw, eh, ew)


# ----------------------------------------------------------------------------
# Phase-separated window attention (SAM windowed layers, v2).
#
# The packed kernel (`window_attention_packed`) interleaves a VPU softmax
# between every head's MXU dots: per window program the dependency chain
# dot -> bias dots -> softmax -> dot repeats 12 times, so the MXU idles
# through every softmax and the 1800 window-head iterations serialize
# (~1.3 us each; BASELINE.md round-3 A/B). This variant splits the program
# into three phases over a [G*heads, S, S] VMEM scratch:
#   1. ALL score matmuls (+ bias expander dots) — independent MXU work that
#      pipelines back-to-back;
#   2. ONE exp2 softmax pass over the whole scratch — one long VPU stretch;
#   3. ALL pv matmuls.
# The q·R bias rows are precomputed by XLA as tiny batched einsums over the
# gathered tables (qrh/qrw [B, heads, S, 16], ~12 MB) instead of the
# in-kernel mask-select matmuls, removing 4 of the 6 per-head dots.
# `gwin` folds G windows into one program to amortize program overhead.
# Reference behavior: window partition + decomposed rel-pos of
# sam_vary_sdpa.py:240-296 (same math as window_attention_packed).
# ----------------------------------------------------------------------------

def _window_phased_kernel(qkv_ref, qrh_ref, qrw_ref, eh_ref, ew_ref, o_ref,
                          s_scr, *, heads: int, scale: float, batched: bool):
    g = qkv_ref.shape[0]
    s = qkv_ref.shape[1]
    c = qkv_ref.shape[2] // 3
    hd = c // heads
    cs = scale * _LOG2E
    eh = eh_ref[...]
    ew = ew_ref[...]
    # Phase 1: scores + bias for every (window, head) into scratch.
    for gi in range(g):
        qkv = qkv_ref[gi]
        if batched:
            q3 = qkv[:, :c].reshape(s, heads, hd)
            k3 = qkv[:, c:2 * c].reshape(s, heads, hd)
            st = jax.lax.dot_general(
                q3, k3, (((2,), (2,)), ((1,), (1,))),
                preferred_element_type=jnp.float32)          # [heads, s, s]
            bias = jax.lax.dot_general(
                qrh_ref[gi].reshape(heads * s, eh.shape[0]), eh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            bias = bias + jax.lax.dot_general(
                qrw_ref[gi].reshape(heads * s, ew.shape[0]), ew,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s_scr[gi * heads:(gi + 1) * heads] = (
                st * cs + bias.reshape(heads, s, s))
        else:
            for h in range(heads):
                q = qkv[:, h * hd:(h + 1) * hd]
                k = qkv[:, c + h * hd:c + (h + 1) * hd]
                st = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bias = jax.lax.dot_general(
                    qrh_ref[gi, h], eh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                bias = bias + jax.lax.dot_general(
                    qrw_ref[gi, h], ew, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s_scr[gi * heads + h] = st * cs + bias
    # Phase 2: one softmax pass over the whole scratch (base-2; the LOG2E
    # factor rode in via cs and the pre-scaled qrh/qrw).
    sall = s_scr[...]
    m = jnp.max(sall, axis=-1, keepdims=True)
    p = jnp.exp2(sall - m)
    s_scr[...] = p / jnp.sum(p, axis=-1, keepdims=True)
    # Phase 3: pv matmuls.
    for gi in range(g):
        qkv = qkv_ref[gi]
        if batched:
            v3 = qkv[:, 2 * c:].reshape(s, heads, hd)
            pv = jax.lax.dot_general(
                s_scr[gi * heads:(gi + 1) * heads].astype(qkv.dtype),
                v3, (((2,), (1,)), ((0,), (1,))),
                preferred_element_type=jnp.float32)          # [heads, s, hd]
            for h in range(heads):
                o_ref[gi, :, h * hd:(h + 1) * hd] = pv[h].astype(o_ref.dtype)
        else:
            for h in range(heads):
                v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
                p_h = s_scr[gi * heads + h].astype(v.dtype)
                o_ref[gi, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                    p_h, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "win", "gwin",
                                             "batched", "interpret"))
def window_attention_phased(qkv, rel_h, rel_w, *, scale: float, heads: int,
                            win: int, gwin: int = 1, batched: bool = False,
                            interpret: bool = False) -> jax.Array:
    """Window self-attention over packed qkv, phase-separated (see above).

    qkv [B, S, 3*C] (S = win*win, row-major window tokens); rel_h/rel_w
    [win, win, hd] resized decomposed tables. Returns [B, S, C].
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    assert s == win * win, (s, win)
    assert b % gwin == 0, (b, gwin)
    cd = qkv.dtype
    kpad = max(8, -(-win // 8) * 8)
    q4 = qkv[..., :c].reshape(b, s, heads, hd)
    # gathered tables: row t -> rel_h[t//win] / rel_w[t%win]
    rh_g = jnp.repeat(rel_h.astype(cd), win, axis=0)         # [S, win, hd]
    rw_g = jnp.tile(rel_w.astype(cd), (win, 1, 1))
    qrh = jnp.einsum("bshd,skd->bhsk", q4, rh_g,
                     preferred_element_type=jnp.float32) * _LOG2E
    qrw = jnp.einsum("bshd,skd->bhsk", q4, rw_g,
                     preferred_element_type=jnp.float32) * _LOG2E
    qrh = jnp.pad(qrh, ((0, 0), (0, 0), (0, 0), (0, kpad - win))).astype(cd)
    qrw = jnp.pad(qrw, ((0, 0), (0, 0), (0, 0), (0, kpad - win))).astype(cd)
    kh = jnp.arange(s) // win
    kw = jnp.arange(s) % win
    eh = (jnp.arange(kpad)[:, None] == kh[None, :]).astype(cd)  # [kpad, S]
    ew = (jnp.arange(kpad)[:, None] == kw[None, :]).astype(cd)
    kernel = functools.partial(_window_phased_kernel, scale=scale,
                               heads=heads, batched=batched)
    return pl.pallas_call(
        kernel,
        grid=(b // gwin,),
        in_specs=[
            pl.BlockSpec((gwin, s, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((gwin, heads, s, kpad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((gwin, heads, s, kpad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((kpad, s), lambda i: (0, 0)),
            pl.BlockSpec((kpad, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((gwin, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((gwin * heads, s, s), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(qkv, qrh, qrw, eh, ew)


# ----------------------------------------------------------------------------
# Window attention v3 (SAM windowed layers): precomputed q·R bias rows.
#
# Kernel cost bisect (benchmarks/winattn_bisect2.json, v5e): the 12 QK dots
# alone cost 0.844 ms/layer, +pv 0.884, +softmax 1.072 — but the shipped
# packed kernel's in-kernel mask-select bias construction (qtile concat + 2
# mask muls + 4 dots per head) brings it to 2.39 ms. Here the bias rows
# qrh/qrw [B, heads, S, win] = q·rel_h / q·rel_w are precomputed by ONE
# qh/qw-grouped batched matmul in XLA (rows of a window grouped by their
# qh/qw coordinate share the rel table row, so batch=win of
# [B*win*heads, hd] @ [hd, win] — large, MXU-friendly), and the kernel
# expands them to [S, S] either via two tiny one-hot expander dots
# ("edot", +0.30 ms measured) or sublane/lane broadcasts ("bcast").
# Same math as window_attention_packed (reference sam_vary_sdpa.py:240-296).
# ----------------------------------------------------------------------------

def _window_v3_kernel(qkv_ref, qrh_ref, qrw_ref, eh_ref, ew_ref, o_ref, *,
                      heads: int, scale: float, win: int, bias_mode: str):
    s = qkv_ref.shape[1]
    c = qkv_ref.shape[2] // 3
    hd = c // heads
    cs = scale * _LOG2E
    eh = eh_ref[...]
    ew = ew_ref[...]
    qkv = qkv_ref[0]
    for h in range(heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
        st = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * cs
        if bias_mode == "edot":
            bias = jax.lax.dot_general(
                qrh_ref[0, h], eh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            bias = bias + jax.lax.dot_general(
                qrw_ref[0, h], ew, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            st = st + bias
        else:  # bcast: expand [S, win] rows across the kw/kh axis
            qrh = qrh_ref[0, h][:, :win].astype(jnp.float32)
            qrw = qrw_ref[0, h][:, :win].astype(jnp.float32)
            st = st + jnp.broadcast_to(
                qrh[:, :, None], (s, win, win)).reshape(s, s)
            st = st + jnp.broadcast_to(
                qrw[:, None, :], (s, win, win)).reshape(s, s)
        m = jnp.max(st, axis=-1, keepdims=True)
        p = jnp.exp2(st - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "win",
                                             "bias_mode", "interpret"))
def window_attention_v3(qkv, rel_h, rel_w, *, scale: float, heads: int,
                        win: int, bias_mode: str = "edot",
                        interpret: bool = False) -> jax.Array:
    """Window self-attention over packed qkv with precomputed q·R bias.

    qkv [B, S, 3*C] (S = win*win, row-major window tokens); rel_h/rel_w
    [win, win, hd] resized decomposed tables. Returns [B, S, C].
    """
    b, s, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    assert s == win * win, (s, win)
    cd = qkv.dtype
    kpad = max(8, -(-win // 8) * 8)
    # qh-grouped batched matmul: rows with the same qh share rel_h[qh]
    q5 = qkv[..., :c].reshape(b, win, win, heads, hd)
    qrh = jax.lax.dot_general(
        q5.transpose(1, 0, 2, 3, 4).reshape(win, b * win * heads, hd),
        rel_h.transpose(0, 2, 1).astype(cd),                  # [win, hd, win]
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # [win, bwh, win]
    qrh = (qrh * _LOG2E).astype(cd).reshape(win, b, win, heads, win)
    qrh = qrh.transpose(1, 3, 0, 2, 4).reshape(b, heads, s, win)
    qrw = jax.lax.dot_general(
        q5.transpose(2, 0, 1, 3, 4).reshape(win, b * win * heads, hd),
        rel_w.transpose(0, 2, 1).astype(cd),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                   # [win, bwh, win]
    qrw = (qrw * _LOG2E).astype(cd).reshape(win, b, win, heads, win)
    qrw = qrw.transpose(1, 3, 2, 0, 4).reshape(b, heads, s, win)
    qrh = jnp.pad(qrh, ((0, 0),) * 3 + ((0, kpad - win),))
    qrw = jnp.pad(qrw, ((0, 0),) * 3 + ((0, kpad - win),))
    kh = jnp.arange(s) // win
    kw = jnp.arange(s) % win
    eh = (jnp.arange(kpad)[:, None] == kh[None, :]).astype(cd)
    ew = (jnp.arange(kpad)[:, None] == kw[None, :]).astype(cd)
    kernel = functools.partial(_window_v3_kernel, scale=scale, heads=heads,
                               win=win, bias_mode=bias_mode)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, heads, s, kpad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, heads, s, kpad), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((kpad, s), lambda i: (0, 0)),
            pl.BlockSpec((kpad, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(qkv, qrh, qrw, eh, ew)


def attention(q, k, v, *, causal: bool = False,
              kv_len: Optional[jax.Array] = None,
              bias: Optional[jax.Array] = None,
              scale: Optional[float] = None,
              force_reference: bool = False,
              interpret: bool = False) -> jax.Array:
    """Fused multi-head attention. See module docstring for semantics."""
    # flash wins only once the kv sequence amortizes its tiling: measured
    # on v5e, XLA is 2x faster at S=257 (CLIP) while flash is 2x faster at
    # S=4096 (SAM global) — benchmarks/clip_decode_micro.py + attn_micro.py
    use_pallas = (not force_reference and bias is None
                  and (interpret or jax.default_backend() == "tpu")
                  and k.shape[2] >= (128 if interpret else 1024)
                  # causal chunked-prefill (sq != sk) keeps offsets through
                  # padding only in the reference path
                  and (not causal or q.shape[2] == k.shape[2]))
    if not use_pallas:
        return attention_reference(q, k, v, causal=causal, kv_len=kv_len,
                                   bias=bias, scale=scale)
    return flash_attention(q, k, v, causal=causal, kv_len=kv_len,
                           scale=scale, interpret=interpret)


def decode_attention(q, k_cache, v_cache, cache_len, *, scale=None):
    """Single-token KV-cache attention for autoregressive decode.

    q [B, Hq, 1, D]; caches [B, Hkv, Smax, D]; cache_len [B] = filled length
    (the new token's k/v already written). Bandwidth-bound over the cache;
    plain XLA reaches speed-of-light here, no Pallas needed.
    """
    return attention_reference(q, k_cache, v_cache, kv_len=cache_len,
                               scale=scale)
