"""int8 weight quantization + dequantizing matmul kernel.

The KV-cached decode path streams the LLM's weight matrices from HBM
every step. XLA cannot exploit int8 storage — it materializes the
int8->bf16 convert instead of fusing it into the dot (measured,
benchmarks/int8_micro.py) — so this Pallas kernel loads int8 tiles into
VMEM and dequantizes in-register, halving weight HBM traffic.

Measured caveat (benchmarks/quant_micro.py on v5e): at Qwen-0.5B decode
shapes the win is only ~10% (81 vs 90 us on the MLP pair, parity on
qkv) — single-row matvecs sit on a per-op latency floor ~4x above the
bandwidth roofline, so halving bytes barely moves the needle. The kernel
pays off for LARGER quantized matmuls (serving batches, bigger models);
LLM decode integration is deliberately not wired until it would.

Layout: per-output-channel symmetric quantization
  w_q[k, n] = round(w[k, n] / scale[n]),  scale[n] = max_k |w[k, n]| / 127
matmul: out[m, n] = (x @ w_q)[m, n] * scale[n]  (+ bias).

The kernel tiles N (and K when K exceeds VMEM); M is the tiny decode
batch, padded to the 8-row sublane. CPU/interpret fall back to the plain
dequantized einsum (same math) so tests run everywhere.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[K, N] float -> (int8 [K, N], scale [N] f32)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., K] float -> (int8 [..., K], per-row scale [..., 1] f32).

    Dynamic symmetric activation quantization: one scale per token row.
    Per-row (not per-tensor) keeps the quantization error of outlier-free
    rows independent of outlier rows — measured <0.4% rel error on SAM
    activations vs ~2% per-tensor.
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _pick_block(dim: int, target: int) -> int:
    """Largest multiple-of-128 divisor of `dim` that is <= max(target, 128);
    0 when none exists (caller must pad).

    Block sizes that do NOT divide the weight dims force a jnp.pad of the
    whole int8 weight EVERY call — a full HBM copy that costs more than the
    int8 streaming saves (this, not physics, is why r2 measured weight-only
    int8 decode as a loss: Qwen dims 896/4864/151936 vs 512/1024/2048
    blocks). All Qwen-0.5B projection dims are multiples of 128, so a
    divisor block always exists for the LLM tree."""
    best = 0
    top = min(dim, max(target, 128))
    for b in range(128, top + 1, 128):
        if dim % b == 0:
            best = b
    return best


def _qmv_nk_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    """Dequantizing matvec with the weight stored [N, K] (no transpose in
    HBM — the tied-embedding unembed contracts the [V, H] table over H)."""
    x = x_ref[...]                                   # [M, bk]... K resident
    w = w_ref[...].astype(jnp.bfloat16)              # [bn, K]
    s = s_ref[...].astype(jnp.float32)               # [1, bn]
    acc = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _qmv_nk_tpu(x, wq, sw, *, block_n: int, interpret: bool):
    m, k = x.shape
    n = wq.shape[0]
    return pl.pallas_call(
        functools.partial(_qmv_nk_kernel, out_dtype=x.dtype),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0)),
            pl.BlockSpec((block_n, k), lambda j: (j, 0)),
            pl.BlockSpec((1, block_n), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x, wq, sw[None])


def quantized_matmul_nk(x: jax.Array, wq: jax.Array, scale: jax.Array,
                        block_n: int = 2048,
                        interpret: bool = False) -> jax.Array:
    """x [..., K] @ dequant(wq [N, K], scale [N]).T -> [..., N].

    The weight never transposes in HBM; per-row (= per output) scales.
    Serves the tied-embedding unembed: [V, H] int8 streamed at half the
    bf16 bytes every decode step."""
    from . import fused_mlp as _fm
    lead, k = x.shape[:-1], x.shape[-1]
    n = wq.shape[0]
    m = 1
    for d_ in lead:
        m *= d_
    x2 = x.reshape(m, k)
    use_pallas = ((interpret or _fm._FORCE_INTERPRET
                   or jax.default_backend() == "tpu")
                  and k % 128 == 0)
    if not use_pallas:
        out = jnp.einsum("mk,nk->mn", x2.astype(jnp.float32),
                         wq.astype(jnp.float32)) * scale[None, :]
        return out.astype(x.dtype).reshape(*lead, n)
    m_p = max(8, -(-m // 8) * 8)
    bn = _pick_block(n, block_n) or min(block_n, n)
    n_p = -(-n // bn) * bn
    xp = jnp.pad(x2.astype(jnp.bfloat16), ((0, m_p - m), (0, 0)))
    # n_p == n whenever a divisor block exists (always for the Qwen
    # unembed: 151936 = 1187*128) — no per-call weight copy
    wp = wq if n_p == n else jnp.pad(wq, ((0, n_p - n), (0, 0)))
    sp = (scale.astype(jnp.float32) if n_p == n
          else jnp.pad(scale.astype(jnp.float32), (0, n_p - n)))
    out = _qmv_nk_tpu(xp, wp, sp, block_n=bn,
                      interpret=interpret or _fm._FORCE_INTERPRET)
    return out[:m, :n].astype(x.dtype).reshape(*lead, n)


def quantize_llm_params(llm_params: dict) -> dict:
    """Weight-only int8 serving transform for the Qwen tree.

    Replaces every attention/MLP projection kernel with {"q": int8 [K, N],
    "s": f32 [N]} (consumed by models.layers.Dense's dict-kernel branch)
    and adds an "unembed_q" copy of the tied embedding table ({"q": int8
    [V, H], "s": f32 [V]}) for the decode unembed. Decode streams half the
    weight bytes — it is HBM-bandwidth-bound (ROUND_NOTES: 1.25 ms/step ~=
    the bf16 streaming roofline). Biases, norms, LoRA, and the float
    embedding (still needed for the prefill gather) are untouched.
    """
    def maybe_quant(name, sub):
        if (name.endswith("_proj") and hasattr(sub, "keys")
                and "kernel" in sub and not isinstance(sub["kernel"], dict)):
            q, s = quantize_weight(sub["kernel"])
            return {**dict(sub), "kernel": {"q": q, "s": s}}
        return sub

    out = {}
    for lname, layer in dict(llm_params).items():
        if lname.startswith("layer_"):
            layer = dict(layer)
            for block in ("attn", "mlp"):
                if block in layer:
                    layer[block] = {name: maybe_quant(name, sub)
                                    for name, sub in
                                    dict(layer[block]).items()}
        out[lname] = layer
    if "embed_tokens" in out and "embedding" in dict(out["embed_tokens"]):
        emb = jnp.asarray(dict(out["embed_tokens"])["embedding"])  # [V, H]
        sc = jnp.maximum(jnp.max(jnp.abs(emb.astype(jnp.float32)),
                                 axis=1) / 127.0, 1e-8)            # [V]
        q = jnp.clip(jnp.round(emb.astype(jnp.float32) / sc[:, None]),
                     -127, 127).astype(jnp.int8)
        out["unembed_q"] = {"q": q, "s": sc}
    return out


def _w8a8_kernel(x_ref, w_ref, sw_ref, b_ref, o_ref, *, out_dtype):
    """One (m-tile, n-tile) program: quantize x rows in VMEM, int8 MXU dot,
    dequant + bias in VMEM — the int32/f32 intermediates never touch HBM
    (the XLA int8_dot materializes them: measured a net LOSS e2e)."""
    x = x_ref[...].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    z = jax.lax.dot_general(x8, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    out = (z.astype(jnp.float32) * sx * sw_ref[...].astype(jnp.float32)
           + b_ref[...].astype(jnp.float32))
    o_ref[...] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "interpret"))
def _w8a8_tpu(x, wq, sw, bias, *, block_m: int, block_n: int,
              interpret: bool):
    m, k = x.shape
    n = wq.shape[1]
    return pl.pallas_call(
        functools.partial(_w8a8_kernel, out_dtype=x.dtype),
        grid=(m // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x, wq, sw[None], bias[None])


def w8a8_matmul(x: jax.Array, w: jax.Array,
                bias: Optional[jax.Array] = None,
                block_m: int = 512, block_n: int = 768,
                interpret: bool = False) -> jax.Array:
    """Fused W8A8 matmul: x [..., K] @ w [K, N] (+bias) with both-operand
    int8 quantization entirely in VMEM (Pallas on TPU; plain-XLA int8_dot
    elsewhere). K must fit a VMEM-resident weight stripe (true for every
    SAM/CLIP projection)."""
    from . import fused_mlp as _fm
    lead, k = x.shape[:-1], x.shape[-1]
    n = w.shape[1]
    use_pallas = (interpret or _fm._FORCE_INTERPRET
                  or jax.default_backend() == "tpu")
    if not use_pallas or k % 128 or n % 128:
        return int8_dot(x, w, bias)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    wq, sw = quantize_weight(w)
    m = 1
    for d_ in lead:
        m *= d_
    x2 = x.reshape(m, k)
    bm = min(block_m, max(8, -(-m // 8) * 8))
    bn = min(block_n, n)
    while n % bn:
        bn //= 2
    m_p = -(-m // bm) * bm
    if m_p != m:
        x2 = jnp.pad(x2, ((0, m_p - m), (0, 0)))
    out = _w8a8_tpu(x2, wq, sw, bias, block_m=bm, block_n=bn,
                    interpret=interpret or _fm._FORCE_INTERPRET)
    return out[:m].reshape(*lead, n)


def int8_dot(x: jax.Array, w: jax.Array,
             bias: Optional[jax.Array] = None,
             out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """W8A8 matmul: both operands dynamically int8-quantized, int32 MXU
    accumulation, f32 rescale.  x [..., K] @ w [K, N] -> [..., N].

    On v5e the int8 MXU path runs ~2x bf16 TOPS at SAM projection shapes
    (benchmarks/int8_sam_micro.json: 368-376 int8 TOPS vs 190 bf16
    TFLOPS).  out[m, n] = (xq @ wq)[m, n] * sx[m] * sw[n] (+ bias).
    Weight quantization happens per call — max-abs + round over the [K, N]
    kernel is ~0.1% of the matmul cost and keeps checkpoints/params in
    their normal float layout (no tree surgery).
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    xq, sx = quantize_rows(x.reshape(-1, k))
    wq, sw = quantize_weight(w)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * sw[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype).reshape(*lead, w.shape[1])


def _qmv_kernel(x_ref, w_ref, s_ref, o_ref, *, out_dtype):
    x = x_ref[...]                                  # [bm, bk]
    w = w_ref[...].astype(jnp.bfloat16)             # [bk, bn] (dequant in
    s = s_ref[0].astype(jnp.float32)                # registers); s [1, bn]
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += (acc * s[None, :]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "block_k", "interpret"))
def quantized_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                     bias: Optional[jax.Array] = None,
                     block_m: int = 512, block_n: int = 512,
                     block_k: int = 1024,
                     interpret: bool = False) -> jax.Array:
    """x [M, K] (bf16/f32) @ int8 w_q [K, N] * scale [N] -> [M, N].

    Pallas on TPU (int8 tiles stream from HBM, dequant in-register);
    reference einsum elsewhere. M is tiled too — decode calls come in with
    M<=8, prefill with thousands of token rows (an unblocked M stacked a
    50 MB VMEM tile at the Qwen down_proj: found the hard way).
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and scale.shape == (n,)
    use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas:
        out = (x.astype(jnp.float32)
               @ (w_q.astype(jnp.float32) * scale[None, :]))
        out = out.astype(x.dtype)
        return out + bias if bias is not None else out

    # pad M to the 8-row sublane; pick K/N blocks that DIVIDE the weight
    # dims so the int8 weight itself never pads (a per-call jnp.pad is a
    # full HBM copy — it made int8 decode a net loss in r2)
    bm = min(block_m, max(8, -(-m // 8) * 8))
    m_p = -(-m // bm) * bm
    bk = _pick_block(k, block_k) or min(block_k, k)
    bn = _pick_block(n, block_n) or min(block_n, n)
    k_p = -(-k // bk) * bk
    n_p = -(-n // bn) * bn
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, m_p - m), (0, k_p - k)))
    wp = (w_q if (k_p, n_p) == (k, n)
          else jnp.pad(w_q, ((0, k_p - k), (0, n_p - n))))
    # 2-D scale: 1-D operands hit XLA/Mosaic layout-tiling mismatches
    sp = (scale.astype(jnp.float32) if n_p == n
          else jnp.pad(scale.astype(jnp.float32), (0, n_p - n)))[None]

    out = pl.pallas_call(
        functools.partial(_qmv_kernel, out_dtype=x.dtype),
        grid=(m_p // bm, n_p // bn, k_p // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, j, i: (mi, i)),
            pl.BlockSpec((bk, bn), lambda mi, j, i: (i, j)),
            pl.BlockSpec((1, bn), lambda mi, j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, j, i: (mi, j)),
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(xp, wp, sp)
    out = out[:m, :n].astype(x.dtype)
    return out + bias if bias is not None else out
