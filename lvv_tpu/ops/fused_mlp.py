"""Fused pre-LN transformer MLP: out = x + act(LN(x) @ W1 + b1) @ W2 + b2.

Why a kernel: on v5e the XLA path for one SAM-B block spends ~2x the matmul
floor on this half of the block (benchmarks/sam_block_bisect.json: two
LayerNorms cost ~2 ms against a ~0.2 ms HBM roofline, plus the [N, H]
intermediate round-trips HBM twice). Fusing LN + both matmuls + gelu +
residual into one pallas_call reads x once and writes out once; the
intermediate activation lives only in VMEM.

Grid: (token_tiles, h_chunks) with the h dimension sequential. Weights are
streamed per h-chunk so large MLPs (CLIP-L: 1024x4096, 16.8 MB of bf16
weights) never exceed the ~16 MB VMEM budget; small ones (SAM-B: 768x3072)
use a single chunk that stays resident across token tiles.

Differentiability: pallas_call has no autodiff rule, so `ln_mlp_residual`
carries a custom VJP whose backward recomputes the forward intermediates
with plain XLA ops (rematerialized — nothing but x and params is saved).
This keeps the op usable under jax.grad (CLIP LoRA folds its low-rank
delta into the effective weight OUTSIDE this op, so gradients reach the
adapter through the fold).

Reference behavior being fused: the ln2/mlp tail of every ViT block in
src/deepencoder/sam_vary_sdpa.py:205-237 and clip_sdpa.py:236-270.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128

_ACTS = {
    "gelu": jax.nn.gelu,                      # tanh approximation (flax default)
    "gelu_exact": functools.partial(jax.nn.gelu, approximate=False),
    # every constant dtype-matched: Mosaic rejects f32 scalar broadcasts
    # into bf16 vectors, and jax.nn.sigmoid's lowering introduces one
    "quick_gelu": lambda x: x / (jnp.asarray(1, x.dtype)
                                 + jnp.exp(jnp.asarray(-1.702, x.dtype)
                                           * x)),
    "relu": jax.nn.relu,
}


def _ln_f32(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            acc_ref, *, eps: float, act: str, out_dtype):
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)

    @pl.when(hi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    y = _ln_f32(x_ref[...], ls_ref[...].astype(jnp.float32),
                lb_ref[...].astype(jnp.float32), eps)
    z = jax.lax.dot_general(
        y.astype(x_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    # activation in the storage dtype: the VPU transcendentals otherwise
    # serialize with the MXU dots and dominate the tile time
    h = _ACTS[act](z.astype(x_ref.dtype))
    acc_ref[...] += jax.lax.dot_general(
        h.astype(w2_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(hi == n_h - 1)
    def _finalize():
        o_ref[...] = (x_ref[...].astype(jnp.float32) + acc_ref[...]
                      + b2_ref[...].astype(jnp.float32)).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "block_h", "interpret"))
def _fused_fwd(x, ls, lb, w1, b1, w2, b2, *, eps: float, act: str,
               block_t: int, block_h: int, interpret: bool):
    n, c = x.shape
    h = w1.shape[1]
    grid = (n // block_t, h // block_h)
    kernel = functools.partial(_kernel, eps=eps, act=act, out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # CLIP-L (1024x4096) peaks ~19-24 MB of scoped VMEM with the
            # weight chunks + fp32 intermediates; the default 16 MB scope is
            # far below the physical VMEM
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x, ls[None], lb[None], w1, b1[None], w2, b2[None])


def _quant_rows(y):
    """In-kernel per-row symmetric int8 quantization (f32 in)."""
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0,
                    1e-8)
    q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return q, s


def _kernel_q8(x_ref, ls_ref, lb_ref, w1_ref, s1_ref, b1_ref, w2_ref,
               s2_ref, b2_ref, o_ref, acc_ref, *, eps: float, act: str,
               out_dtype):
    """W8A8 variant of _kernel: weights arrive pre-quantized int8 (+ per-col
    scales), activations are quantized per token row in VMEM.  The int8 MXU
    path doubles dot throughput on v5e (benchmarks/int8_sam_micro.json);
    because everything stays in VMEM there is no extra HBM traffic vs the
    bf16 kernel — the weight stream actually halves."""
    hi = pl.program_id(1)
    n_h = pl.num_programs(1)

    @pl.when(hi == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    y = _ln_f32(x_ref[...], ls_ref[...].astype(jnp.float32),
                lb_ref[...].astype(jnp.float32), eps)
    y8, sy = _quant_rows(y)
    z = jax.lax.dot_general(y8, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = (z.astype(jnp.float32) * sy * s1_ref[...].astype(jnp.float32)
         + b1_ref[...].astype(jnp.float32))
    h = _ACTS[act](z.astype(out_dtype)).astype(jnp.float32)
    h8, sh = _quant_rows(h)
    z2 = jax.lax.dot_general(h8, w2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    acc_ref[...] += (z2.astype(jnp.float32) * sh
                     * s2_ref[...].astype(jnp.float32))

    @pl.when(hi == n_h - 1)
    def _finalize():
        o_ref[...] = (x_ref[...].astype(jnp.float32) + acc_ref[...]
                      + b2_ref[...].astype(jnp.float32)).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("eps", "act", "block_t",
                                             "block_h", "interpret"))
def _fused_fwd_q8(x, ls, lb, w1q, s1, b1, w2q, s2, b2, *, eps: float,
                  act: str, block_t: int, block_h: int, interpret: bool):
    n, c = x.shape
    h = w1q.shape[1]
    grid = (n // block_t, h // block_h)
    kernel = functools.partial(_kernel_q8, eps=eps, act=act,
                               out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j)),
            pl.BlockSpec((block_h, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(x, ls[None], lb[None], w1q, s1[None], b1[None], w2q, s2[None],
      b2[None])


# ----------------------------------------------------------------------------
# Fast standalone LayerNorm / RMSNorm.
#
# Measured on v5e (benchmarks/mlp_micro.json, sam_block_bisect.json): XLA
# spends ~1 ms per LayerNorm over the SAM token tensor (29k x 768 bf16)
# against a ~0.11 ms HBM roofline — the fp32 upcast materializes in HBM. A
# one-pass VMEM-resident kernel removes that. Used by models.layers
# LayerNorm/RMSNorm on TPU for every norm in the stack.
# ----------------------------------------------------------------------------

def _ln_only_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    o_ref[...] = _ln_f32(x_ref[...], s_ref[...].astype(jnp.float32),
                         b_ref[...].astype(jnp.float32),
                         eps).astype(o_ref.dtype)


def _rms_only_kernel(x_ref, s_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    o_ref[...] = (y * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "rms", "block_t",
                                             "interpret"))
def _norm_fwd(x, s, b, *, eps: float, rms: bool, block_t: int,
              interpret: bool):
    n, c = x.shape
    if rms:
        kernel = functools.partial(_rms_only_kernel, eps=eps)
        ins = (x, s[None])
        in_specs = [pl.BlockSpec((block_t, c), lambda i: (i, 0)),
                    pl.BlockSpec((1, c), lambda i: (0, 0))]
    else:
        kernel = functools.partial(_ln_only_kernel, eps=eps)
        ins = (x, s[None], b[None])
        in_specs = [pl.BlockSpec((block_t, c), lambda i: (i, 0)),
                    pl.BlockSpec((1, c), lambda i: (0, 0)),
                    pl.BlockSpec((1, c), lambda i: (0, 0))]
    return pl.pallas_call(
        kernel,
        grid=(n // block_t,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_t, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*ins)


def _norm_xla(x, s, b, eps, rms):
    xf = x.astype(jnp.float32)
    if rms:
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                               + eps)
        return (y * s.astype(jnp.float32)).astype(x.dtype)
    return _ln_f32(xf, s.astype(jnp.float32), b.astype(jnp.float32),
                   eps).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _norm_op(x, s, b, eps, rms, block_t, interpret):
    return _norm_fwd(x, s, b, eps=eps, rms=rms, block_t=block_t,
                     interpret=interpret)


def _norm_vjp_fwd(x, s, b, eps, rms, block_t, interpret):
    return _norm_op(x, s, b, eps, rms, block_t, interpret), (x, s, b)


def _norm_vjp_bwd(eps, rms, block_t, interpret, res, g):
    x, s, b = res
    _, pullback = jax.vjp(lambda x, s, b: _norm_xla(x, s, b, eps, rms),
                          x, s, b)
    return pullback(g)


_norm_op.defvjp(_norm_vjp_fwd, _norm_vjp_bwd)


def norm_fast(x, scale, bias=None, *, eps: float = 1e-6, rms: bool = False,
              block_t: int = 512, interpret: bool = False) -> jax.Array:
    """LayerNorm (or RMSNorm when rms=True) with fp32 internals, one pass
    through VMEM. Any leading shape; falls back to XLA off-TPU or for
    non-lane-aligned feature dims."""
    c = x.shape[-1]
    interpret = interpret or _FORCE_INTERPRET
    if bias is None:
        bias = jnp.zeros((c,), jnp.float32)
    if not kernel_ok(c, c, interpret):
        return _norm_xla(x, scale, bias, eps, rms)
    lead = x.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    x2 = x.reshape(n, c)
    block_t = min(block_t, _pad_to(n, 8))
    n_p = _pad_to(n, block_t)
    if n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    out = _norm_op(x2, scale, bias, eps, rms, block_t, interpret)
    return out[:n].reshape(*lead, c)


def _xla_forward(x, ls, lb, w1, b1, w2, b2, eps, act):
    y = _ln_f32(x, ls.astype(jnp.float32), lb.astype(jnp.float32), eps)
    y = y.astype(x.dtype)
    z = (jnp.dot(y, w1, preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32))
    h = _ACTS[act](z).astype(x.dtype)
    return (x.astype(jnp.float32)
            + jnp.dot(h, w2, preferred_element_type=jnp.float32)
            + b2.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _ln_mlp_residual(x, ls, lb, w1, b1, w2, b2, eps, act, block_t, block_h,
                     interpret):
    return _fused_fwd(x, ls, lb, w1, b1, w2, b2, eps=eps, act=act,
                      block_t=block_t, block_h=block_h, interpret=interpret)


def _vjp_fwd(x, ls, lb, w1, b1, w2, b2, eps, act, block_t, block_h,
             interpret):
    out = _ln_mlp_residual(x, ls, lb, w1, b1, w2, b2, eps, act, block_t,
                           block_h, interpret)
    return out, (x, ls, lb, w1, b1, w2, b2)


def _vjp_bwd(eps, act, block_t, block_h, interpret, res, g):
    # Recompute-everything backward in plain XLA (memory-lean, matches the
    # jax.checkpoint philosophy used for the big towers).
    x, ls, lb, w1, b1, w2, b2 = res

    def fwd(x, ls, lb, w1, b1, w2, b2):
        return _xla_forward(x, ls, lb, w1, b1, w2, b2, eps, act)

    _, pullback = jax.vjp(fwd, x, ls, lb, w1, b1, w2, b2)
    return pullback(g)


_ln_mlp_residual.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _ln_mlp_residual_q8(x, ls, lb, w1, b1, w2, b2, eps, act, block_t,
                        block_h, interpret):
    # weight quantization (per output channel) happens here, outside the
    # kernel: max-abs + round over [C, H] is ~0.1% of the matmul cost
    from .quant import quantize_weight
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    return _fused_fwd_q8(x, ls, lb, w1q, s1, b1, w2q, s2, b2, eps=eps,
                         act=act, block_t=block_t, block_h=block_h,
                         interpret=interpret)


def _q8_vjp_fwd(x, ls, lb, w1, b1, w2, b2, eps, act, block_t, block_h,
                interpret):
    out = _ln_mlp_residual_q8(x, ls, lb, w1, b1, w2, b2, eps, act, block_t,
                              block_h, interpret)
    return out, (x, ls, lb, w1, b1, w2, b2)


# straight-through backward: gradients flow as if the op were the float
# forward (the quant path is only enabled on the FROZEN SAM trunk, where
# stop_gradient prunes the backward anyway — this keeps jax.grad legal)
_ln_mlp_residual_q8.defvjp(_q8_vjp_fwd, _vjp_bwd)


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


# CPU tests flip this to exercise the kernel path through the model modules
# (pallas interpret mode runs the TPU kernel semantics exactly).
_FORCE_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = value


def kernel_ok(c: int, hidden: int, interpret: bool = False) -> bool:
    """The fused path needs lane-aligned feature dims and a TPU backend
    (or interpret mode for CPU oracle tests)."""
    return ((interpret or _FORCE_INTERPRET
             or jax.default_backend() == "tpu")
            and c % _LANE == 0 and hidden % _LANE == 0)


def ln_mlp_residual(x, ls, lb, w1, b1, w2, b2, *, eps: float = 1e-6,
                    act: str = "gelu", block_t: int = 256,
                    block_h: Optional[int] = None,
                    quant8: bool = False,
                    interpret: bool = False) -> jax.Array:
    """x [..., C] -> x + act(LN(x) @ w1 + b1) @ w2 + b2, fused on TPU.

    Any leading shape; token count is padded to a tile multiple inside
    (padded rows see LN of zeros — finite — and are sliced off). Falls back
    to the XLA expression off-TPU or for non-lane-aligned dims.
    """
    c = x.shape[-1]
    h = w1.shape[1]
    interpret = interpret or _FORCE_INTERPRET
    if b1 is None:
        b1 = jnp.zeros((h,), x.dtype)
    if b2 is None:
        b2 = jnp.zeros((c,), x.dtype)
    if not kernel_ok(c, h, interpret):
        return _xla_forward(x, ls, lb, w1, b1, w2, b2, eps, act)
    lead = x.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    x2 = x.reshape(n, c)
    if block_h is None:
        # keep streamed weights under ~10 MB of VMEM (w1 + w2 chunks)
        block_h = h
        while 2 * c * block_h * x.dtype.itemsize > 10 * 2 ** 20:
            block_h //= 2
        block_h = max(_pad_to(block_h, _LANE), _LANE)
    while h % block_h:
        block_h //= 2
    block_t = min(block_t, _pad_to(n, 8))
    n_p = _pad_to(n, block_t)
    if n_p != n:
        x2 = jnp.pad(x2, ((0, n_p - n), (0, 0)))
    op = _ln_mlp_residual_q8 if quant8 else _ln_mlp_residual
    out = op(x2, ls, lb, w1, b1, w2, b2, eps, act, block_t, block_h,
             interpret)
    return out[:n].reshape(*lead, c)
