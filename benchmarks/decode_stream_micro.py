#!/usr/bin/env python
"""Decode weight-streaming A/B at the real Qwen-0.5B layout.

decode32 is HBM-bound (~1 GB of bf16 weights per token). Weight-only int8
halves the bytes but the pallas qmv path measured SLOWER e2e (64.7 vs
51.0 ms / 32 tokens, benchmarks/batch_stage_bisect.json) even after the
per-call jnp.pad weight copies were removed — so this isolates the
streaming loop itself: a lax.scan over 24 layers of stacked weights
(exactly how models/qwen.py decodes) plus the tied unembed, with the
weights passed as ARGUMENTS (inlined-constant weights both skew timing
and blow the axon remote-compile request limit).

Variants per token step:
  bf16      x@W in bf16 (XLA)                      — the serving default
  q8_pallas ops.quant.quantized_matmul (+_nk unembed)
  q8_xla    x @ wq.astype(bf16) * s — tests whether XLA fuses the convert
            into the dot's operand stream (half the HBM bytes, no pallas)
  q8_unemb  bf16 layers + int8 unembed only (one big pallas call/token)

Writes benchmarks/decode_stream_micro.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 16          # tokens per measurement rep
B = int(__import__("os").environ.get("LVV_BENCH_B", "1"))
L, H, QKV, FF, V = 24, 896, 1152, 4864, 151936


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.ops.quant import (quantize_weight, quantized_matmul,
                                   quantized_matmul_nk)

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "decode_stream_micro.json"

    _keys = iter(jax.random.split(jax.random.PRNGKey(0), 16))

    def mk(*shape):
        # generated ON DEVICE: ~1 GB of host->device weight uploads through
        # the axon tunnel (~40 MB/s) would dwarf the measurement setup
        return (jax.random.normal(next(_keys), shape, jnp.float32) * 0.02
                ).astype(jnp.bfloat16)

    ws = dict(wqkv=mk(L, H, QKV), wo=mk(L, H, H), wup=mk(L, H, FF),
              wgate=mk(L, H, FF), wdown=mk(L, FF, H))
    unemb = mk(V, H)            # [V, H] tied-table layout
    x0 = mk(B, H)

    def qw(w):
        q, s = quantize_weight(w)
        return q, s

    wq = {k: jax.jit(jax.vmap(qw))(v) for k, v in ws.items()}
    uq = jax.jit(lambda t: quantize_weight(t.T))(unemb)  # [H, V] -> q,s[V]
    uq_nk = (jax.jit(lambda t: quantize_weight(t.T)[0].T)(unemb),
             jax.jit(lambda t: quantize_weight(t.T)[1])(unemb))

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def loop(step):
        """K sequential token-steps; carry feeds back so nothing hoists."""
        def f(x, *args):
            return lax.fori_loop(
                0, K, lambda _, h: step(h, *args), x)
        return jax.jit(lambda *xs: jnp.sum(f(*xs).astype(jnp.float32)))

    def rec(name, secs, floor):
        results[name] = round((secs - floor) / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms/token", flush=True)

    floor = timed(loop(lambda h: h), x0)
    results["floor_ms_per_rep"] = round(floor / K * 1e3, 3)

    def step_bf16(x, w, u):
        def layer(xc, lw):
            a = xc @ lw["wqkv"]
            xc = xc + a[:, :H] @ lw["wo"] * jnp.bfloat16(1e-3)
            g = xc @ lw["wgate"]
            up = xc @ lw["wup"]
            xc = xc + (g * up) @ lw["wdown"] * jnp.bfloat16(1e-3)
            return xc, ()
        x, _ = lax.scan(layer, x, w)
        logits = x @ u.T
        return x + logits[:, :H] * jnp.bfloat16(1e-6)

    rec("bf16", timed(loop(step_bf16), x0, ws, unemb), floor)

    def qmm(x, q, s):
        return quantized_matmul(x, q, s)

    def step_q8_pallas(x, w, uqk, uqs):
        def layer(xc, lw):
            a = qmm(xc, *lw["wqkv"])
            xc = xc + qmm(a[:, :H], *lw["wo"]) * jnp.bfloat16(1e-3)
            g = qmm(xc, *lw["wgate"])
            up = qmm(xc, *lw["wup"])
            xc = xc + qmm((g * up), *lw["wdown"]) * jnp.bfloat16(1e-3)
            return xc, ()
        x, _ = lax.scan(layer, x, w)
        logits = quantized_matmul_nk(x, uqk, uqs)
        return x + logits[:, :H].astype(x.dtype) * jnp.bfloat16(1e-6)

    rec("q8_pallas", timed(loop(step_q8_pallas), x0, wq, *uq_nk), floor)

    def dq(q, s):
        return q.astype(jnp.bfloat16) * s[None].astype(jnp.bfloat16)

    def step_q8_xla(x, w, uqk, uqs):
        def layer(xc, lw):
            a = xc @ dq(*lw["wqkv"])
            xc = xc + a[:, :H] @ dq(*lw["wo"]) * jnp.bfloat16(1e-3)
            g = xc @ dq(*lw["wgate"])
            up = xc @ dq(*lw["wup"])
            xc = xc + (g * up) @ dq(*lw["wdown"]) * jnp.bfloat16(1e-3)
            return xc, ()
        x, _ = lax.scan(layer, x, w)
        logits = (x @ uqk.astype(jnp.bfloat16)
                  ) * uqs[None].astype(jnp.bfloat16)
        return x + logits[:, :H].astype(x.dtype) * jnp.bfloat16(1e-6)

    rec("q8_xla", timed(loop(step_q8_xla), x0, wq, *uq), floor)

    def step_q8_unemb(x, w, uqk, uqs):
        def layer(xc, lw):
            a = xc @ lw["wqkv"]
            xc = xc + a[:, :H] @ lw["wo"] * jnp.bfloat16(1e-3)
            g = xc @ lw["wgate"]
            up = xc @ lw["wup"]
            xc = xc + (g * up) @ lw["wdown"] * jnp.bfloat16(1e-3)
            return xc, ()
        x, _ = lax.scan(layer, x, w)
        logits = quantized_matmul_nk(x, uqk, uqs)
        return x + logits[:, :H].astype(x.dtype) * jnp.bfloat16(1e-6)

    rec("q8_unemb", timed(loop(step_q8_unemb), x0, ws, *uq_nk), floor)

    # roofline notes
    bytes_bf16 = (sum(np.prod(v.shape) for v in ws.values()) + V * H) * 2
    results["roofline_bf16_ms"] = round(bytes_bf16 / 819e9 * 1e3, 3)
    results["roofline_int8_ms"] = round(bytes_bf16 / 2 / 819e9 * 1e3, 3)
    outp.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
