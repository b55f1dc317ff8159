#!/usr/bin/env python
"""Attention/matmul microbenchmarks at the SAM product shapes.

Finds the machine ceiling through this stack and compares attention
implementations so kernel work targets the real gap:
  - pure bf16 matmuls at SAM dense shapes (achievable TFLOPS);
  - global attention [6,12,4096,64]: pallas flash vs in-kernel rel-pos
    flash vs XLA reference (w/ and w/o materialized decomposed bias);
  - windowed attention [150,12,196,64]: XLA reference w/ bias vs pallas
    flash on 256-padded tokens (bias folded as q_rh/q_rw rows).
Methodology: scalar outputs + K-times lax.fori_loop per jit (see
sam_breakdown2.py); per-op ms = total/K after 2 warmups.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/attn_micro.json")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    outp = pathlib.Path(args.out)
    results = {}

    import jax
    import jax.numpy as jnp
    from jax import lax
    from lvv_tpu.ops.attention import (attention_reference, flash_attention,
                                       flash_attention_relpos)

    def timed(fn, *xs, iters=args.iters, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def record(name, secs, flops=None):
        ms = secs / K * 1e3
        results[name] = {"ms": round(ms, 3)}
        if flops:
            results[name]["tflops"] = round(flops / (ms / 1e3) / 1e12, 1)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]}", flush=True)

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    def loopk(f, x):
        def body(_, h):
            return f(h)
        return jnp.sum(lax.fori_loop(0, K, body, x).astype(jnp.float32))

    # ---- dense ceilings
    for name, (m, k_, n) in [("mm_24576x768x768", (24576, 768, 768)),
                             ("mm_24576x768x3072", (24576, 768, 3072))]:
        a = jnp.asarray(rng.normal(size=(m, k_)), bf)
        w = jnp.asarray(rng.normal(size=(k_, n)), bf)
        wn = jnp.asarray(rng.normal(size=(n, k_)), bf)

        def f(x, w=w, wn=wn):
            return (x @ w) @ wn  # square the shape so the loop composes

        g = jax.jit(lambda x: loopk(f, x))
        record(name + "_x2", timed(g, a), flops=2 * 2 * m * k_ * n)

    # ---- global attention variants [6, 12, 4096, 64]
    b, h, s, d = 6, 12, 4096, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    kk = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), bf)
    q_rh = jnp.asarray(rng.normal(size=(b, h, s, 64)), bf)
    q_rw = jnp.asarray(rng.normal(size=(b, h, s, 64)), bf)
    attn_flops = 4 * s * s * d * h * b

    gf = jax.jit(lambda x: loopk(lambda t: flash_attention(t, kk, v), x))
    record("glob_flash", timed(gf, q), flops=attn_flops)

    gr = jax.jit(lambda x: loopk(
        lambda t: flash_attention_relpos(t, kk, v, q_rh, q_rw,
                                         scale=0.125, grid_w=64), x))
    record("glob_flash_relpos", timed(gr, q), flops=attn_flops)

    gx = jax.jit(lambda x: loopk(
        lambda t: attention_reference(t, kk, v), x))
    record("glob_xla_ref", timed(gx, q), flops=attn_flops)

    # ---- windowed attention variants [150, 12, 196, 64]
    bw, sw = 150, 196
    qw = jnp.asarray(rng.normal(size=(bw, h, sw, d)), bf)
    kw = jnp.asarray(rng.normal(size=(bw, h, sw, d)), bf)
    vw = jnp.asarray(rng.normal(size=(bw, h, sw, d)), bf)
    bias = jnp.asarray(rng.normal(size=(bw, h, sw, sw)), bf)
    wf = 4 * sw * sw * d * h * bw

    wx = jax.jit(lambda x: loopk(
        lambda t: attention_reference(t, kw, vw, bias=bias), x))
    record("win_xla_bias", timed(wx, qw), flops=wf)

    wn_ = jax.jit(lambda x: loopk(
        lambda t: attention_reference(t, kw, vw), x))
    record("win_xla_nobias", timed(wn_, qw), flops=wf)

    # padded flash: 196 -> 256 tokens with kv_len mask
    pad = 256 - sw
    qp = jnp.pad(qw, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(kw, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(vw, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kvl = jnp.full((bw,), sw, jnp.int32)
    wp = jax.jit(lambda x: loopk(
        lambda t: flash_attention(t, kp, vp, kv_len=kvl), x))
    record("win_flash_pad256", timed(wp, qp), flops=wf)

    # in-kernel rel-pos on padded windows (grid 14x14 -> rows/cols 14)
    qrh = jnp.asarray(rng.normal(size=(bw, h, 256, 14)), bf)
    qrw = jnp.asarray(rng.normal(size=(bw, h, 256, 14)), bf)
    try:
        wr = jax.jit(lambda x: loopk(
            lambda t: flash_attention_relpos(t, kp, vp, qrh, qrw,
                                             scale=0.125, grid_w=14), x))
        record("win_flash_relpos_pad256", timed(wr, qp), flops=wf)
    except Exception as e:  # noqa: BLE001
        results["win_flash_relpos_pad256_error"] = repr(e)[:300]
        outp.write_text(json.dumps(results, indent=1))
        print("win relpos kernel failed:", repr(e)[:160], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
