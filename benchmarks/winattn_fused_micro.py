#!/usr/bin/env python
"""A/B the fused-bias window kernel vs the packed mask-select one at the
SAM windowed-layer shape (6 views x 25 windows, 12 heads, 14x14 tokens,
head_dim 64) — measured AS USED: from the qkv Dense output through the
attention output (the fused variant moves bias prep into XLA einsums, so
a kernel-only timing would misattribute that work).

K-rep fori_loop with explicit tunnel-floor subtraction (BASELINE.md
measurement rule). Writes benchmarks/winattn_fused_micro.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 128


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.ops.attention import (window_attention_fused,
                                       window_attention_fused2,
                                       window_attention_packed)

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "winattn_fused_micro.json"

    WIN, HEADS, HD = 14, 12, 64
    B = 6 * 25
    S = WIN * WIN
    C = HEADS * HD
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * C)), jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def loop(f):
        return jax.jit(lambda *xs: jnp.sum(
            lax.fori_loop(0, K, lambda _, h: f(*xs[:-1], h), xs[-1])
            .astype(jnp.float32)))

    floor = timed(loop(lambda h: h), qkv)
    results["floor_ms_per_rep"] = round(floor / K * 1e3, 3)

    def rec(name, secs):
        results[name] = round((secs - floor) / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    def run_packed(h):
        o = window_attention_packed(h, rel_h, rel_w, scale=scale,
                                    heads=HEADS, win=WIN)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    def run_fused(wchunk):
        def f(h):
            o = window_attention_fused(h, rel_h, rel_w, scale=scale,
                                       heads=HEADS, win=WIN, wchunk=wchunk)
            return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)
        return f

    def run_fused2(h):
        o = window_attention_fused2(h, rel_h, rel_w, scale=scale,
                                    heads=HEADS, win=WIN)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("packed", timed(loop(run_packed), qkv))
    rec("fused2", timed(loop(run_fused2), qkv))
    for wc in (1, 5):
        rec(f"fused_wc{wc}", timed(loop(run_fused(wc)), qkv))

    # pure-XLA batched attention with the bias assembled from the tiny
    # q·Rh / q·Rw tables: 1800 little [196,64] GEMMs become XLA batched
    # dots that pipeline the MXU across the batch — the pallas per-window
    # programs serialize ~1800 head-iterations at ~1.3 us each instead
    def run_xla(h):
        import jax.numpy as jnp
        c = HEADS * HD
        q = h[..., :c].reshape(B, S, HEADS, HD).transpose(0, 2, 1, 3)
        k = h[..., c:2 * c].reshape(B, S, HEADS, HD).transpose(0, 2, 1, 3)
        v = h[..., 2 * c:].reshape(B, S, HEADS, HD).transpose(0, 2, 1, 3)
        qr = q.reshape(B, HEADS, WIN, WIN, HD)
        q_rh = jnp.einsum("bnxyc,xkc->bnxyk", qr, rel_h,
                          preferred_element_type=jnp.float32)
        q_rw = jnp.einsum("bnxyc,ykc->bnxyk", qr, rel_w,
                          preferred_element_type=jnp.float32)
        bias = (q_rh[..., :, None] + q_rw[..., None, :]).reshape(
            B, HEADS, S, S)
        from lvv_tpu.ops.attention import attention_reference
        o = attention_reference(q, k, v, bias=bias, scale=scale)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, c)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("xla_bias", timed(loop(run_xla), qkv))


if __name__ == "__main__":
    main()
