#!/usr/bin/env python
"""Bisect the window-attention kernel cost structure at the SAM shape:
what do the small score dots, the softmax, the bias dots, and the pv dots
each cost inside a per-window pallas program? Grid (150,), 12 heads.

Writes winattn_bisect2.json. Variants:
  dots_qk      12 score dots only, summed to o
  dots_qk_pv   + pv dot (no softmax: p = scores * 1e-3)
  softmax      + softmax between (= packed minus the 4 bias dots)
  bias2        + 2 precomputed-bias expander dots (phased-style bias)
  packed       the shipped kernel (mask-select bias, 6 dots/head)
"""
from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lvv_tpu.ops.attention import window_attention_packed

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "winattn_bisect2.json"

    WIN, HEADS, HD = 14, 12, 64
    B = 6 * 25
    S = WIN * WIN
    C = HEADS * HD
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * C)), jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(WIN, WIN, HD)) * 0.3, jnp.bfloat16)
    qrh = jnp.asarray(rng.normal(size=(B, HEADS, S, 16)) * 0.3, jnp.bfloat16)
    eh = jnp.asarray(rng.normal(size=(16, S)) * 0.1, jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)

    def make(variant):
        def kern(qkv_ref, qrh_ref, qrw_ref, eh_ref, ew_ref, o_ref):
            c = C
            hd = HD
            ehv = eh_ref[...]
            ewv = ew_ref[...]
            for h in range(HEADS):
                q = qkv_ref[0][:, h * hd:(h + 1) * hd]
                k = qkv_ref[0][:, c + h * hd:c + (h + 1) * hd]
                v = qkv_ref[0][:, 2 * c + h * hd:2 * c + (h + 1) * hd]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if variant in ("bias2",):
                    s = s + jax.lax.dot_general(
                        qrh_ref[0, h], ehv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + jax.lax.dot_general(
                        qrw_ref[0, h], ewv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if variant == "dots_qk":
                    o_ref[0, :, h * hd:(h + 1) * hd] = (
                        s[:, :hd] * 1e-3).astype(o_ref.dtype)
                    continue
                if variant in ("softmax", "bias2"):
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                else:  # dots_qk_pv
                    p = s * 1e-3
                o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

        @jax.jit
        def run(qkvx):
            return pl.pallas_call(
                kern,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, S, 3 * C), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, HEADS, S, 16), lambda i: (i, 0, 0, 0)),
                    pl.BlockSpec((1, HEADS, S, 16), lambda i: (i, 0, 0, 0)),
                    pl.BlockSpec((16, S), lambda i: (0, 0)),
                    pl.BlockSpec((16, S), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, S, C), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, S, C), qkvx.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(qkvx, qrh, qrh, eh, eh)
        return run

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

    for variant in ("dots_qk", "dots_qk_pv", "softmax", "bias2"):
        f = make(variant)

        def run(h, f=f):
            o = f(h)
            return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)
        rec(variant, timed(loop(run), qkv))

    def run_packed(h):
        o = window_attention_packed(h, rel_h, rel_w, scale=scale,
                                    heads=HEADS, win=WIN)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)
    rec("packed", timed(loop(run_packed), qkv))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
