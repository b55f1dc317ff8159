#!/usr/bin/env python
"""A/B the pallas-prepped hpacked global attention against the XLA-glue
hpacked path at the SAM global shape (6 views, 64x64 tokens, 12 heads,
head_dim 64), measured from the qkv Dense output through the attention
output. Writes gattn_prep_micro.json."""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K = 64


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.ops.attention import (
        flash_attention_relpos_hpacked,
        flash_attention_relpos_hpacked_prepped)

    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "gattn_prep_micro.json"

    B, GH, GW, HEADS, HD = 6, 64, 64, 12, 64
    S, C = GH * GW, HEADS * HD
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * C)), jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(GH, GH, HD)) * 0.3, jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(GW, GW, HD)) * 0.3, jnp.bfloat16)
    scale = 1.0 / np.sqrt(HD)

    ref = np.asarray(flash_attention_relpos_hpacked(
        qkv[:1], rel_h, rel_w, scale=scale, grid_w=GW, heads=HEADS),
        np.float32)
    got = np.asarray(flash_attention_relpos_hpacked_prepped(
        qkv[:1], rel_h, rel_w, scale=scale, grid_w=GW, heads=HEADS),
        np.float32)
    results["numcheck"] = round(float(np.max(np.abs(got - ref))), 4)
    print("numcheck:", results["numcheck"], flush=True)
    outp.write_text(json.dumps(results, indent=1))

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

    def run_glue(h):
        o = flash_attention_relpos_hpacked(h, rel_h, rel_w, scale=scale,
                                           grid_w=GW, heads=HEADS)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    def run_prep(h):
        o = flash_attention_relpos_hpacked_prepped(
            h, rel_h, rel_w, scale=scale, grid_w=GW, heads=HEADS)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("hpacked_glue", timed(loop(run_glue), qkv))
    rec("hpacked_prepped", timed(loop(run_prep), qkv))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
