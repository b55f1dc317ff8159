#!/usr/bin/env python
"""Bisect VATLiDAR's 11.6 ms device time (benchmarks/fusion_bisect.json)
into its stages: depthwise refine + in_proj/LN/PE over the 32.4k BEV
tokens, the per-block kv projections, the flash cross-attention, and the
query-side self-attn/MLP.

K-rep fori_loop with explicit tunnel-floor subtraction (BASELINE.md
measurement rule). Writes benchmarks/vat_bisect.json.
"""
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

    from lvv_tpu.config import default_config
    from lvv_tpu.models.vat import VATLiDAR, VATBlock
    from lvv_tpu.models.layers import MultiHeadAttention
    from lvv_tpu.utils import astype_tree

    cfg = default_config()
    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "vat_bisect.json"

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

    def rec(name, secs, floor):
        results[name] = round((secs - floor) / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    vl = cfg.model.vat_lidar
    c, (hgrid, _w) = cfg.model.bev_channels, cfg.model.bev_hw
    d = vl.d_model
    print(f"bev [{c},{hgrid},{hgrid}] d_model={d} n_q={vl.n_queries} "
          f"blocks={vl.n_blocks} heads={vl.n_heads}", flush=True)

    bev = jnp.asarray(rng.normal(size=(1, c, hgrid, hgrid)), jnp.bfloat16)
    floor = timed(loop(lambda h: h), bev)
    results["floor_ms"] = round(floor / K * 1e3, 3)

    mod = VATLiDAR(d_model=d, n_queries=vl.n_queries, n_blocks=vl.n_blocks,
                   n_heads=vl.n_heads, dtype=jnp.bfloat16)
    p = jax.device_put(astype_tree(
        mod.init(jax.random.PRNGKey(0), bev)["params"], jnp.bfloat16))
    rec("vat_lidar_full",
        timed(loop(lambda pp, h: mod.apply(
            {"params": pp}, h)[..., :1, :c].reshape(1, c, 1, 1) * 1e-3 + h),
            p, bev), floor)

    # tokens-side stages
    s = hgrid * hgrid
    tok = jnp.asarray(rng.normal(size=(1, s, d)), jnp.bfloat16)
    floor_t = timed(loop(lambda h: h), tok)

    blk = VATBlock(vl.n_heads, dtype=jnp.bfloat16)
    q0 = jnp.asarray(rng.normal(size=(1, vl.n_queries, d)), jnp.bfloat16)
    bp = jax.device_put(astype_tree(
        blk.init(jax.random.PRNGKey(0), q0, tok)["params"], jnp.bfloat16))
    rec("vat_block",
        timed(loop(lambda pp, h: h + (jnp.sum(
            blk.apply({"params": bp}, q0, h).astype(jnp.float32))
            * 1e-9).astype(h.dtype)),
              bp, tok), floor_t)

    # kv projections alone (k_proj + v_proj over 32.4k tokens)
    wk = jnp.asarray(rng.normal(size=(d, d)) * 0.02, jnp.bfloat16)
    wv = jnp.asarray(rng.normal(size=(d, d)) * 0.02, jnp.bfloat16)

    def kvproj(h):
        kk = h @ wk
        vv = h @ wv
        return h + (kk[:, :1] + vv[:, :1]) * jnp.bfloat16(1e-3)
    rec("kv_proj_pair", timed(loop(kvproj), tok), floor_t)

    # front-end pieces over the 32.4k tokens
    import flax.linen as fnn
    dwc = fnn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                   dtype=jnp.bfloat16)
    xnhwc = jnp.asarray(rng.normal(size=(1, hgrid, hgrid, c)), jnp.bfloat16)
    dwp = jax.device_put(astype_tree(
        dwc.init(jax.random.PRNGKey(0), xnhwc)["params"], jnp.bfloat16))
    floor_n = timed(loop(lambda h: h), xnhwc)
    rec("dw_conv",
        timed(loop(lambda pp, h: h + dwc.apply({"params": dwp}, h)
                   * jnp.bfloat16(1e-3)), dwp, xnhwc), floor_n)

    from lvv_tpu.models.layers import LayerNorm
    ln = LayerNorm()
    lnp = jax.device_put(ln.init(jax.random.PRNGKey(0), tok)["params"])
    rec("ln_32k",
        timed(loop(lambda pp, h: h + ln.apply({"params": lnp}, h)
                   * jnp.bfloat16(1e-3)), lnp, tok), floor_t)

    # full cross-attention module (projections + head split + flash + o_proj)
    mha = MultiHeadAttention(vl.n_heads, dtype=jnp.bfloat16)
    mp = jax.device_put(astype_tree(
        mha.init(jax.random.PRNGKey(0), q0, tok)["params"], jnp.bfloat16))
    rec("mha_cross",
        timed(loop(lambda pp, h: h + (jnp.sum(
            mha.apply({"params": mp}, q0, h).astype(jnp.float32))
            * 1e-9).astype(h.dtype)), mp, tok), floor_t)

    # flash cross-attention alone at the real shape
    from lvv_tpu.ops.attention import attention
    hd = d // vl.n_heads
    qh = jnp.asarray(rng.normal(size=(1, vl.n_heads, vl.n_queries, hd)),
                     jnp.bfloat16)
    kh = jnp.asarray(rng.normal(size=(1, vl.n_heads, s, hd)), jnp.bfloat16)
    vh = jnp.asarray(rng.normal(size=kh.shape), jnp.bfloat16)
    floor_q = timed(loop(lambda h: h), qh)
    rec("cross_attn",
        timed(loop(lambda h: h + attention(h, kh, vh) * jnp.bfloat16(1e-3)),
              qh), floor_q)


if __name__ == "__main__":
    main()
