#!/usr/bin/env python
"""Floor-proof device timing of the fusion stages + full encode.

Same methodology as sam_block_bisect.py (in-jit fori_loop, empty-loop
floor subtracted): answers where the non-SAM "other" device time goes —
VATLiDAR (cross-attn over 32.4k BEV tokens), adapter+VATVision, and the
whole 6-view DeepEncoder as one number (patch embed + 12 SAM blocks +
neck/VARY + CLIP + projector), at bench shapes in bf16.

Writes benchmarks/fusion_bisect.json (ms per invocation, floor-corrected).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K_SMALL = 128   # for ~ms stages
K_BIG = 16      # for the ~100 ms encode (floor 31/16 ~= 2 ms, <3% of it)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel
    from lvv_tpu.utils import astype_tree

    import dataclasses
    import os
    cfg = default_config()
    if os.environ.get("LVV_BENCH_QUANT8", "1") == "1":
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            sam=dataclasses.replace(cfg.model.sam, quant8=True),
            clip=dataclasses.replace(cfg.model.clip, quant8=True)))
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    bev = jnp.asarray(rng.normal(size=(1, c, h, w)).astype(np.float32))
    images = jnp.asarray(
        rng.uniform(-1, 1, (1, 6, 3, s, s)).astype(np.float32))
    vv = jnp.ones((1, 6), bool)
    prompt = jnp.asarray(rng.integers(0, 1000, (1, 24)), jnp.int32)
    plen = jnp.full((1,), 24, jnp.int32)
    batch = VQABatch(bev=bev, images=images, view_valid=vv, text_ids=prompt,
                     text_len=plen, labels=jnp.full_like(prompt, -100),
                     use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
    params = jax.device_put(astype_tree(
        model.init(jax.random.PRNGKey(0), batch)["params"], jnp.bfloat16))

    results = {}
    outp = pathlib.Path(__file__).parent / "fusion_bisect.json"

    def timed(fn, *xs, iters=5, warmup=2):
        for _ in range(warmup):
            float(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def loop(f, k):
        # carry = the stage input; the output folds back as a tiny scalar
        # perturbation so the chain can't be dead-code-eliminated while the
        # carry shape stays fixed
        def body(x, p):
            out = f(p, x)
            leaves = jax.tree_util.tree_leaves(out)
            eps = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return x + (eps * 1e-24).astype(x.dtype)
        return jax.jit(lambda p, x: jnp.sum(
            lax.fori_loop(0, k, lambda _, h: body(h, p), x)
            .astype(jnp.float32)))

    def floor_for(k, x):
        return timed(jax.jit(lambda p, h: jnp.sum(
            lax.fori_loop(0, k, lambda _, hh: hh, h).astype(jnp.float32))),
            params, x)

    def rec(name, secs, floor, k):
        results[name] = round((secs - floor) / k * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    # --- VATLiDAR: [1,128,180,180] -> [1,768,896]
    f_lidar = lambda p, b: model.apply(
        {"params": p}, b, method=lambda m, b_: m.vat_lidar(b_))
    fl = floor_for(K_SMALL, bev)
    results["floor_small_ms"] = round(fl / K_SMALL * 1e3, 3)
    rec("vat_lidar", timed(loop(f_lidar, K_SMALL), params, bev), fl, K_SMALL)

    # --- adapter + VATVision: [1,6,256,2048] -> [1,768,896]
    vt = model.apply({"params": params}, images, vv,
                     method=lambda m, i, v: m.deepencoder.encode_views(i, v))
    vt = jax.device_put(vt)

    def f_fuse(p, vt_):
        def fn(m, x):
            return m.vat_vision(m.adapter(x))
        return model.apply({"params": p}, vt_, method=fn)
    ff = floor_for(K_SMALL, vt)
    rec("adapter_vat_vision", timed(loop(f_fuse, K_SMALL), params, vt),
        ff, K_SMALL)

    # --- full 6-view DeepEncoder (patch embed + SAM + CLIP + projector)
    def f_enc(p, im):
        return model.apply(
            {"params": p}, im, vv,
            method=lambda m, i, v: m.deepencoder.encode_views(i, v))
    fe = floor_for(K_BIG, images)
    results["floor_big_ms"] = round(fe / K_BIG * 1e3, 3)
    rec("deepencoder_6views", timed(loop(f_enc, K_BIG), params, images),
        fe, K_BIG)


if __name__ == "__main__":
    main()
