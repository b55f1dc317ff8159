#!/usr/bin/env python
"""Floor-proof per-stage device timing at serving batch sizes.

Answers where the batched-serving frame time goes (serving_bench.json
showed B=8 at 145 ms/frame vs a ~124 ms/frame analytic bound): times
encode_prefix (DeepEncoder + VATLiDAR + adapter/VATVision fusion),
prefill_from_prefix (cache build over ~1.6k tokens), and the 32-step
decode scan separately, each amortized in-jit with the empty-loop tunnel
floor subtracted (see sam_block_bisect.py for the methodology).

LVV_BS sets the batch (default "1,8" sweep).
Writes benchmarks/batch_stage_bisect.json:
  {B: {encode_prefix_ms, prefill_ms, decode32_ms, per_frame_ms}}.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

NEW_TOKENS = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel
    from lvv_tpu.models.vqa import VQAModel as _VQA
    from lvv_tpu.models.qwen import init_cache
    from lvv_tpu.utils import astype_tree, enable_compile_cache

    enable_compile_cache()

    import dataclasses
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
    t = 24

    init_bev = jnp.asarray(rng.normal(size=(1, c, h, w)).astype(np.float32))
    init_img = jnp.asarray(
        rng.uniform(-1, 1, (1, 6, 3, s, s)).astype(np.float32))
    init_vv = jnp.ones((1, 6), bool)
    init_pr = jnp.asarray(rng.integers(0, 1000, (1, t)), jnp.int32)
    init_pl = jnp.full((1,), t, jnp.int32)
    batch = VQABatch(bev=init_bev, images=init_img, view_valid=init_vv,
                     text_ids=init_pr, text_len=init_pl,
                     labels=jnp.full_like(init_pr, -100),
                     use_vision=jnp.asarray(True),
                     use_lidar=jnp.asarray(True))
    params = jax.device_put(astype_tree(
        model.init(jax.random.PRNGKey(0), batch)["params"], jnp.bfloat16))

    results = {}
    outp = pathlib.Path(__file__).parent / "batch_stage_bisect.json"
    if outp.exists():
        results = json.loads(outp.read_text())

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
        def body(x, p):
            out = f(p, x)
            leaves = jax.tree_util.tree_leaves(out)
            eps = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return jax.tree_util.tree_map(
                lambda v: v + (eps * 1e-24).astype(v.dtype), x)
        return jax.jit(lambda p, x: jnp.sum(
            jax.tree_util.tree_leaves(
                lax.fori_loop(0, k, lambda _, h: body(h, p), x))[0]
            .astype(jnp.float32)))

    def floor_for(k, x):
        return timed(jax.jit(lambda p, h: jnp.sum(
            jax.tree_util.tree_leaves(
                lax.fori_loop(0, k, lambda _, hh: hh, h))[0]
            .astype(jnp.float32))), params, x)

    for b in (int(x) for x in os.environ.get("LVV_BS", "1,8").split(",")):
        # resumable: stages already recorded for this batch are skipped
        # (LVV_FRESH=1 re-measures everything) — compiles through the axon
        # remote-compile relay are slow enough that one cold run can't
        # always finish a full sweep inside a wall-clock budget
        row = {} if os.environ.get("LVV_FRESH") else dict(
            results.get(str(b), {}))
        bev = jnp.asarray(rng.normal(size=(b, c, h, w)).astype(np.float32))
        images = jnp.asarray(
            rng.uniform(-1, 1, (b, 6, 3, s, s)).astype(np.float32))
        vv = jnp.ones((b, 6), bool)
        prompt = jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32)
        plen = jnp.full((b,), t, jnp.int32)

        # --- encode_prefix: images+bev -> [B, P, D] prefix
        skip = lambda key: key in row and not os.environ.get("LVV_FRESH")
        k_enc = max(4, 32 // b)
        f_enc = lambda p, im: model.apply(
            {"params": p}, bev, im, vv,
            method=_VQA.encode_prefix)
        if not skip("encode_prefix_ms"):
            fl = floor_for(k_enc, images)
            secs = timed(loop(f_enc, k_enc), params, images)
            row["encode_prefix_ms"] = round((secs - fl) / k_enc * 1e3, 2)
            print(f"B={b} encode_prefix: {row['encode_prefix_ms']} ms",
                  flush=True)

        prefix = jax.device_put(jax.jit(f_enc)(params, images))

        # --- prefill_from_prefix (cache build)
        plen_tokens = prefix.shape[1] + t + NEW_TOKENS + 8
        cache = init_cache(model.cfg.llm, b, plen_tokens, jnp.bfloat16)

        k_pre = max(8, 64 // b)
        def f_pre(p, px):
            logits, cache2 = model.apply(
                {"params": p}, px, prompt, plen, cache,
                method=_VQA.prefill_from_prefix)
            return logits, cache2
        if not skip("prefill_ms"):
            flp = floor_for(k_pre, prefix)
            secs = timed(loop(f_pre, k_pre), params, prefix)
            row["prefill_ms"] = round((secs - flp) / k_pre * 1e3, 2)
            print(f"B={b} prefill: {row['prefill_ms']} ms", flush=True)

        # --- decode: 32 scan steps from a built cache
        logits, cache_full = jax.jit(f_pre)(params, prefix)
        tok0 = jnp.argmax(logits, -1).astype(jnp.int32)

        k_dec = 4
        def f_dec(p, tk):
            def body(state, _):
                tok, cch = state
                lg, cch = model.apply({"params": p}, tok, cch,
                                      method=_VQA.decode_step)
                return (jnp.argmax(lg, -1).astype(jnp.int32), cch), ()
            (tk2, _), _ = lax.scan(body, (tk, cache_full), (),
                                   length=NEW_TOKENS)
            return tk2
        fld = floor_for(k_dec, tok0)
        if not skip("decode32_ms"):
            secs = timed(loop(f_dec, k_dec), params, tok0)
            row["decode32_ms"] = round((secs - fld) / k_dec * 1e3, 2)
            print(f"B={b} decode32: {row['decode32_ms']} ms", flush=True)

        # --- decode with weight-only int8 LLM (prepare_serving_params):
        # same scan, quantized tree — the serving decode A/B
        from lvv_tpu.models.vqa import prepare_serving_params
        params_q = prepare_serving_params(
            jax.tree_util.tree_map(lambda v: v, params))
        secs = timed(loop(f_dec, k_dec), params_q, tok0)
        row["decode32_q8_ms"] = round((secs - fld) / k_dec * 1e3, 2)
        print(f"B={b} decode32_q8: {row['decode32_q8_ms']} ms", flush=True)
        del params_q

        row["per_frame_ms"] = round(
            (row["encode_prefix_ms"] + row["prefill_ms"] +
             row["decode32_ms"]) / b, 2)
        results[str(b)] = row
        outp.write_text(json.dumps(results, indent=1))
        print(f"B={b}: {row}", flush=True)


if __name__ == "__main__":
    main()
