#!/usr/bin/env python
"""Where do 178 ms/batch go at B=8? batch_stage_bisect.json sums the
device stages to 982 ms/batch while serving_bench measures 1161 ms.
Candidates: (a) the monolithic greedy_generate program is slower than the
sum of its stages (scheduling/layout at the jit boundary), (b) per-call
dispatch overhead through the axon relay, (c) host glue.

Rows (B=8, 32 new tokens, quant8 encode like serving):
  mono_ms        one greedy_generate call, timed host-side (1 dispatch)
  split_ms       encode_prefix_fn + generate_from_prefix (2 dispatches)
  mono_loop_ms   K=4 greedy_generate inside one jit fori_loop (amortizes
                 dispatch): device truth for the monolith
  dispatch_ms    mono_ms - mono_loop_ms = relay + host overhead per call
Writes serving_gap_bisect.json.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

B = 8
NEW = 32


def main():
    import dataclasses
    import jax
    import jax.numpy as jnp

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel
    from lvv_tpu.models.vqa import (_generate_fn, encode_prefix_fn,
                                    generate_from_prefix, greedy_generate)
    from lvv_tpu.utils import astype_tree, enable_compile_cache

    enable_compile_cache()
    cfg = default_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model,
        sam=dataclasses.replace(cfg.model.sam, quant8=True),
        clip=dataclasses.replace(cfg.model.clip, quant8=True)))
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)

    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    t = 24
    rng = np.random.default_rng(0)
    bev = jnp.asarray(rng.normal(size=(B, c, h, w)).astype(np.float32))
    images = jnp.asarray(
        rng.uniform(-1, 1, (B, 6, 3, s, s)).astype(np.float32))
    vv = jnp.ones((B, 6), bool)
    prompt = jnp.asarray(rng.integers(0, 1000, (B, t)), jnp.int32)
    plen = jnp.full((B,), t, jnp.int32)

    init_batch = VQABatch(
        bev=bev[:1], images=images[:1], view_valid=vv[:1],
        text_ids=prompt[:1], text_len=plen[:1],
        labels=jnp.full_like(prompt[:1], -100),
        use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), init_batch)["params"]
    params = jax.device_put(astype_tree(params, jnp.bfloat16))

    results = {}
    outp = pathlib.Path(__file__).parent / "serving_gap_bisect.json"

    def rec(k, v):
        results[k] = round(v, 2)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{k}: {results[k]}", flush=True)

    def timed(fn, reps=4, warm=2):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    def mono():
        toks, _ = greedy_generate(model, params, bev, images, vv, prompt,
                                  plen, max_new_tokens=NEW, eos_id=-1)
        np.asarray(toks)

    rec("mono_ms", timed(mono))

    enc = encode_prefix_fn(model)

    def split():
        prefix = enc(params, bev, images, vv)
        toks, _ = generate_from_prefix(model, params, prefix, prompt, plen,
                                       max_new_tokens=NEW, eos_id=-1)
        np.asarray(toks)

    rec("split_ms", timed(split))

    # decode slope: NEW=1 vs NEW=32 isolates per-step decode cost inside
    # the monolith; the intercept is encode+prefill+fixed glue
    def mono_n(n):
        def f():
            toks, _ = greedy_generate(model, params, bev, images, vv,
                                      prompt, plen, max_new_tokens=n,
                                      eos_id=-1)
            np.asarray(toks)
        return f

    m1 = timed(mono_n(1), reps=3)
    rec("mono_new1_ms", m1)
    rec("decode_per_step_ms", (results["mono_ms"] - m1) / (NEW - 1))
    rec("encode_prefill_fixed_ms", m1)

    # encode alone (same program serving's prefix cache uses)
    def enc_only():
        np.asarray(enc(params, bev, images, vv))
    rec("encode_only_ms", timed(enc_only))

    # pipelined monolith: keep 2 calls in flight (async dispatch hides the
    # relay roundtrip + host glue; the realistic serving loop shape)
    def pipelined(depth=2, n=6):
        outs = []
        t0 = time.perf_counter()
        for i in range(n):
            toks, _ = greedy_generate(model, params, bev, images, vv,
                                      prompt, plen, max_new_tokens=NEW,
                                      eos_id=-1)
            outs.append(toks)
            if len(outs) > depth - 1:
                np.asarray(outs.pop(0))
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / n * 1e3

    pipelined(n=2)   # warm
    rec("mono_pipelined_ms", float(np.median([pipelined() for _ in
                                              range(2)])))
    rec("pipelined_frames_s", B / (results["mono_pipelined_ms"] / 1e3))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
