#!/usr/bin/env python
"""A/B the fused decode+encode serving stage (pipelined_serving_step)
against the monolithic greedy_generate at B=8: does XLA fill the decode
scan's HBM-stall slots with next-batch encode matmuls?

Steady-state: N pipelined steps with depth-2 host dispatch; frames/s =
N*B / wall. Writes pipeline_overlap_micro.json."""
from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

B = 8
NEW = 32
N_STEPS = 6


def main():
    import jax
    import jax.numpy as jnp

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel
    from lvv_tpu.models.vqa import (encode_prefix_fn, greedy_generate,
                                    pipelined_serving_step)
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
    outp = pathlib.Path(__file__).parent / "pipeline_overlap_micro.json"

    def rec(k, v):
        results[k] = round(v, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{k}: {results[k]}", flush=True)

    # correctness: pipelined tokens == greedy_generate tokens
    ref_toks, _ = greedy_generate(model, params, bev, images, vv, prompt,
                                  plen, max_new_tokens=NEW, eos_id=-1)
    prefix0 = encode_prefix_fn(model)(params, bev, images, vv)
    got_toks, _, _ = pipelined_serving_step(
        model, params, prefix0, prompt, plen, bev, images, vv,
        max_new_tokens=NEW, eos_id=-1)
    same = bool(np.array_equal(np.asarray(ref_toks), np.asarray(got_toks)))
    rec("tokens_match", float(same))
    assert same, "pipelined decode diverged from greedy_generate"

    # monolith baseline, depth-2 dispatch pipelining
    def mono_run(n=N_STEPS):
        outs = []
        t0 = time.perf_counter()
        for _ in range(n):
            toks, _ = greedy_generate(model, params, bev, images, vv,
                                      prompt, plen, max_new_tokens=NEW,
                                      eos_id=-1)
            outs.append(toks)
            if len(outs) > 1:
                np.asarray(outs.pop(0))
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / n * 1e3

    mono_run(2)
    rec("mono_ms", float(np.median([mono_run() for _ in range(2)])))
    rec("mono_frames_s", B / (results["mono_ms"] / 1e3))

    # pipelined steady state (prefix chains through the loop)
    def pipe_run(n=N_STEPS):
        prefix = prefix0
        outs = []
        t0 = time.perf_counter()
        for _ in range(n):
            toks, lens, prefix = pipelined_serving_step(
                model, params, prefix, prompt, plen, bev, images, vv,
                max_new_tokens=NEW, eos_id=-1)
            outs.append(toks)
            if len(outs) > 1:
                np.asarray(outs.pop(0))
        for o in outs:
            np.asarray(o)
        return (time.perf_counter() - t0) / n * 1e3

    pipe_run(2)
    rec("pipelined_ms", float(np.median([pipe_run() for _ in range(2)])))
    rec("pipelined_frames_s", B / (results["pipelined_ms"] / 1e3))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
