#!/usr/bin/env python
"""Device truth for the B=8 serving monolith: K reps of the FULL
(encode + prefill + decode32) program inside ONE jit fori_loop.

Decides where the residual ~110 ms/batch between the per-stage device sum
(966 ms, batch_stage_bisect.json) and the measured multi-program wall
(~1085 ms/batch) lives: if the in-jit monolith reps run at ~the stage sum,
the residual is host/dispatch; if they match the measured wall, the
monolith itself pays stage-boundary overhead (relayouts/allocation) that
the isolated stage loops dodge. Writes benchmarks/mono_loop_micro.json.
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
K = 4


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQAModel, prepare_serving_params
    from lvv_tpu.models.vqa import VQABatch, _decode_loop, _prefix_len
    from lvv_tpu.models.qwen import init_cache
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
    pq = jax.device_put(prepare_serving_params(params))

    max_cache = _prefix_len(cfg.model) + t + NEW + 8

    def one_batch(p, p_dec, bev, images, vv, prompt, plen):
        cache = init_cache(cfg.model.llm, B, max_cache, dtype=model.dtype)
        last_logits, cache = model.apply(
            {"params": p}, bev, images, vv, prompt, plen, cache,
            method=VQAModel.prefill)
        toks, _ = _decode_loop(model, p, p_dec, last_logits, cache,
                               max_new_tokens=NEW, eos_id=-1)
        return jnp.sum(toks.astype(jnp.int32))

    @jax.jit
    def loop(p, p_dec, bev, images, vv, prompt, plen, acc):
        def body(_, a):
            return a + one_batch(p, p_dec, bev, images, vv, prompt, plen)
        return lax.fori_loop(0, K, body, acc)

    @jax.jit
    def floor(acc):
        return lax.fori_loop(0, K, lambda _, a: a + 1, acc)

    def timed(fn, *xs, iters=3, warmup=1):
        for _ in range(warmup):
            int(fn(*xs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            int(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    fl = timed(floor, jnp.int32(0))
    sec = timed(loop, params, pq, bev, images, vv, prompt, plen,
                jnp.int32(0))
    out = {
        "k": K,
        "floor_s": round(fl, 4),
        "mono_loop_ms_per_batch": round((sec - fl) / K * 1e3, 1),
        "stage_sum_ms_ref": 966.2,
        "measured_multi_wall_ms_ref": 1085.0,
    }
    (pathlib.Path(__file__).parent / "mono_loop_micro.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
