#!/usr/bin/env python
"""Per-stage TPU timing breakdown of the VQA pipeline.

Times each subsystem as its own jit program (values fetched to host — see
bench.py note on the axon relay): 6-view DeepEncoder, VisionAdapter+
VATVision, VATLiDAR, LLM prefill, 32-step decode. Prints a JSON dict of
median seconds per stage. Guides kernel work: whichever stage dominates is
the next Pallas target.
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
import time

import numpy as np


def timed(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        np.asarray(jax_leaf(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax_leaf(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def jax_leaf(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0]


def main():
    import jax
    import jax.numpy as jnp
    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel
    from lvv_tpu.utils import astype_tree

    cfg = default_config()
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    bev = jnp.asarray(rng.normal(size=(1, c, h, w)).astype(np.float32))
    images = jnp.asarray(rng.uniform(-1, 1, (1, 6, 3, s, s))
                         .astype(np.float32))
    vv = jnp.ones((1, 6), bool)
    prompt = jnp.asarray(rng.integers(0, 1000, (1, 24)), jnp.int32)
    plen = jnp.full((1,), 24, jnp.int32)
    batch = VQABatch(bev=bev, images=images, view_valid=vv, text_ids=prompt,
                     text_len=plen, labels=jnp.full_like(prompt, -100),
                     use_vision=jnp.asarray(True),
                     use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    params = jax.device_put(astype_tree(params, jnp.bfloat16))

    out = {}

    @jax.jit
    def f_views(p, im):
        return model.apply({"params": p}, im, vv,
                           method=lambda m, i, v: m.deepencoder.encode_views(
                               i, v))
    out["deepencoder_6views"] = timed(f_views, params, images)
    view_tokens = f_views(params, images)

    @jax.jit
    def f_fuse(p, vt):
        def fn(m, vt_):
            kv = m.adapter(vt_)
            return m.vat_vision(kv)
        return model.apply({"params": p}, vt, method=fn)
    out["adapter_vat_vision"] = timed(f_fuse, params, view_tokens)

    @jax.jit
    def f_lidar(p, b):
        return model.apply({"params": p}, b,
                           method=lambda m, b_: m.vat_lidar(b_))
    out["vat_lidar"] = timed(f_lidar, params, bev)

    @jax.jit
    def f_llm_prefill(p, b):
        loss, logits, n = model.apply({"params": p}, b)
        return logits[:, -1]
    out["full_forward_loss"] = timed(f_llm_prefill, params, batch)

    from lvv_tpu.models import greedy_generate
    def f_gen():
        toks, _ = greedy_generate(model, params, bev, images, vv, prompt,
                                  plen, max_new_tokens=32, eos_id=2)
        return toks
    out["e2e_generate_32tok"] = timed(f_gen)

    out["decode_only_est"] = out["e2e_generate_32tok"] - \
        out["deepencoder_6views"] - out["adapter_vat_vision"] - \
        out["vat_lidar"]
    print(json.dumps({k: round(v, 4) for k, v in out.items()}))


if __name__ == "__main__":
    main()
