#!/usr/bin/env python
"""Per-layer device-time bisect of the remaining e2e stages (v5e, K-rep
fori_loop with explicit tunnel-floor subtraction — see sam_block_bisect).

  gblock      — one GLOBAL SAM block (64x64 tokens, streaming rel-pos)
  gattn_glue  — its head-split + q·R einsum glue alone
  clip_block  — one CLIP-L layer at (6, 257, 1024)
  qwen_layer  — one Qwen-0.5B decoder layer, 1536-token prefill shape
  decode_step — full-model single-token decode steps are bandwidth-bound;
                measured in bench.py, not here

Writes benchmarks/stage_bisect.json.
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
    from lvv_tpu.models.sam import SAMBlock
    from lvv_tpu.utils import astype_tree

    cfg = default_config()
    rng = np.random.default_rng(0)
    results = {}
    outp = pathlib.Path(__file__).parent / "stage_bisect.json"

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

    # --- global SAM block
    d = cfg.model.sam.embed_dim
    grid = cfg.model.sam.img_size // cfg.model.sam.patch_size
    x6 = jnp.asarray(rng.normal(size=(6, grid, grid, d)), jnp.bfloat16)
    floor = timed(loop(lambda h: h), x6)
    results["floor_ms"] = round(floor / K * 1e3, 3)
    gblk = SAMBlock(cfg.model.sam.num_heads, window_size=0,
                    use_rel_pos=True, input_size=(grid, grid),
                    dtype=jnp.bfloat16)
    gp = jax.device_put(astype_tree(
        gblk.init(jax.random.PRNGKey(0), x6[:1])["params"], jnp.bfloat16))
    rec("gblock", timed(loop(lambda p, h: gblk.apply({"params": p}, h)),
                        gp, x6), floor)

    # --- the streaming rel-pos kernel alone at global shape, block sweep
    from lvv_tpu.ops.attention import flash_attention_relpos
    heads0 = cfg.model.sam.num_heads
    hd0 = d // heads0
    qg = jnp.asarray(rng.normal(size=(6, heads0, grid * grid, hd0)),
                     jnp.bfloat16)
    kg = jnp.asarray(rng.normal(size=qg.shape), jnp.bfloat16)
    vg = jnp.asarray(rng.normal(size=qg.shape), jnp.bfloat16)
    qrh_g = jnp.asarray(rng.normal(size=(6, heads0, grid * grid, grid)),
                        jnp.bfloat16)
    qrw_g = jnp.asarray(rng.normal(size=qrh_g.shape), jnp.bfloat16)
    for bq, bk in ((1024, 1024), (2048, 1024), (2048, 2048), (512, 1024)):
        def attn(h, bq=bq, bk=bk):
            o = flash_attention_relpos(h, kg, vg, qrh_g, qrw_g,
                                       scale=0.125, grid_w=grid,
                                       block_q=bq, block_k=bk)
            return h + o * jnp.bfloat16(1e-3)
        rec(f"gattn_k_{bq}x{bk}", timed(loop(attn), qg), floor)

    # --- the glue alone: head split + q·R einsums + merge
    from lvv_tpu.models.sam import resize_rel_pos
    heads = cfg.model.sam.num_heads
    hd = d // heads
    rel = jnp.asarray(rng.normal(size=(2 * grid - 1, hd)), jnp.bfloat16)
    xq = jnp.asarray(rng.normal(size=(6, grid * grid, 3 * d)), jnp.bfloat16)

    def glue(h):
        qkv = h.reshape(6, grid * grid, 3, heads, hd)
        q, kk, vv = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        rh = resize_rel_pos(rel, grid, grid)
        qr = q.reshape(6, heads, grid, grid, hd)
        q_rh = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh,
                          preferred_element_type=jnp.float32)
        q_rw = jnp.einsum("bnhwc,wkc->bnhwk", qr, rh,
                          preferred_element_type=jnp.float32)
        o = (q + kk + vv
             + q_rh.astype(jnp.bfloat16).reshape(6, heads, grid * grid, grid)
             .sum(-1, keepdims=True)
             + q_rw.astype(jnp.bfloat16).reshape(6, heads, grid * grid, grid)
             .sum(-1, keepdims=True))
        o = o.transpose(0, 2, 1, 3).reshape(6, grid * grid, d)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("gattn_glue", timed(loop(glue), xq), floor)

    # --- CLIP block
    from lvv_tpu.models.clip import CLIPEncoderLayer
    cc = cfg.model.clip.hidden_size
    xc = jnp.asarray(rng.normal(size=(6, 257, cc)), jnp.bfloat16)
    floor_c = timed(loop(lambda h: h), xc)
    cblk = CLIPEncoderLayer(num_heads=cfg.model.clip.num_heads,
                            intermediate_size=cfg.model.clip.intermediate_size,
                            dtype=jnp.bfloat16)
    cp = jax.device_put(astype_tree(
        cblk.init(jax.random.PRNGKey(0), xc)["params"], jnp.bfloat16))
    rec("clip_block", timed(loop(lambda p, h: cblk.apply({"params": p}, h)),
                            cp, xc), floor_c)

    # --- Qwen decoder layer at prefill shape
    from lvv_tpu.models.qwen import QwenLayer
    qc = cfg.model.llm
    seq = 1536
    xl = jnp.asarray(rng.normal(size=(1, seq, qc.hidden_size)), jnp.bfloat16)
    floor_q = timed(loop(lambda h: h), xl)
    lay = QwenLayer(qc, dtype=jnp.bfloat16)
    pos = jnp.arange(seq)[None]
    lp = jax.device_put(astype_tree(
        lay.init(jax.random.PRNGKey(0), xl, pos)["params"], jnp.bfloat16))
    rec("qwen_layer_prefill",
        timed(loop(lambda p, h: lay.apply({"params": p}, h, pos)[0]),
              lp, xl), floor_q)


if __name__ == "__main__":
    main()
