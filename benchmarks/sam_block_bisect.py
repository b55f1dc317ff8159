#!/usr/bin/env python
"""Bisect the windowed SAM block with tunnel-floor-proof timing.

TIMING PITFALL (cost us a round of wrong conclusions): through the axon
relay every measurement pays a ~31 ms host<->device roundtrip, so a K-rep
fori_loop measurement reports op_ms + 31/K. At K=8..32 that floor is
1-4 ms — the same magnitude as the ops being attributed. K=128 pushes the
floor to ~0.24 ms; `floor_ms` is also measured directly (empty loop) and
subtracted from every reported number.

Components (6 views, one windowed SAM-B layer, bf16):
  block_now    — current default path (mh rel-pos kernel + fused MLP + fast LN)
  block_xla    — all pallas gates forced off (pure-XLA block)
  mlp_half     — ln2+MLP+residual (ops.fused_mlp)
  qkv_proj     — the attention-side dense matmuls alone (no slicing tricks)
  attn_mh      — the multi-head windowed rel-pos kernel alone
  relpos_prep  — q_rh/q_rw einsums + head split/merge transposes
  ln_single    — one LayerNorm (norm_fast)
  partition_rt — window partition + unpartition round trip
"""
from __future__ import annotations

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

    import lvv_tpu.models.sam as sam_mod
    import lvv_tpu.ops.fused_mlp as fm
    from lvv_tpu.config import default_config
    from lvv_tpu.models.sam import (SAMBlock, resize_rel_pos,
                                    window_partition, window_unpartition)
    from lvv_tpu.ops.attention import flash_attention_relpos
    from lvv_tpu.utils import astype_tree

    cfg = default_config()
    rng = np.random.default_rng(0)
    grid = cfg.model.sam.img_size // cfg.model.sam.patch_size   # 64
    d = cfg.model.sam.embed_dim                                 # 768
    win = cfg.model.sam.window_size                             # 14
    heads = cfg.model.sam.num_heads                             # 12
    hd = d // heads
    x6 = jnp.asarray(rng.normal(size=(6, grid, grid, d)), jnp.bfloat16)
    results = {}
    outp = pathlib.Path(__file__).parent / "sam_block_bisect.json"

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

    floor = timed(loop(lambda h: h), x6)
    results["floor_ms_per_rep"] = round(floor / K * 1e3, 3)

    def rec(name, secs):
        results[name] = round((secs - floor) / K * 1e3, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {results[name]:.3f} ms", flush=True)

    blk = SAMBlock(heads, window_size=win, use_rel_pos=True,
                   input_size=(grid, grid), dtype=jnp.bfloat16)
    bp = jax.device_put(astype_tree(
        blk.init(jax.random.PRNGKey(0), x6[:1])["params"], jnp.bfloat16))
    rec("block_now", timed(loop(
        lambda p, h: blk.apply({"params": p}, h)), bp, x6))

    # pure-XLA block: gate off every pallas path
    gates = (sam_mod._relpos_kernel_ok, fm.kernel_ok)
    sam_mod._relpos_kernel_ok = lambda *a: False
    fm.kernel_ok = lambda *a: False
    try:
        rec("block_xla", timed(loop(
            lambda p, h: blk.apply({"params": p}, h)), bp, x6))
    finally:
        sam_mod._relpos_kernel_ok, fm.kernel_ok = gates

    # --- mlp half
    ls = jnp.asarray(1 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    lb = jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, 4 * d)) / np.sqrt(d), jnp.bfloat16)
    b1 = jnp.asarray(0.1 * rng.normal(size=(4 * d,)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4 * d, d)) / 55, jnp.bfloat16)
    b2 = jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.bfloat16)
    rec("mlp_half", timed(loop(
        lambda h: fm.ln_mlp_residual(h, ls, lb, w1, b1, w2, b2)), x6))

    # --- attention-side dense matmuls (no slicing: full outputs feed back)
    nw = (grid + win - 1) // win                    # 5 windows per side
    tokens = 6 * nw * nw * win * win                # 29400 padded tokens
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)) / 28, jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(d, d)) / 28, jnp.bfloat16)
    xt = jnp.asarray(rng.normal(size=(tokens, d)), jnp.bfloat16)

    def qkv_proj(h):
        a = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
        a = a.astype(jnp.bfloat16)
        out = jnp.dot(a[:, :d] + a[:, d:2 * d] + a[:, 2 * d:], wproj,
                      preferred_element_type=jnp.float32)
        return h + out.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)

    rec("qkv_proj", timed(loop(qkv_proj), xt))

    # --- mh rel-pos kernel alone (150 windows x 12 heads, 196 tokens)
    b_att = 6 * nw * nw
    q = jnp.asarray(rng.normal(size=(b_att, heads, win * win, hd)),
                    jnp.bfloat16)
    kk = jnp.asarray(rng.normal(size=q.shape), jnp.bfloat16)
    vv = jnp.asarray(rng.normal(size=q.shape), jnp.bfloat16)
    qrh = jnp.asarray(rng.normal(size=(b_att, heads, win * win, win)),
                      jnp.bfloat16)
    qrw = jnp.asarray(rng.normal(size=qrh.shape), jnp.bfloat16)

    def attn_mh(h):
        o = flash_attention_relpos(h, kk, vv, qrh, qrw,
                                   scale=1.0 / np.sqrt(hd), grid_w=win,
                                   block_q=256, block_k=256)
        return h + o * jnp.bfloat16(1e-3)

    rec("attn_mh", timed(loop(attn_mh), q))

    # --- rel-pos prep: head split + q·R einsums + merge (the XLA glue
    # around the kernel inside SAMAttention)
    rel_h = jnp.asarray(rng.normal(size=(2 * win - 1, hd)), jnp.bfloat16)
    rel_w = jnp.asarray(rng.normal(size=(2 * win - 1, hd)), jnp.bfloat16)
    xw = jnp.asarray(rng.normal(size=(b_att, win * win, 3 * d)),
                     jnp.bfloat16)

    def relpos_prep(h):
        qkv = h.reshape(b_att, win * win, 3, heads, hd)
        qq, kq, vq = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        rh = resize_rel_pos(rel_h, win, win)
        rw = resize_rel_pos(rel_w, win, win)
        qr = qq.reshape(b_att, heads, win, win, hd)
        q_rh = jnp.einsum("bnhwc,hkc->bnhwk", qr, rh,
                          preferred_element_type=jnp.float32
                          ).reshape(b_att, heads, win * win, win)
        q_rw = jnp.einsum("bnhwc,wkc->bnhwk", qr, rw,
                          preferred_element_type=jnp.float32
                          ).reshape(b_att, heads, win * win, win)
        o = (qq + kq + vq + q_rh.astype(jnp.bfloat16).sum(-1, keepdims=True)
             + q_rw.astype(jnp.bfloat16).sum(-1, keepdims=True))
        o = o.transpose(0, 2, 1, 3).reshape(b_att, win * win, d)
        return h + jnp.concatenate([o, o, o], -1) * jnp.bfloat16(1e-3)

    rec("relpos_prep", timed(loop(relpos_prep), xw))

    # --- single LN
    rec("ln_single", timed(loop(lambda h: fm.norm_fast(h, ls, lb)), x6))

    # --- partition round trip
    def part_rt(h):
        y, padded = window_partition(h, win)
        z = window_unpartition(y, win, padded, (grid, grid))
        return h + z * jnp.bfloat16(1e-3)

    rec("partition_rt", timed(loop(part_rt), x6))


if __name__ == "__main__":
    main()
