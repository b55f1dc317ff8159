#!/usr/bin/env python
"""Fine-grained encode-stage bisect: attribute every ms of the 6-view
DeepEncoder pass (the ~94 ms that dominates the frame,
benchmarks/fusion_bisect.json) to a component, so the residual "glue"
(layout transposes, pos-embed adds, NCHW boundaries) is measured rather
than inferred.

Components (6 views, bf16, quant8 scope = default "mlp" like bench.py):
  deepencoder_full  whole encode_views (the serving path)
  sam_total         SAMImageEncoder alone ([6,3,1024,1024] -> [6,1024,16,16])
  clip_total        CLIPVisionTower on SAM features (patch-bypass)
  projector         MlpProjector on fused tokens
  win_block         one windowed SAMBlock (x8 in SAM-B)
  glob_block        one global SAMBlock (x4)
  patch_embed       patch conv + pos add
  neck_vary         neck convs + LN2d + VARY net_2/net_3

Derived rows: sam_resid = sam_total - (8*win + 4*glob + patch + neck_vary),
full_resid = deepencoder_full - (sam_total + clip_total + projector).

Timing: K-rep in-jit fori_loop minus an empty-loop floor (the axon tunnel
adds ~31 ms per dispatch; see sam_block_bisect.py docstring).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

K_SMALL = 64     # per-block / component reps
K_BIG = 4        # whole-encoder reps


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from lvv_tpu.config import default_config
    from lvv_tpu.models.deepencoder import build_deepencoder
    from lvv_tpu.models.sam import SAMBlock, SAMImageEncoder

    cfg = default_config()
    mcfg = dataclasses.replace(
        cfg.model,
        sam=dataclasses.replace(cfg.model.sam, quant8=True),
        clip=dataclasses.replace(cfg.model.clip, quant8=True))
    rng = np.random.default_rng(0)
    enc = build_deepencoder(mcfg, dtype=jnp.bfloat16)
    imgs = jnp.asarray(rng.normal(size=(1, 6, 3, 1024, 1024)) * 0.5,
                       jnp.bfloat16)
    params = jax.jit(lambda i: enc.init(jax.random.PRNGKey(0), i[0][:1]))(
        imgs)

    results = {}
    outp = pathlib.Path(__file__).parent / "encode_bisect.json"

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
        return jax.jit(lambda *xs: jnp.sum(
            lax.fori_loop(0, k, lambda _, h: f(*xs[:-1], h), xs[-1])
            .astype(jnp.float32)))

    def rec(name, ms):
        results[name] = round(ms, 3)
        outp.write_text(json.dumps(results, indent=1))
        print(f"{name}: {ms:.3f} ms", flush=True)

    grid = cfg.model.sam.img_size // cfg.model.sam.patch_size
    d = cfg.model.sam.embed_dim
    x6 = jnp.asarray(rng.normal(size=(6, grid, grid, d)), jnp.bfloat16)

    # floors
    floor_small = timed(loop(lambda h: h, K_SMALL), x6)
    floor_big = timed(loop(lambda h: h, K_BIG), imgs)
    rec("floor_small_ms_rep", floor_small / K_SMALL * 1e3)
    rec("floor_big_ms_rep", floor_big / K_BIG * 1e3)

    # --- SAM alone ------------------------------------------------------
    sam_mod = SAMImageEncoder(dtype=jnp.bfloat16, quant8=True)
    imgs6 = imgs[0]
    sam_params = jax.jit(lambda i: sam_mod.init(jax.random.PRNGKey(0),
                                                i[:1]))(imgs6)
    # params ride as jit ARGUMENTS: closed-over weights bake into the
    # program as constants and blow the axon remote-compile size limit
    # (HTTP 413 — the round-4 degenerate-artifact root cause)
    samsec = timed(loop(lambda p, h: (
        lambda t: h + 1e-8 * t.astype(jnp.float32).mean().astype(h.dtype))(
        sam_mod.apply(p, h)), K_BIG), sam_params, imgs6)
    rec("sam_total", (samsec - floor_big) / K_BIG * 1e3)

    # --- CLIP on SAM features -------------------------------------------
    from lvv_tpu.models.clip import CLIPVisionTower
    clip_mod = CLIPVisionTower(dtype=jnp.bfloat16, quant8=True)
    feats = jnp.asarray(rng.normal(size=(6, 1024, 16, 16)), jnp.bfloat16)
    clip_params = jax.jit(lambda f: clip_mod.init(
        jax.random.PRNGKey(0), patch_embeds=f[:1]))(feats)
    clipsec = timed(loop(lambda p, h: (
        lambda t: h + 1e-8 * t.astype(jnp.float32).mean().astype(h.dtype))(
        clip_mod.apply(p, patch_embeds=h)), K_SMALL), clip_params, feats)
    rec("clip_total", (clipsec - floor_small) / K_SMALL * 1e3)

    # --- projector -------------------------------------------------------
    from lvv_tpu.models.projector import MlpProjector
    pcfg = cfg.model.projector
    proj_mod = MlpProjector(kind=pcfg.kind, n_embed=pcfg.n_embed,
                            dtype=jnp.bfloat16)
    fused = jnp.asarray(rng.normal(size=(6, 256, 2048)), jnp.bfloat16)
    pp = proj_mod.init(jax.random.PRNGKey(0), fused[:1])
    projsec = timed(loop(lambda p, h: (
        lambda t: h + 1e-8 * t.astype(jnp.float32).mean().astype(h.dtype))(
        proj_mod.apply(p, h)), K_SMALL), pp, fused)
    rec("projector", (projsec - floor_small) / K_SMALL * 1e3)

    # --- per-block -------------------------------------------------------
    for name, ws in (("win_block", 14), ("glob_block", 0)):
        blk = SAMBlock(12, window_size=ws, input_size=(grid, grid),
                       dtype=jnp.bfloat16, quant8=True)
        bp = blk.init(jax.random.PRNGKey(0), x6[:1])
        sec = timed(loop(lambda p, h: blk.apply(p, h).astype(h.dtype),
                         K_SMALL), bp, x6)
        rec(name, (sec - floor_small) / K_SMALL * 1e3)

    # --- patch embed + pos ------------------------------------------------
    import flax.linen as nn

    class PatchStub(nn.Module):
        @nn.compact
        def __call__(self, x_nchw):
            x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(jnp.bfloat16)
            x = nn.Conv(768, (16, 16), strides=16, padding="VALID",
                        dtype=jnp.bfloat16, name="patch_embed")(x)
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (1, grid, grid, 768))
            return x + pos.astype(jnp.bfloat16)

    ps = PatchStub()
    psp = ps.init(jax.random.PRNGKey(0), imgs6[:1])
    sec = timed(loop(lambda p, h: h + 1e-8 * ps.apply(p, h).astype(
        jnp.float32).mean().astype(h.dtype), K_SMALL), psp, imgs6)
    rec("patch_embed", (sec - floor_small) / K_SMALL * 1e3)

    # --- neck + VARY -------------------------------------------------------
    from lvv_tpu.models.sam import LayerNorm2d

    class NeckStub(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(256, (1, 1), use_bias=False, dtype=jnp.bfloat16,
                        name="neck_conv1")(x)
            x = LayerNorm2d(name="neck_ln1")(x)
            x = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                        dtype=jnp.bfloat16, name="neck_conv2")(x)
            x = LayerNorm2d(name="neck_ln2")(x)
            x = nn.Conv(512, (3, 3), strides=2, padding="SAME",
                        use_bias=False, dtype=jnp.bfloat16, name="net_2")(x)
            x = nn.Conv(1024, (3, 3), strides=2, padding="SAME",
                        use_bias=False, dtype=jnp.bfloat16, name="net_3")(x)
            return jnp.transpose(x, (0, 3, 1, 2))

    ns = NeckStub()
    nsp = ns.init(jax.random.PRNGKey(0), x6[:1])
    sec = timed(loop(lambda p, h: h + 1e-8 * ns.apply(p, h).astype(
        jnp.float32).mean().astype(h.dtype), K_SMALL), nsp, x6)
    rec("neck_vary", (sec - floor_small) / K_SMALL * 1e3)

    # --- whole encoder -------------------------------------------------
    fullsec = timed(loop(lambda p, h: (
        lambda t: h + 1e-8 * t.astype(jnp.float32).mean().astype(h.dtype))(
        enc.apply(p, h, method="encode_views")), K_BIG), params, imgs)
    rec("deepencoder_full", (fullsec - floor_big) / K_BIG * 1e3)

    # --- derived -----------------------------------------------------------
    results["sam_resid"] = round(
        results["sam_total"] - (8 * results["win_block"]
                                + 4 * results["glob_block"]
                                + results["patch_embed"]
                                + results["neck_vary"]), 3)
    results["full_resid"] = round(
        results["deepencoder_full"] - (results["sam_total"]
                                       + results["clip_total"]
                                       + results["projector"]), 3)
    outp.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
