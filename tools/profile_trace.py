#!/usr/bin/env python
"""jax.profiler trace capture (SURVEY.md §5 tracing parity: the TPU-native
replacement for the reference's AverageMeter instrumentation + tensorboardX).

Captures a Perfetto/TensorBoard trace of N benchmark iterations:
    python tools/profile_trace.py --out /tmp/trace --what generate
View with TensorBoard's profile plugin or ui.perfetto.dev.
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--what", choices=["generate", "forward", "detector"],
                   default="generate")
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from lvv_tpu.config import default_config, tiny_config
    from lvv_tpu.models import VQABatch, VQAModel, greedy_generate
    from lvv_tpu.utils import astype_tree

    cfg = tiny_config() if args.tiny else default_config()
    model = VQAModel(cfg.model, dtype=jnp.bfloat16 if not args.tiny
                     else jnp.float32)
    rng = np.random.default_rng(0)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    bev = jnp.asarray(rng.normal(size=(1, c, h, w)).astype(np.float32))
    images = jnp.asarray(rng.uniform(-1, 1, (1, 6, 3, s, s))
                         .astype(np.float32))
    vv = jnp.ones((1, 6), bool)
    prompt = jnp.asarray(rng.integers(0, 500, (1, 16)), jnp.int32)
    plen = jnp.full((1,), 16, jnp.int32)
    batch = VQABatch(bev=bev, images=images, view_valid=vv,
                     text_ids=prompt, text_len=plen,
                     labels=jnp.full_like(prompt, -100),
                     use_vision=jnp.asarray(True),
                     use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    if not args.tiny:
        params = jax.device_put(astype_tree(params, jnp.bfloat16))

    if args.what == "generate":
        def run():
            t, _ = greedy_generate(model, params, bev, images, vv, prompt,
                                   plen, max_new_tokens=16, eos_id=2)
            return np.asarray(t)
    elif args.what == "forward":
        f = jax.jit(lambda p, b: model.apply({"params": p}, b)[0])

        def run():
            return np.asarray(f(params, batch))
    else:
        from lvv_tpu.models.registry import build_detector
        det = build_detector("VoxelNeXt", cfg.model.voxelnext, cfg.voxelize)
        pts = jnp.asarray(rng.uniform(-8, 8, (cfg.voxelize.max_points, 4))
                          .astype(np.float32))
        dp = det.init(jax.random.PRNGKey(0), pts, jnp.int32(1000))
        g = jax.jit(lambda p, x: det.apply(p, x, jnp.int32(1000))
                    ["bev_dense"])

        def run():
            return np.asarray(g(dp, pts))

    run()  # compile outside the trace
    out = pathlib = args.out
    with jax.profiler.trace(out):
        for _ in range(args.iters):
            run()
    print(f"trace written to {out} (open with TensorBoard profile plugin "
          f"or perfetto)")


if __name__ == "__main__":
    main()
