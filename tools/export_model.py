#!/usr/bin/env python
"""Export AOT serving artifacts (StableHLO bundles) for deployment.

Beyond-reference tool: serializes the fully-fused greedy-generate and
prefix-encode programs with `jax.export` so a serving host runs them
without the model code or a re-trace (see lvv_tpu/inference/export.py).

  python tools/export_model.py --config configs/vqa_nuscenes_serving.json \
      --out bundles/serving_b8 --batch 8 --prompt-len 48 --new-tokens 32

Weights ship separately (orbax checkpoint) and are call arguments; one
bundle serves any checkpoint of the same architecture.
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="model config JSON")
    p.add_argument("--out", required=True, help="bundle output dir")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prompt-len", type=int, default=48)
    p.add_argument("--new-tokens", type=int, default=32)
    p.add_argument("--eos-id", type=int, default=-1)
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu or cpu,tpu (default: current)")
    p.add_argument("--set", nargs="*", default=(), dest="overrides",
                   help="dotted config overrides")
    args = p.parse_args()

    import jax

    platforms = args.platforms.split(",") if args.platforms else None
    if platforms and len(platforms) == 1:
        # kernel selection (pallas vs XLA fallback) keys off the ACTIVE
        # backend at trace time (ops/attention.py gates on
        # jax.default_backend()=="tpu"), so tracing under one platform and
        # lowering for another bakes the wrong path into the bundle — e.g.
        # non-interpret pallas custom-calls in a CPU export, which fails to
        # lower. Align the trace platform with the single requested target.
        jax.config.update("jax_platforms", platforms[0])
    elif platforms and len(platforms) > 1:
        raise SystemExit(
            "multi-platform exports are unsupported: the pallas/XLA kernel "
            "split is resolved at trace time per backend; export one bundle "
            "per platform instead")

    import jax.numpy as jnp

    from lvv_tpu.config import default_config
    from lvv_tpu.config.core import load, to_dict
    from lvv_tpu.inference.export import export_serving_bundle
    from lvv_tpu.models import VQAModel

    if args.config:
        from lvv_tpu.config.schema import VQAConfig
        cfg = load(VQAConfig, args.config, args.overrides)
    else:
        cfg = default_config()
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)
    files = export_serving_bundle(
        model, args.out, batch=args.batch, prompt_len=args.prompt_len,
        max_new_tokens=args.new_tokens, eos_id=args.eos_id,
        platforms=platforms, cfg_dict=to_dict(cfg.model))
    for k, v in files.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
