#!/usr/bin/env python
"""One REAL VQA train step on the TPU chip: correctness + time.

Purpose beyond the number: this is the only place the full training graph
(fwd + bwd through the pallas flash-attention custom VJP, fused-MLP VJP,
remat'd SAM/LLM) compiles and runs on actual TPU hardware — the CPU test
suite exercises the same graph on the XLA fallback paths only.

Writes benchmarks/train_step_bench.json: {step_ms, loss0, loss1, grad_norm}.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel
    from lvv_tpu.parallel.mesh import make_mesh
    from lvv_tpu.parallel.train_step import TrainState, make_train_step

    import dataclasses
    cfg = default_config()
    model_cfg = dataclasses.replace(cfg.model, remat=True)
    model = VQAModel(model_cfg, dtype=jnp.bfloat16)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    b, t = 1, 48
    c, (h, w) = model_cfg.bev_channels, model_cfg.bev_hw
    s = model_cfg.sam.img_size
    ids = rng.integers(0, 1000, (b, t)).astype(np.int32)
    labels = np.where(np.arange(t)[None] >= t - 16, ids, -100).astype(
        np.int32)
    batch = VQABatch(
        bev=jnp.asarray(rng.normal(size=(b, c, h, w)).astype(np.float32)),
        images=jnp.asarray(
            rng.uniform(-1, 1, (b, 6, 3, s, s)).astype(np.float32)),
        view_valid=jnp.ones((b, 6), bool),
        text_ids=jnp.asarray(ids), text_len=jnp.full((b,), t, jnp.int32),
        labels=jnp.asarray(labels),
        use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))

    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    # the REAL optimizer: multi_transform freeze plan -> adam moments exist
    # only for the trainable groups (plain adam would allocate 2x fp32
    # moments for all ~0.9B params and OOM the 16 GB chip)
    from lvv_tpu.train.optim import make_optimizer
    tx, _ = make_optimizer(cfg.train.optim, params, total_steps=100)
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(1))
    step = make_train_step(model, tx, mesh)

    out = {}
    t0 = time.perf_counter()
    state, m = step(state, batch)
    out["loss0"] = float(m["loss"])
    out["compile_plus_first_step_s"] = round(time.perf_counter() - t0, 1)
    ts = []
    for i in range(4):
        t1 = time.perf_counter()
        state, m = step(state, batch)
        float(m["loss"])             # fetch = honest completion
        ts.append(time.perf_counter() - t1)
    out["loss1"] = float(m["loss"])
    out["grad_norm"] = float(m["grad_norm"])
    out["step_ms"] = round(float(np.median(ts)) * 1e3, 1)
    (pathlib.Path(__file__).parent / "train_step_bench.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
