#!/usr/bin/env python
"""Detector forward vs train-step cost on TPU (sparse-conv autodiff tax).

Round-3 planning data: ROUND_NOTES asks whether a custom VJP for the
sparse convs (transpose-rulebook reuse) is worth building. This measures
the VoxelNeXt detector forward and loss+grad step at half product scale
(0.15 m voxels over +-54 m, 60k voxel capacity — full scale compiles >10
min on this 1-core host) and prints the bwd/fwd ratio: autodiff already
saves the gather indices as residuals, so a ratio near the theoretical
~2-3x means a hand VJP would buy little.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np


def main():
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    from lvv_tpu.config import default_config
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.models.voxelnext_loss import voxelnext_loss

    cfg = default_config()
    full = os.environ.get("LVV_DETM_FULL", "0") == "1"
    if full:
        # FLAGSHIP scale (cbgs_voxel0075_voxelnext.yaml:6,61,108): 0.075 m
        # voxels over +-54 m, stride-8 180x180 BEV, 10-sweep-class cloud.
        # Capacities from the measured realistic-surface demand
        # (capacity_stress.json surface row) + headroom.
        vox = dataclasses.replace(cfg.voxelize,
                                  max_points=300000, max_voxels=160000)
        det_cfg = dataclasses.replace(
            cfg.model.voxelnext,
            capacity_schedule=(120000, 60000, 30000, 15000, 8000))
        scale_tag = "0.075m voxels, 160k cap, 300k points (flagship)"
        n = 300000
    else:
        vox = dataclasses.replace(cfg.voxelize,
                                  voxel_size=(0.15, 0.15, 0.4),
                                  max_points=150000, max_voxels=60000)
        det_cfg = dataclasses.replace(
            cfg.model.voxelnext,
            capacity_schedule=(45000, 23000, 12000, 6000, 3000))
        scale_tag = "0.15m voxels, 60k cap, 120k points"
        n = 120000
    det = build_detector("VoxelNeXt", det_cfg, vox)

    rng = np.random.default_rng(0)
    pts = np.zeros((vox.max_points, 4), np.float32)
    # surface-ish cloud: radial distances with ground + structure bands
    ang = rng.uniform(0, 2 * np.pi, n)
    r = np.abs(rng.normal(18, 12, n)).clip(2, 53)
    pts[:n, 0] = r * np.cos(ang)
    pts[:n, 1] = r * np.sin(ang)
    pts[:n, 2] = rng.choice([-1.6, -0.5, 0.4], n) + rng.normal(0, 0.2, n)
    pts[:n, 3] = rng.uniform(0, 1, n)
    points = jnp.asarray(pts)
    num = jnp.int32(n)
    gt = jnp.zeros((32, 9)).at[:4, :7].set(jnp.asarray(
        [[10, 5, -1, 4.5, 2, 1.6, 0.3], [-20, 8, -1, 4.5, 2, 1.6, 1.2],
         [5, -15, -1, 6.5, 2.5, 2.5, 0.0], [30, 2, -1, 0.8, 0.8, 1.7, 0]]))
    gl = jnp.zeros((32,), jnp.int32)
    gm = jnp.zeros((32,), bool).at[:4].set(True)

    params = det.init(jax.random.PRNGKey(0), points, num)

    fwd = jax.jit(lambda p, x, n_: det.apply(p, x, n_)["preds"]["hm"]
                  .features)

    def loss_fn(p):
        out = det.apply(p, points, num)
        loss, _ = voxelnext_loss(out["preds"], out["bev_sparse"], gt, gl,
                                 gm, det_cfg, vox,
                                 stride=det_cfg.spatial_stride)
        return loss

    grad = jax.jit(jax.grad(loss_fn))

    def timed(fn, *xs, iters=4, warmup=2):
        for _ in range(warmup):
            np.asarray(jax.tree_util.tree_leaves(fn(*xs))[0])
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(fn(*xs))[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_fwd = timed(fwd, params, points, num)
    t_step = timed(grad, params)
    out = {"fwd_ms": round(t_fwd * 1e3, 1),
           "loss_grad_ms": round(t_step * 1e3, 1),
           "bwd_over_fwd": round(t_step / max(t_fwd, 1e-9), 2),
           "scale": scale_tag}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        out["hbm_peak_gb"] = round(
            ms.get("peak_bytes_in_use", 0) / 2 ** 30, 2)
    except Exception:
        pass
    # merge into the committed artifact: half-scale and full-scale rows
    # coexist under distinct keys
    artifact = pathlib.Path(__file__).parent / "detector_train_micro.json"
    prior = {}
    if artifact.exists():
        prior = json.loads(artifact.read_text())
        if "fwd_ms" in prior:     # legacy flat layout -> half_scale row
            prior = {"half_scale": prior}
    prior["full_scale" if full else "half_scale"] = out
    artifact.write_text(json.dumps(prior, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
