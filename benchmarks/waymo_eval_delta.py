#!/usr/bin/env python
"""Quantify the greedy-continuous vs official (Hungarian + 101-cutoff)
Waymo AP/APH delta on randomized scenes.

The native fast path (`train.waymo_eval.evaluate`) differs from the
official metric as the reference configures it
(pcdet/datasets/waymo/waymo_eval.py:92-112) in exactly two ways:
greedy score-ordered matching (vs per-cutoff Hungarian) and a continuous
PR curve (vs 101 fixed score cutoffs). `evaluate_official` implements the
official semantics natively; this script measures the distribution of
|AP_greedy - AP_official| over randomized scenes so PARITY.md can carry a
quantified claim instead of "deviations possible".

Writes benchmarks/waymo_eval_delta.json.
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

N_TRIALS = 40
FRAMES_PER_TRIAL = 4


def random_scene(rng, n_gt, n_pred, cls="Vehicle"):
    def boxes(n, jitter):
        c = rng.uniform(-40, 40, (n, 2))
        z = rng.uniform(-1, 1, (n, 1))
        wlh = rng.uniform(1.5, 5.0, (n, 3))
        yaw = rng.uniform(-np.pi, np.pi, (n, 1))
        return np.concatenate([c, z, wlh, yaw], 1).astype(np.float32)
    gb = boxes(n_gt, 0)
    # half the preds perturb a gt (plausible detections), half are noise
    pb = gb[rng.integers(0, max(n_gt, 1), n_pred)].copy() if n_gt else \
        boxes(n_pred, 0)
    pert = rng.normal(0, 0.35, pb[:, :2].shape)
    pb[:, :2] += pert
    pb[:, 6] += rng.normal(0, 0.3, n_pred)
    noise = rng.random(n_pred) < 0.35
    pb[noise] = boxes(int(noise.sum()), 0)
    gt = {"name": np.array([cls] * n_gt),
          "gt_boxes_lidar": gb,
          "num_points_in_gt": rng.integers(0, 40, n_gt)}
    pred = {"name": np.array([cls] * n_pred),
            "boxes_lidar": pb,
            "score": rng.random(n_pred).astype(np.float32)}
    return gt, pred


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from lvv_tpu.train.waymo_eval import evaluate, evaluate_official

    rng = np.random.default_rng(0)
    deltas_ap, deltas_aph = [], []
    for t in range(N_TRIALS):
        gts, preds = [], []
        for _ in range(FRAMES_PER_TRIAL):
            # constant (n_gt, n_pred): ops.boxes.iou_3d jit-compiles per
            # shape pair — random sizes would spend the whole run compiling
            g, p = random_scene(rng, 8, 12)
            gts.append(g)
            preds.append(p)
        a = evaluate(gts, preds, classes=("Vehicle",))
        b = evaluate_official(gts, preds, classes=("Vehicle",))
        for lvl in (1, 2):
            deltas_ap.append(abs(a[f"Vehicle/L{lvl} AP"]
                                 - b[f"Vehicle/L{lvl} AP"]))
            deltas_aph.append(abs(a[f"Vehicle/L{lvl} APH"]
                                  - b[f"Vehicle/L{lvl} APH"]))
        if (t + 1) % 10 == 0:
            print(f"{t+1}/{N_TRIALS}: max dAP so far "
                  f"{max(deltas_ap):.4f}", flush=True)

    out = {
        "n_scenes": N_TRIALS * FRAMES_PER_TRIAL,
        "max_abs_dAP": round(float(np.max(deltas_ap)), 5),
        "mean_abs_dAP": round(float(np.mean(deltas_ap)), 5),
        "p95_abs_dAP": round(float(np.percentile(deltas_ap, 95)), 5),
        "max_abs_dAPH": round(float(np.max(deltas_aph)), 5),
        "mean_abs_dAPH": round(float(np.mean(deltas_aph)), 5),
    }
    outp = pathlib.Path(__file__).parent / "waymo_eval_delta.json"
    outp.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
