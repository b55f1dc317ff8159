#!/usr/bin/env python
"""VQA trainer soak: the ASSEMBLED training loop on real TPU hardware.

Unit tests cover each trainer piece in isolation (tests/test_train_loop.py);
this harness exercises the whole product loop in one place, the way a user
runs it (reference workflow: src/encoder-decoder/train.py):

  1. fabricates a synthetic nuScenes-caption/grounding dataset on disk
     (BEV feature .npy per sample + caption/grounding JSONs; camera views
     absent -> the loader marks them invalid and the model zero-fills,
     exercising the failure-recovery path at the same time)
  2. launches `tools/train_vqa.py` as a subprocess on the FULL flagship
     config (SAM-B/CLIP-L/Qwen-0.5B, bf16) for 2 epochs with step
     checkpoints + pruning + val + inference sampling + TensorBoard events
  3. SIGTERMs it mid-epoch-1 after the first step checkpoint, relaunches
     the same command, and asserts auto-resume continues from the saved
     step (mid-epoch skip) to completion
  4. records steps/s and the artifact listing to benchmarks/train_soak.json

Run on the TPU host: python benchmarks/train_soak.py
"""
from __future__ import annotations

import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
OUT = pathlib.Path(__file__).parent / "train_soak.json"
N_SAMPLES = 40
EPOCHS = 2
BATCH = 4


def fabricate(root: pathlib.Path, cfg_path: pathlib.Path):
    from lvv_tpu.config import default_config, override, save

    cfg = default_config()
    bev_dir = root / "bev"
    bev_dir.mkdir(parents=True, exist_ok=True)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    rng = np.random.default_rng(0)
    cap, grd = [], []
    for i in range(N_SAMPLES):
        tok = f"tok{i:03d}"
        np.save(bev_dir / f"{tok}.npy",
                rng.normal(size=(c, h, w)).astype(np.float16))
        cap.append({"sample_token": tok,
                    "question": f"What is happening in scene {i}?",
                    "answer": f"Vehicle {i} is moving through the "
                              f"intersection near marker {i % 7}."})
        grd.append({"sample_token": tok, "question": "Where is the car?",
                    "answer_lidar": "[1, 2, 0, 4, 2, 1.5, 0.1]",
                    "template_type": "det_area"})
    (root / "cap.json").write_text(json.dumps(cap))
    (root / "grd.json").write_text(json.dumps(grd))

    for k, v in {
        "data.bev_features_dir": str(bev_dir),
        "data.caption_json": str(root / "cap.json"),
        "data.grounding_json": str(root / "grd.json"),
        "data.val_fraction": 0.15,
        "train.epochs": EPOCHS,
        "train.batch_size": BATCH,
        "train.max_prompt_tokens": 32,
        "train.max_answer_tokens": 24,
        "train.save_every_steps": 5,
        "train.keep_last_ckpts": 2,
        "train.log_every": 2,
        "train.inference_samples": 2,
        "train.output_dir": str(root / "run"),
    }.items():
        cfg = override(cfg, k, v)
    save(cfg, cfg_path)
    return cfg


def launch(cfg_path):
    return subprocess.Popen(
        [sys.executable, str(REPO / "tools" / "train_vqa.py"),
         "--config", str(cfg_path)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def steps_soak(n_steps: int):
    """In-process >=N-step flagship soak (VERDICT r4 ask #5): per-window
    step time drift, recompile count after step 1 (any is a bug), HBM
    growth, loss curve. Writes benchmarks/train_soak.json under
    "steps_soak"."""
    import logging

    sys.path.insert(0, str(REPO))
    root = pathlib.Path(os.environ.get("LVV_SOAK_DIR", "/tmp/lvv_soak_s"))
    cfg_path = root / "soak_config.json"
    root.mkdir(parents=True, exist_ok=True)
    fabricate(root, cfg_path)

    import jax
    jax.config.update("jax_log_compiles", True)
    compile_log = []

    class _H(logging.Handler):
        def emit(self, rec):
            m = rec.getMessage()
            if "ompil" in m:           # "Compiling <fn> ..." / "Compilation"
                compile_log.append(m.split("\n")[0][:120])
    h = _H()
    for name in ("jax._src.interpreters.pxla", "jax._src.dispatch",
                 "jax._src.compiler"):
        logging.getLogger(name).addHandler(h)
        logging.getLogger(name).setLevel(logging.DEBUG)

    from lvv_tpu.config import VQAConfig, load, override
    from lvv_tpu.parallel import shard_batch
    from lvv_tpu.train.trainer import Trainer
    from lvv_tpu.utils import enable_compile_cache
    enable_compile_cache()
    cfg = load(VQAConfig, str(cfg_path), [])
    # flagship training memory envelope on one v5e: remat + batch 2
    # (batch 4 without remat OOMs; train_step_bench.py measured the
    # remat step at 343 ms/b1)
    cfg = override(cfg, "model.remat", True)
    cfg = override(cfg, "train.batch_size", 2)
    tr = Trainer(cfg)   # __init__ builds state + the jitted train step

    def raw_stream():
        epoch = 0
        while True:
            for b in tr._batches(tr.train_idx, epoch):
                yield b
            epoch += 1

    # product-loop ingest: collate + device_put 2 batches ahead on a
    # worker thread (data/prefetch.py) — without it the soak measures the
    # ~33 MB/batch host->device upload through the axon relay (~0.8 s)
    # instead of the device step
    from lvv_tpu.data.prefetch import Prefetcher
    stream = iter(Prefetcher(raw_stream(),
                             prepare=lambda b: shard_batch(b, tr.mesh),
                             depth=2))
    results = {"n_steps": n_steps}
    # step 1 (all compiles land here)
    t0 = time.time()
    tr.state, metrics = tr.train_step(tr.state, next(stream))
    first_loss = float(metrics["loss"])
    results["step1_s"] = round(time.time() - t0, 1)
    compiles_after_warm = len(compile_log)

    window = 10
    win_times, losses, hbm = [], [first_loss], []
    t_prev = time.perf_counter()
    for s in range(1, n_steps):
        tr.state, metrics = tr.train_step(tr.state, next(stream))
        if (s + 1) % window == 0:
            loss = float(metrics["loss"])     # fetch = sync point
            now = time.perf_counter()
            win_times.append((now - t_prev) / window)
            t_prev = now
            losses.append(loss)
            try:
                ms = jax.local_devices()[0].memory_stats() or {}
                hbm.append(round(ms.get("bytes_in_use", 0) / 2 ** 30, 3))
            except Exception:
                pass
    new_compiles = compile_log[compiles_after_warm:]
    results.update({
        "step_s_first3_windows": [round(t, 4) for t in win_times[:3]],
        "step_s_last3_windows": [round(t, 4) for t in win_times[-3:]],
        "step_s_median": round(float(np.median(win_times)), 4),
        "drift_pct": round(100 * (np.mean(win_times[-3:])
                                  / np.mean(win_times[:3]) - 1), 2),
        "recompiles_after_step1": len(new_compiles),
        "recompile_msgs": new_compiles[:5],
        "loss_first": losses[0], "loss_last": losses[-1],
        "loss_every_10": [round(x, 4) for x in losses[::5]],
        "hbm_gb_first": hbm[0] if hbm else None,
        "hbm_gb_last": hbm[-1] if hbm else None,
        "hbm_growth_gb": (round(hbm[-1] - hbm[0], 3) if len(hbm) > 1
                          else None),
    })
    prior = json.loads(OUT.read_text()) if OUT.exists() else {}
    prior["steps_soak"] = results
    OUT.write_text(json.dumps(prior, indent=1))
    print(json.dumps(results, indent=1))


def main():
    sys.path.insert(0, str(REPO))
    n_steps = int(os.environ.get("LVV_SOAK_STEPS", "0"))
    if n_steps:
        steps_soak(n_steps)
        return
    root = pathlib.Path(os.environ.get("LVV_SOAK_DIR", "/tmp/lvv_soak"))
    cfg_path = root / "soak_config.json"
    root.mkdir(parents=True, exist_ok=True)
    fabricate(root, cfg_path)
    run_dir = root / "run"

    results = {"n_samples": N_SAMPLES, "epochs": EPOCHS, "batch": BATCH}

    # ---- phase 1: run until the first step checkpoint exists, then kill
    p = launch(cfg_path)
    ckpt_dir = run_dir / "checkpoints"
    t0 = time.time()
    lines = []
    killed_at = None
    while p.poll() is None:
        line = p.stdout.readline()
        if line:
            lines.append(line)
            sys.stdout.write("[1] " + line)
        steps = sorted(int(d.name.split("_")[-1])
                       for d in ckpt_dir.glob("step_*")) \
            if ckpt_dir.exists() else []
        if steps and steps[-1] >= 5 and killed_at is None:
            killed_at = steps[-1]
            p.send_signal(signal.SIGTERM)
            try:
                p.wait(timeout=120)
            except subprocess.TimeoutExpired:
                p.kill()
            break
        if time.time() - t0 > 3600:
            p.kill()
            raise SystemExit("phase 1 timed out (no step ckpt after 1 h)")
    results["killed_at_step"] = killed_at
    results["phase1_s"] = round(time.time() - t0, 1)

    # ---- phase 2: same command; auto-resume must pick up the step ckpt
    t1 = time.time()
    p = launch(cfg_path)
    out, _ = p.communicate(timeout=5400)
    sys.stdout.write(out)
    results["phase2_s"] = round(time.time() - t1, 1)
    results["phase2_rc"] = p.returncode
    resumed = [ln for ln in out.splitlines() if "resum" in ln.lower()]
    results["resume_lines"] = resumed[:4]

    # ---- steps/s from the trainer's epoch records
    # ("epoch_seconds": wall for the epoch's step loop)
    import re
    recs = [json.loads(m.group(1)) for m in
            re.finditer(r"\[epoch \d+\] (\{.*\})", out)]
    if recs:
        last = recs[-1]
        steps_per_epoch = max(1, int(N_SAMPLES * 0.85) // BATCH)
        results["epoch_seconds_last"] = last.get("epoch_seconds")
        if last.get("epoch_seconds"):
            results["steps_per_s"] = round(
                steps_per_epoch / last["epoch_seconds"], 3)
        results["train_loss_by_epoch"] = [r.get("train_loss") for r in recs]
        results["val_loss_by_epoch"] = [r.get("val_loss") for r in recs]

    # ---- artifact inventory: ckpts (pruned to keep_last + best), TB
    # events, inference samples
    arts = {}
    if ckpt_dir.exists():
        arts["checkpoints"] = sorted(d.name for d in ckpt_dir.iterdir())
    tb = list(run_dir.rglob("events.out.tfevents.*"))
    arts["tb_event_files"] = [str(f.relative_to(run_dir)) for f in tb]
    samples = list(run_dir.rglob("*inference*")) + \
        list(run_dir.rglob("*sample*"))
    arts["inference_artifacts"] = sorted(
        str(f.relative_to(run_dir)) for f in samples)[:20]
    plots = list(run_dir.rglob("*.png")) + list(run_dir.rglob("*.json"))
    arts["other"] = sorted(str(f.relative_to(run_dir)) for f in plots)[:20]
    results["artifacts"] = arts

    prior = json.loads(OUT.read_text()) if OUT.exists() else {}
    prior["resume_soak"] = results
    OUT.write_text(json.dumps(prior, indent=1))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
