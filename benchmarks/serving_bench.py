#!/usr/bin/env python
"""Batched serving throughput: frames/s vs batch size on one chip.

BASELINE.json config #5 ("batched pipeline"): single-frame latency
(bench.py) is decode-latency-bound — 32 sequential matvec steps at ~1 GB
of bf16 weights each — so batching the whole pipeline (6B views through
SAM/CLIP, B BEV grids, B-row decode steps) raises frames/s/chip nearly
linearly until the image tower saturates the MXU. The reference serves
batches as a sequential Python loop (src/encoder-decoder/inference/
inference_engine.py:306-334 generate_batch), so its throughput ~= 1/latency.

Writes benchmarks/serving_bench.json: {batch: {s_per_batch, frames_s}}.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

NEW_TOKENS = 32
# B=16/32 probe HBM headroom: 6B views of 1024^2 through SAM dominate
# activation memory; override with LVV_BENCH_BATCHES=16,32
BATCHES = tuple(
    int(x) for x in os.environ.get("LVV_BENCH_BATCHES", "1,2,4,8").split(","))


def main():
    import jax
    import jax.numpy as jnp

    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQABatch, VQAModel, greedy_generate
    from lvv_tpu.utils import astype_tree, enable_compile_cache

    enable_compile_cache()

    import os
    cfg = default_config()
    if os.environ.get("LVV_BENCH_QUANT8", "1") == "1":
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            sam=dataclasses.replace(cfg.model.sam, quant8=True),
            clip=dataclasses.replace(cfg.model.clip, quant8=True)))
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)
    # B>=16: batched 6-view encode exceeds v5e HBM (16.9G > 15.75G at B=16
    # measured); the sequential-view mode bounds live memory to one view's
    # buffers. Identical param tree, so the same params serve both models.
    import dataclasses as _dc
    # LVV_BENCH_VIEWS_CHUNK: 1 = sequential (default), 2/3 = partial
    # batching — the memory/throughput dial for the B>=16 regime
    _vc = int(os.environ.get("LVV_BENCH_VIEWS_CHUNK", "1"))
    model_seq = VQAModel(_dc.replace(cfg.model, views_chunk=_vc),
                         dtype=jnp.bfloat16)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    t = 24
    rng = np.random.default_rng(0)

    outp = pathlib.Path(__file__).parent / "serving_bench.json"
    # merge into prior measurements so a partial batch sweep (e.g.
    # LVV_BENCH_BATCHES=16,32) extends rather than clobbers the table
    results = json.loads(outp.read_text()) if outp.exists() else {}

    params = None
    for b in BATCHES:
        bev = jnp.asarray(rng.normal(size=(b, c, h, w)).astype(np.float32))
        images = jnp.asarray(
            rng.uniform(-1, 1, (b, 6, 3, s, s)).astype(np.float32))
        view_valid = jnp.ones((b, 6), bool)
        prompt = jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32)
        plen = jnp.full((b,), t, jnp.int32)
        if params is None:
            # init at B=1 regardless of the sweep (a large-B init forward
            # would itself OOM on the batched path); params are B-agnostic
            init_batch = VQABatch(
                bev=bev[:1], images=images[:1], view_valid=view_valid[:1],
                text_ids=prompt[:1], text_len=plen[:1],
                labels=jnp.full_like(prompt[:1], -100),
                use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
            params = model.init(jax.random.PRNGKey(0), init_batch)["params"]
            params = jax.device_put(astype_tree(params, jnp.bfloat16))
            if os.environ.get("LVV_BENCH_LLM_INT8", "1") == "1":
                # weight-only int8 decode tree: default ON since round 5
                # (see bench.py — 6.57 vs 5.96 frames/s at B=1 after the
                # formulation + scan-carry fixes)
                if os.environ.get("LVV_BENCH_DECODE_FUSED", "0") == "1":
                    from lvv_tpu.models import prepare_serving_params_fused
                    globals()["_pq"] = jax.device_put(
                        prepare_serving_params_fused(model, params))
                else:
                    from lvv_tpu.models import prepare_serving_params
                    globals()["_pq"] = jax.device_put(
                        prepare_serving_params(params))

        # LVV_BENCH_SEQ_FROM: batch size at which the memory-lean
        # sequential/chunked-view encode takes over (engine modes keep TWO
        # batches in flight via depth-2 pipelining, so their activation
        # pressure doubles vs the raw rows — see BASELINE.md engine notes)
        seq_from = int(os.environ.get("LVV_BENCH_SEQ_FROM", "16"))
        m = model_seq if b >= seq_from else model
        # A/B runs that force the lean encode below its default threshold
        # record under suffixed keys so canonical rows stay comparable
        sfx = "_seq" if (m is model_seq and b < 16) else ""

        def run():
            toks, _ = greedy_generate(m, params, bev, images,
                                      view_valid, prompt, plen,
                                      max_new_tokens=NEW_TOKENS, eos_id=-1,
                                      params_decode=globals().get("_pq"))
            return np.asarray(toks)  # device->host fetch = real completion

        for _ in range(2):
            run()
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        results[str(b) + sfx] = {"s_per_batch": round(sec, 4),
                           "frames_s": round(b / sec, 3)}
        outp.write_text(json.dumps(results, indent=1))
        print(f"batch {b}: {sec*1e3:.1f} ms -> {b/sec:.2f} frames/s",
              flush=True)

        g_multi = int(os.environ.get("LVV_BENCH_MULTI", "0"))
        if g_multi > 1:
            # resident multi-batch program: G whole batches per dispatch
            # (lax.scan over the group axis). Amortizes the ~170 ms/call
            # host+relay dispatch overhead G-fold — the device-side stage
            # sum says 8.1 fps at B=8 (batch_stage_bisect.json) while the
            # serial per-batch loop measures ~6.9.
            from lvv_tpu.models import greedy_generate_multi
            if os.environ.get("LVV_BENCH_MULTI_U8", "0") == "1":
                # wire-format inputs: u8 frames + f16 bev, preprocessed
                # per group inside the program — 4x smaller resident
                # input, the only way G>=8 fits HBM
                img_g = jnp.asarray(rng.integers(
                    0, 256, (g_multi, b, 6, s, s, 3), dtype=np.uint8))
                bev_g = jnp.stack([bev.astype(jnp.float16)] * g_multi)
            else:
                img_g = jnp.stack([images] * g_multi)
                bev_g = jnp.stack([bev] * g_multi)
            vv_g = jnp.stack([view_valid] * g_multi)
            ids_g = jnp.stack([prompt] * g_multi)
            len_g = jnp.stack([plen] * g_multi)

            def run_multi():
                toks, _ = greedy_generate_multi(
                    m, params, bev_g, img_g, vv_g, ids_g, len_g,
                    max_new_tokens=NEW_TOKENS, eos_id=-1,
                    params_decode=globals().get("_pq"))
                return toks

            np.asarray(run_multi())   # warm (compile)
            # steady state: depth-2 pipelining of multi calls
            reps = 3
            np.asarray(run_multi())
            t0 = time.perf_counter()
            outs = [run_multi() for _ in range(reps)]
            np.asarray(outs[-1])
            sec = (time.perf_counter() - t0) / reps
            u8sfx = ("_u8" if os.environ.get("LVV_BENCH_MULTI_U8", "0")
                     == "1" else "")
            key = f"{b}xG{g_multi}{sfx}{u8sfx}"
            results[key] = {
                "s_per_batch": round(sec / g_multi, 4),
                "frames_s": round(b * g_multi / sec, 3)}
            outp.write_text(json.dumps(results, indent=1))
            print(f"multi {key}: {sec*1e3:.0f} ms/{g_multi} batches -> "
                  f"{b*g_multi/sec:.2f} frames/s", flush=True)

        # engine modes ingest the PRODUCT wire format: raw uint8 camera
        # frames + f16 BEV (~25 MB/frame vs 92 MB preprocessed f32) —
        # through the axon relay (~40 MB/s host->device) the ingest link,
        # not the chip, bounds engine throughput, exactly as a saturated
        # serving host's NIC would; the raw rows above measure the
        # device-resident ceiling instead
        row_lean = dict(
            bev=np.asarray(bev[0], np.float16),
            images=rng.integers(0, 256, (6, s, s, 3), dtype=np.uint8),
            view_valid=np.asarray(view_valid[0]),
            text_ids=np.asarray(prompt[0]), text_len=t)
        if os.environ.get("LVV_BENCH_PRESTAGED", "0") == "1":
            # device-resident sensors: measures the ENGINE (scheduler +
            # chip) with ingest off the critical path. Through the axon
            # relay the host->device link runs ~40 MB/s, so the host-format
            # rows above are ingest-bound at ~1 frame/s no matter what the
            # chip does (the old engine_1=0.957 row was exactly this link,
            # mislabeled as engine throughput). A production host feeds
            # the engine from its NIC/DMA at GB/s — this mode is the
            # honest stand-in. Rows record under *_dev keys.
            import jax as _jax
            row_lean = dict(
                bev=_jax.device_put(np.asarray(bev[0], np.float16)),
                images=_jax.device_put(row_lean["images"]),
                view_valid=row_lean["view_valid"],
                text_ids=row_lean["text_ids"], text_len=t)
            sfx = sfx + "_dev"

        if os.environ.get("LVV_BENCH_ENGINE", "0") == "1":
            # steady-state throughput through the PRODUCT serving path
            # (ServingEngine: dynamic batching + depth-2 dispatch
            # pipelining) rather than a hand-rolled loop
            from lvv_tpu.inference.server import ServingEngine
            eng = ServingEngine(
                m, params, max_batch=b, max_wait_ms=30.0,
                max_new_tokens=NEW_TOKENS, eos_id=-1,
                params_decode=globals().get("_pq"),
                multi_groups=max(g_multi, 1))
            try:
                # warm every bucket the timed phase can hit (1, b, and —
                # with multi_groups — the packed G*b program: an unwarmed
                # multi bucket otherwise compiles INSIDE the timed window,
                # seen as engine_8_dev = 0.58 frames/s pure compile)
                eng.submit(**row_lean).result(timeout=900)
                for f in [eng.submit(**row_lean) for _ in range(b)]:
                    f.result(timeout=900)
                if g_multi > 1:
                    for gw in range(2, g_multi + 1):
                        futs = [eng.submit(**row_lean)
                                for _ in range(gw * b)]
                        for f in futs:
                            f.result(timeout=1800)
                n = 4 * b
                t0 = time.perf_counter()
                for f in [eng.submit(**row_lean) for _ in range(n)]:
                    f.result(timeout=900)
                esec = time.perf_counter() - t0
            finally:
                eng.close()
            results[f"engine_{b}{sfx}"] = {
                "frames_s": round(n / esec, 3),
                "batch_sizes": eng.stats()["batch_sizes"]}
            outp.write_text(json.dumps(results, indent=1))
            print(f"engine b<={b}: {n / esec:.2f} frames/s "
                  f"(batches {eng.stats()['batch_sizes']})", flush=True)

        if os.environ.get("LVV_BENCH_CONT", "0") == "1":
            # continuous-batching engine: burst of 4x slots requests;
            # answers/s + p50 latency (vs the batch-synchronous engine_b)
            from lvv_tpu.inference.continuous import ContinuousServingEngine
            eng = ContinuousServingEngine(
                m, params, slots=b, chunk_steps=8,
                max_new_tokens=NEW_TOKENS, eos_id=-1,
                params_decode=globals().get("_pq"))
            try:
                # warm EVERY admission bucket (1/2/4/...): refills after
                # early finishes land on the intermediate sizes, and a cold
                # compile of those variants otherwise bills to the timed
                # burst (seen at slots=8: p50 118 s -> 55 s across two runs
                # as the cache warmed)
                for k in eng.admit_buckets:
                    for f in [eng.submit(**row_lean) for _ in range(k)]:
                        f.result(timeout=900)
                n = 4 * b
                t0 = time.perf_counter()
                for f in [eng.submit(**row_lean) for _ in range(n)]:
                    f.result(timeout=900)
                esec = time.perf_counter() - t0
                st = eng.stats()
            finally:
                eng.close()
            results[f"cont_{b}{sfx}"] = {
                "answers_s": round(n / esec, 3),
                "p50_latency_s": round(st["p50_latency_s"], 4),
                "mean_occupancy": round(st["mean_occupancy"], 2)}
            outp.write_text(json.dumps(results, indent=1))
            print(f"continuous slots={b}:", results[f"cont_{b}{sfx}"], flush=True)

        q_per_frame = int(os.environ.get("LVV_BENCH_PREFIX_Q", "0"))
        if q_per_frame:
            # multi-question-per-frame workload (evaluation/interactive):
            # answers/s with the frame prefix cached vs re-encoded. In
            # cached mode only the FIRST question per frame ships sensors
            # (the product pattern): follow-ups are hit-only submits that
            # upload token ids alone, so neither the encode nor the
            # ~25 MB/frame ingest repeats.
            from lvv_tpu.inference.server import ServingEngine
            frames = 4
            row_noimg = dict(bev=None, images=None, view_valid=None,
                             text_ids=np.asarray(prompt[0]), text_len=t)
            for cache in (0, frames):
                eng = ServingEngine(
                    m, params, max_batch=b, max_wait_ms=30.0,
                    max_new_tokens=NEW_TOKENS, eos_id=-1,
                    prefix_cache_size=cache)
                def burst(tag):
                    futs = []
                    for f in range(frames):
                        for q in range(q_per_frame):
                            r = (row_lean if (q == 0 or not cache)
                                 else row_noimg)
                            futs.append(
                                eng.submit(**r, frame_id=f"{tag}{f}"))
                    for f_ in futs:
                        f_.result(timeout=900)
                try:
                    # warmup = one full dry pass of the timed workload
                    # under throwaway frame ids: mixed batches (one
                    # sensor-carrying miss + hit-only follow-ups) hit
                    # encode/generate program shapes — e.g. the bucket-2
                    # prefix ENCODE at b=8 — that bucket-by-bucket warming
                    # misses, and a cold compile otherwise bills to the
                    # timed window (b8_cached measured SLOWER than
                    # uncached before this, pure compile)
                    eng.submit(**row_lean,
                               frame_id="warm").result(timeout=900)
                    for f_ in [eng.submit(**row_lean, frame_id="warm")
                               for _ in range(b)]:
                        f_.result(timeout=900)
                    burst("w")
                    st0 = eng.stats()
                    t0 = time.perf_counter()
                    burst("f")
                    esec = time.perf_counter() - t0
                    st1 = eng.stats()
                finally:
                    eng.close()
                na = frames * q_per_frame
                key = f"prefixQ{q_per_frame}_b{b}{sfx}_" + \
                    ("cached" if cache else "uncached")
                # at large b a follow-up often lands in the SAME batch as
                # its frame's first question and dedups onto that donor
                # row instead of registering a hit — misses (= encodes
                # actually run) is the number that shows the saving
                results[key] = {
                    "answers_s": round(na / esec, 3),
                    "prefix_hits": st1["prefix_hits"] - st0["prefix_hits"],
                    "prefix_misses": (st1["prefix_misses"]
                                      - st0["prefix_misses"])}
                outp.write_text(json.dumps(results, indent=1))
                print(key, results[key], flush=True)


if __name__ == "__main__":
    main()
