"""Benchmark: end-to-end VQA inference frames/sec on one TPU chip.

Measures the north-star metric (BASELINE.json: "VQA frames/sec/chip
end-to-end; p50 latency LiDAR+image->answer"): one nuScenes frame = 6
camera views (1024x1024) + one precomputed BEV grid [128,180,180] + a
question, greedy-decoding `NEW_TOKENS` answer tokens with the full flagship
stack (SAM-B -> CLIP-L -> projector -> adapter -> VATVision; VATLiDAR; Qwen
2.5-0.5B prefill + KV-cached decode) in bfloat16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against the reference PyTorch pipeline's measured
CPU throughput (benchmarks/reference_cpu.py writes
benchmarks/reference_cpu.json); the reference publishes no numbers
(SURVEY.md §6), so until that measurement exists vs_baseline falls back to
REFERENCE_CPU_FPS_FALLBACK (a conservative upper bound for torch-CPU on
this stack).
"""
from __future__ import annotations

import json
import os
import pathlib
import time

import numpy as np

NEW_TOKENS = 32
WARMUP = 2
ITERS = 5
# Conservative fallback: reference torch pipeline on CPU is < 0.1 frame/s
# (SAM-B + CLIP-L on 6 MP-scale views alone is >200 GFLOP/frame).
REFERENCE_CPU_FPS_FALLBACK = 0.1


def main():
    import jax
    import jax.numpy as jnp
    from lvv_tpu.config import default_config
    from lvv_tpu.models import VQAModel, greedy_generate
    from lvv_tpu.utils import enable_compile_cache

    # persistent compile cache: a fresh bench process reuses prior XLA
    # compilations (full-model compiles are 6-10 min via the axon relay)
    enable_compile_cache()

    cfg = default_config()
    if os.environ.get("LVV_BENCH_QUANT8", "1") == "1":
        # serving mode: W8A8 the frozen SAM trunk (int8 MXU path; <1.5%
        # activation rel err, tests/test_quant.py; measured kernel-level
        # 1.3-1.6x, benchmarks/int8_fused_micro.json)
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            sam=dataclasses.replace(cfg.model.sam, quant8=True),
            clip=dataclasses.replace(cfg.model.clip, quant8=True)))
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)

    b, t = 1, 24
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    rng = np.random.default_rng(0)
    bev = jnp.asarray(rng.normal(size=(b, c, h, w)).astype(np.float32))
    images = jnp.asarray(rng.uniform(-1, 1, (b, 6, 3, s, s))
                         .astype(np.float32))
    view_valid = jnp.ones((b, 6), bool)
    prompt = jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32)
    plen = jnp.full((b,), t, jnp.int32)

    from lvv_tpu.models import VQABatch
    init_batch = VQABatch(bev=bev, images=images, view_valid=view_valid,
                          text_ids=prompt, text_len=plen,
                          labels=jnp.full_like(prompt, -100),
                          use_vision=jnp.asarray(True),
                          use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), init_batch)["params"]
    # inference-only: bf16 weights halve HBM traffic (decode is
    # bandwidth-bound over the LLM params)
    from lvv_tpu.utils import astype_tree
    params = jax.device_put(astype_tree(params, jnp.bfloat16))
    params_decode = None
    if os.environ.get("LVV_BENCH_LLM_INT8", "1") == "1":
        # weight-only int8 LLM for the decode scan only (prefill keeps the
        # float tree — XLA's fused bf16 chains win there). Default ON since
        # round 5: with the output-side-scale formulation (015e769) plus the
        # scan-carry dtype fix, the e2e A/B measures 6.57 vs 5.96 frames/s
        # (the r2 "int8 decode loses" verdict was the old formulation, and
        # the post-fix path crashed before it could ever be timed).
        if os.environ.get("LVV_BENCH_DECODE_FUSED", "1") == "1":
            # packed-matmul decode engine (models/decode_fused.py):
            # 4 matmuls/layer instead of 7, token-identical (tested).
            # Default since r5: 6.896 vs 6.857 frames/s and the best p50
            # (0.176 s) once the pack stopped shipping beside a dead
            # quantized tree (BASELINE.md round-5 A/B rows)
            from lvv_tpu.models import prepare_serving_params_fused
            params_decode = jax.device_put(
                prepare_serving_params_fused(model, params))
        else:
            from lvv_tpu.models import prepare_serving_params
            params_decode = jax.device_put(prepare_serving_params(params))

    def run():
        toks, lens = greedy_generate(
            model, params, bev, images, view_valid, prompt, plen,
            max_new_tokens=NEW_TOKENS, eos_id=2,
            params_decode=params_decode)
        # fetch values: through the axon relay, block_until_ready returns
        # before execution completes — only a host copy is honest timing
        return np.asarray(toks)

    for _ in range(WARMUP):
        run()
    # per-call latency (each iteration pays the ~31 ms axon relay
    # roundtrip for its result fetch)
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    # pipelined throughput: the serving loop runs frames through ONE
    # resident multi-frame program (greedy_generate_multi scans G frames
    # per dispatch — the ServingEngine multi_groups mechanism), so the
    # per-dispatch host+relay cost (~10 ms/frame when dispatching frames
    # one by one, benchmarks/serving_gap_bisect.json) amortizes G-fold
    from lvv_tpu.models import greedy_generate_multi
    g = int(os.environ.get("LVV_BENCH_STREAM_G", "8"))
    stack = lambda x: jnp.stack([x] * g)

    def dispatch_multi():
        return greedy_generate_multi(
            model, params, stack(bev), stack(images), stack(view_valid),
            stack(prompt), stack(plen), max_new_tokens=NEW_TOKENS,
            eos_id=2, params_decode=params_decode)[0]
    np.asarray(dispatch_multi())   # warm (compile)
    t0 = time.perf_counter()
    outs = [dispatch_multi() for _ in range(2)]
    np.asarray(outs[-1])
    stream = (time.perf_counter() - t0) / (2 * g)
    fps = b / min(stream, p50)

    ref_path = pathlib.Path(__file__).parent / "benchmarks" / \
        "reference_cpu.json"
    ref_fps = REFERENCE_CPU_FPS_FALLBACK
    if ref_path.exists():
        ref_fps = json.loads(ref_path.read_text()).get(
            "fps", REFERENCE_CPU_FPS_FALLBACK)

    print(json.dumps({
        "metric": "vqa_e2e_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 2),
        "p50_latency_s": round(p50, 4),
    }))


if __name__ == "__main__":
    main()
