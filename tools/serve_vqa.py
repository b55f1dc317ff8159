#!/usr/bin/env python
"""VQA serving daemon — HTTP JSON endpoint over the dynamic-batching
ServingEngine (lvv_tpu/inference/server.py).

The reference ships only an offline CLI (src/encoder-decoder/infer.py);
this is the deployment front-end: concurrent HTTP clients are coalesced
into batched device programs by the engine, so throughput scales with
traffic (measured batch-8 ~1.36x batch-1 frames/s, benchmarks/
serving_bench.py).

    python tools/serve_vqa.py --checkpoint runs/ckpt --port 8000

    POST /v1/vqa      {"question": str, "bev_path": str[, "cam_paths": [...]]}
                   -> {"answer": str, "latency_s": float}
    GET  /v1/stats -> engine telemetry (batches, sizes, p50 latency)
    GET  /healthz  -> 200 once the model is warm

Uses only stdlib http.server (ThreadingHTTPServer: one thread per
connection; the engine serializes device work and batches co-arrivals).
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(engine, bev_root: _pathlib.Path):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet default access log
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/v1/stats":
                self._send(200, engine.stats())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/vqa":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                bev_path = bev_root / req["bev_path"]
                bev = np.load(bev_path).astype(np.float32)
                t0 = time.perf_counter()
                kw = {}
                if getattr(engine, "prefix_cache_size", 0):
                    # frame_id (default: the bev path) keys the prefix
                    # cache when the server runs with --prefix-cache
                    kw["frame_id"] = req.get("frame_id", req["bev_path"])
                fut = engine.submit_text(req["question"], bev,
                                         req.get("cam_paths"), **kw)
                _, text = fut.result()
                self._send(200, {"answer": text,
                                 "latency_s": round(
                                     time.perf_counter() - t0, 4)})
            except FileNotFoundError as e:
                self._send(400, {"error": f"bev not found: {e}"})
            except Exception as e:
                self._send(500, {"error": repr(e)})

    return Handler


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--bev-root", default=".",
                   help="directory bev_path values are resolved against")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=4.0)
    p.add_argument("--max-new-tokens", type=int, default=96)
    p.add_argument("--quantize-llm", dest="quantize_llm",
                   action="store_true", default=True,
                   help="weight-only int8 LLM tree for the decode scan "
                        "(default ON since r5: 6.57 vs 5.96 frames/s)")
    p.add_argument("--no-quantize-llm", dest="quantize_llm",
                   action="store_false")
    p.add_argument("--fused-decode", dest="fused_decode",
                   action="store_true", default=True,
                   help="packed-matmul decode engine (best p50 and "
                        "throughput, token-identical; --no-fused-decode "
                        "reverts to the flax decode scan)")
    p.add_argument("--no-fused-decode", dest="fused_decode",
                   action="store_false")
    p.add_argument("--prefix-cache", type=int, default=0, metavar="N",
                   help="cache N frames' encoded prefixes: repeat "
                        "questions about a frame skip the sensor encode")
    p.add_argument("--engine", choices=("batch", "continuous"),
                   default="batch",
                   help="batch = bucket-synchronous ServingEngine; "
                        "continuous = slot-slab rolling admissions")
    p.add_argument("--chunk-steps", type=int, default=8,
                   help="continuous engine: decode tokens per chunk")
    args = p.parse_args()

    from lvv_tpu.inference import ModelLoader
    from lvv_tpu.inference.server import ServingEngine
    from lvv_tpu.utils import enable_compile_cache

    enable_compile_cache()   # warm restarts skip the 6-10 min XLA compile
    loader = ModelLoader(args.checkpoint, args.tokenizer)
    model, params = loader.load_all()
    params_decode = None
    if args.quantize_llm:
        if args.fused_decode:
            from lvv_tpu.models import prepare_serving_params_fused
            params_decode = prepare_serving_params_fused(model, params)
        else:
            from lvv_tpu.models import prepare_serving_params
            params_decode = prepare_serving_params(params)

    if args.engine == "continuous":
        if args.prefix_cache:
            raise SystemExit("--prefix-cache is only supported by "
                             "--engine batch (the continuous engine does "
                             "not cache prefixes yet)")
        from lvv_tpu.inference import ContinuousServingEngine
        engine = ContinuousServingEngine(
            model, params, loader.tokenizer, slots=args.max_batch,
            chunk_steps=args.chunk_steps,
            max_new_tokens=args.max_new_tokens,
            params_decode=params_decode)
    else:
        engine = ServingEngine(
            model, params, loader.tokenizer, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            max_new_tokens=args.max_new_tokens,
            params_decode=params_decode,
            prefix_cache_size=args.prefix_cache)

    srv = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(engine, _pathlib.Path(args.bev_root)))
    print(f"serving on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        engine.close()


if __name__ == "__main__":
    main()
