"""ServingEngine — dynamic-batching VQA request server.

The reference serves requests one at a time: `InferenceEngine.generate_batch`
is a Python loop of single-sample `model.generate` calls
(src/encoder-decoder/inference/inference_engine.py:306-334). On TPU the
single-sample path leaves most of the chip idle — the decode matvecs sit on a
per-op latency floor and the MXU is underfed (measured in
benchmarks/serving_bench.py: batch 8 is ~1.36x the frames/s of batch 1).

This engine is the TPU-idiomatic serving runtime:

- callers `submit()` requests from any thread and get a Future;
- a worker thread drains the queue into batches: it waits at most
  `max_wait_ms` after the first request for co-travellers, up to `max_batch`;
- batches are padded up to a fixed BUCKET size (powers of two) so XLA
  compiles one program per bucket, not per batch size — static shapes are
  what keeps the jit cache small and the MXU tiled;
- one `greedy_generate` call serves the whole bucket; pad rows are clones of
  row 0 and their results are dropped.

Throughput/latency telemetry is kept in `stats()` so a deployment can tune
`max_batch`/`max_wait_ms` against its traffic.
"""
from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from ..models import (encode_prefix_fn, generate_from_prefix,
                      greedy_generate, greedy_generate_multi,
                      sample_generate)


@functools.cache
def _preprocess_batch_fn(size: int):
    """jit: [B, V, H, W, 3] uint8 camera frames -> [B, V, 3, size, size]
    float32 in [-1, 1] (the model's image format), one fused launch.

    Serving ingest lever: clients submit raw uint8 frames (4x fewer
    host->device bytes than preprocessed float32 — the transfer, not the
    matmuls, is what a serving host's ingest link sees), and the
    resize/pad/normalize runs on device (ops/image.py, replacing the
    reference's host-side PIL path deepencoder_infer.py:149-189)."""
    import jax

    from ..ops.image import preprocess_views

    return jax.jit(lambda u8: jax.vmap(
        lambda v: preprocess_views(v, size))(u8))


def _buckets_up_to(max_batch: int, multiple: int = 1) -> List[int]:
    out, b = [], multiple
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


def _text_request_arrays(model_cfg, tokenizer, question: str, cam_paths,
                         max_prompt: int = 128):
    """question/camera paths -> (images, valid, ids, length) — the shared
    text-level submit path of both serving engines."""
    s = model_cfg.sam.img_size
    from ..data.collate import pack_text
    ids, _, length, _ = pack_text(tokenizer, question, None,
                                  max_prompt=max_prompt, max_answer=0)
    images = np.zeros((6, 3, s, s), np.float32)
    valid = np.zeros((6,), bool)
    if cam_paths is not None and any(p for p in cam_paths):
        import jax.numpy as jnp
        from ..data.collate import load_views_u8
        from ..ops.image import preprocess_views
        u8, valid = load_views_u8(cam_paths)
        images = np.asarray(preprocess_views(jnp.asarray(u8), s))
    return images, valid, ids, length


def _resolve(future: Future, result=None, exc=None) -> None:
    """set_result/set_exception that survives a caller having cancelled the
    future (InvalidStateError would otherwise kill the serve thread)."""
    try:
        if exc is not None:
            future.set_exception(exc)
        else:
            future.set_result(result)
    except Exception:
        pass   # future was cancelled; drop the result


@dataclass
class _Request:
    bev: Optional[np.ndarray]        # [C, H, W] f32/f16, or None (hit-only)
    images: Optional[np.ndarray]     # [6, 3, S, S] f32 (preprocessed) or
                                     # [6, H, W, 3] u8 (raw frames), or None
    view_valid: Optional[np.ndarray]  # [6]
    text_ids: np.ndarray             # [T]
    text_len: int
    max_new_tokens: Optional[int] = None   # per-request cap (<= engine max)
    frame_id: Optional[str] = None         # prefix-cache key
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.perf_counter)


class ServingEngine:
    """Dynamic-batching server over a jitted VQA model.

    Parameters
    ----------
    model, params : the VQAModel and its parameter pytree.
    tokenizer : optional; needed only for the text-level `generate` API and
        for the default `eos_id`.
    max_batch : largest batch one device program serves (the bucket ceiling).
    max_wait_ms : how long the worker holds the first request of a batch
        waiting for more work before launching a partial bucket.
    params_decode : optional int8 tree from `prepare_serving_params`, used
        inside the decode scan only.
    mesh : optional jax.sharding.Mesh. When given, params are laid out by
        the GSPMD rules in parallel/sharding.py (LLM matmuls tensor-parallel
        over the "model" axis, rest replicated) and request batches shard
        over the "data" axis — multi-chip serving with XLA-inserted
        collectives, no code change in the model. Buckets snap to multiples
        of the data-axis size so every shard gets equal rows.
    """

    def __init__(self, model, params, tokenizer=None, *,
                 max_batch: int = 8, max_wait_ms: float = 4.0,
                 max_new_tokens: int = 32, eos_id: Optional[int] = None,
                 params_decode=None, mesh=None, pipeline_depth: int = 2,
                 sampling: Optional[dict] = None,
                 prefix_cache_size: int = 0, multi_groups: int = 1):
        if eos_id is None:
            if tokenizer is None:
                raise ValueError("pass eos_id when no tokenizer is given")
            eos_id = tokenizer.eos_id
        self.model = model
        self.mesh = mesh
        data_par = 1
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            from ..parallel.sharding import shard_params
            data_par = int(mesh.shape.get("data", 1))
            params = shard_params(params, mesh)
            if params_decode is not None:
                params_decode = shard_params(params_decode, mesh)
            self._batch_sharding = batch_sharding(mesh)
        self.params = params
        self.params_decode = params_decode
        self.tokenizer = tokenizer
        if max_batch % data_par:
            raise ValueError(f"max_batch {max_batch} must be a multiple of "
                             f"the mesh data axis ({data_par})")
        self.max_batch = int(max_batch)
        self.max_wait_ms = float(max_wait_ms)
        self.max_new_tokens = int(max_new_tokens)
        self.eos_id = int(eos_id)
        if pipeline_depth < 1:
            raise ValueError("pipeline_depth must be >= 1")
        self.pipeline_depth = int(pipeline_depth)
        # engine-level sampling config (one compiled program per setting):
        # {"temperature","top_k","top_p","seed"} -> sample_generate; None
        # -> greedy (reference validation.py:552-580 semantics)
        self.sampling = dict(sampling) if sampling else None
        self._rng = None
        if self.sampling is not None:
            if params_decode is not None:
                raise ValueError("sampling mode does not support the int8 "
                                 "params_decode tree (greedy-only lever)")
            import jax
            self._rng = jax.random.PRNGKey(
                int(self.sampling.pop("seed", 0)))
        # prefix cache: frame_id -> encoded prefix row [P, D] on device.
        # N questions about one frame pay the (dominant) sensor encode
        # once; requests without a frame_id always encode.
        self.prefix_cache_size = int(prefix_cache_size)
        if self.prefix_cache_size:
            if mesh is not None or self.sampling is not None:
                raise ValueError("prefix caching supports the single-device"
                                 " greedy path only (for now)")
            from collections import OrderedDict
            self._prefix_cache: "OrderedDict[str, object]" = OrderedDict()
        # multi_groups > 1: when the queue is >= one full bucket deep at
        # dispatch time, pack up to this many FULL max_batch buckets into
        # one resident device program (models.vqa.greedy_generate_multi) —
        # per-dispatch host/relay overhead (~170 ms/call at B=8 through the
        # axon relay, benchmarks/serving_gap_bisect.json) amortizes G-fold.
        # Greedy single-device path only (sampling/prefix/mesh fall back).
        self.multi_groups = int(multi_groups)
        if self.multi_groups > 1 and mesh is not None:
            raise ValueError("multi_groups requires single-device serving")
        self.buckets = _buckets_up_to(self.max_batch, data_par)

        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "batches": 0, "pad_rows": 0,
                       "batch_sizes": [], "latency_s": [],
                       "prefix_hits": 0, "prefix_misses": 0}
        self._closed = threading.Event()
        self._worker = threading.Thread(target=self._serve_loop,
                                        name="lvv-serving", daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- public

    def submit(self, bev, images, view_valid, text_ids,
               text_len: int, max_new_tokens: Optional[int] = None,
               frame_id: Optional[str] = None) -> Future:
        """Enqueue one request; resolves to (token_ids list, text|None).

        Arrays are single-sample (no batch dim). All requests must share the
        static shapes the engine was first called with — that is what lets
        every bucket reuse one compiled program. `max_new_tokens` caps THIS
        request's answer (the device still runs the engine-level max; the
        cap truncates at fulfillment — static shapes stay uniform).

        Ingest formats (pick one per engine; the bytes the client ships are
        what a serving host's ingest link sees):
        - `images` as float32 [6, 3, S, S] — preprocessed, model-ready;
        - `images` as uint8 [6, H, W, 3] — raw camera frames, 4x fewer
          bytes; resize/pad/normalize runs on device;
        - `bev` as float16 halves its bytes (the precompute_bev product
          format); the model casts on device.
        With prefix caching on, a request about an already-cached
        `frame_id` may pass `bev=None, images=None` — only the token ids
        travel. A cache MISS with no sensors fails that request's future
        with KeyError (the client resubmits with sensors).
        """
        if self._closed.is_set():
            raise RuntimeError("ServingEngine is closed")
        if images is None or bev is None:
            if not (self.prefix_cache_size and frame_id is not None):
                raise ValueError(
                    "bev/images may be omitted only with prefix caching "
                    "enabled and a frame_id (cache-hit-only request)")
            bev = images = view_valid = None
        if self.mesh is None:
            # upload-at-admission: start each request's host->device sensor
            # transfer NOW, in the submitter's thread (device_put is async).
            # Uploads spread over the arrival window and overlap the batch
            # currently executing, instead of one giant blocking stack+put
            # at dispatch — the difference between ingest riding the line
            # rate and ingest serializing behind compute. (Mesh mode keeps
            # host arrays: sharded placement needs the assembled batch.)
            import jax.numpy as jnp
            put = jnp.asarray
        else:
            def put(x, dtype=None):
                return np.asarray(x, dtype)
        req = _Request(
            None if bev is None else put(bev),
            None if images is None else put(images),
            None if view_valid is None else put(view_valid, bool),
            np.asarray(text_ids, np.int32), int(text_len),
            max_new_tokens=max_new_tokens,
            frame_id=frame_id if self.prefix_cache_size else None)
        self._queue.put(req)
        return req.future

    def generate(self, question: str, bev, cam_paths=None,
                 timeout: Optional[float] = None,
                 frame_id: Optional[str] = None) -> str:
        """Blocking text-level convenience (requires a tokenizer)."""
        fut = self.submit_text(question, bev, cam_paths, frame_id=frame_id)
        return fut.result(timeout=timeout)[1]

    def submit_text(self, question: str, bev, cam_paths=None,
                    frame_id: Optional[str] = None) -> Future:
        if self.tokenizer is None:
            raise ValueError("submit_text requires a tokenizer")
        images, valid, ids, length = _text_request_arrays(
            self.model.cfg, self.tokenizer, question, cam_paths)
        return self.submit(bev, images, valid, ids, length,
                           frame_id=frame_id)

    def stats(self) -> dict:
        with self._stats_lock:
            st = dict(self._stats)
            st["batch_sizes"] = list(st["batch_sizes"])
            lat = sorted(st.pop("latency_s"))
            st["p50_latency_s"] = lat[len(lat) // 2] if lat else None
            return st

    def close(self, timeout: float = 30.0) -> None:
        if self._closed.is_set():
            return
        self._closed.set()
        self._worker.join(timeout=timeout)
        # fail anything still queued
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            _resolve(req.future, exc=RuntimeError("engine closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------- worker

    def _take_batch(self, first_wait: float = 0.05) -> List[_Request]:
        """Block for the first request, then hold the door max_wait_ms."""
        try:
            first = self._queue.get(timeout=first_wait)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _serve_loop(self) -> None:
        """Software-pipelined serve loop.

        JAX dispatch is asynchronous — `greedy_generate` returns device
        futures immediately; only the host fetch (`np.asarray`) blocks. So
        the loop DISPATCHES batch N+1 before FETCHING batch N's results:
        the device starts the next program while the host sits in the
        previous fetch (which, through the axon relay, includes a ~31 ms
        roundtrip). In-flight depth is bounded at `pipeline_depth`.
        """
        inflight: List[tuple] = []
        while True:
            done = self._closed.is_set() and self._queue.empty()
            if done and not inflight:
                return
            # fetch the oldest batch once the pipeline is full, or when
            # there is nothing left to dispatch
            if inflight and (len(inflight) >= self.pipeline_depth or done):
                self._complete(*inflight.pop(0))
                continue
            # with results pending, only poll briefly for new work before
            # falling back to fetching
            batch = self._take_batch(0.005 if inflight else 0.05)
            if not batch:
                if inflight:
                    self._complete(*inflight.pop(0))
                continue
            groups = [batch]
            if (self.multi_groups > 1 and self.sampling is None
                    and not self.prefix_cache_size
                    and len(batch) == self.max_batch):
                # single consumer thread: qsize-then-get cannot race
                while (len(groups) < self.multi_groups
                       and self._queue.qsize() >= self.max_batch):
                    groups.append([self._queue.get_nowait()
                                   for _ in range(self.max_batch)])
            flat = [r for g in groups for r in g]
            try:
                if len(groups) == 1:
                    inflight.append((batch, self._dispatch(batch)))
                else:
                    inflight.append((flat, self._dispatch_multi(groups)))
            except Exception as e:  # dispatch/trace errors -> this batch
                for req in flat:
                    if not req.future.done():
                        _resolve(req.future, exc=e)

    def _put(self, x):
        import jax
        import jax.numpy as jnp
        if self.mesh is not None:
            return jax.device_put(x, self._batch_sharding)
        return jnp.asarray(x)

    def _sensor_stacks(self, rows: Sequence[_Request]):
        """rows -> device (bev, images, valid), preprocessing u8 frames on
        device. Every row must carry sensors (the prefix path filters to
        encodable rows before calling this).

        Single-device rows arrive device-resident (upload-at-admission in
        submit()), so stacking here is a per-bucket on-device concat — no
        host bytes move at dispatch time."""
        import jax.numpy as jnp
        bev = (jnp.stack([r.bev for r in rows]) if self.mesh is None
               else self._put(np.stack([r.bev for r in rows])))
        if bev.dtype != jnp.float32:    # f16 wire format: cast on device
            bev = bev.astype(jnp.float32)
        images = (jnp.stack([r.images for r in rows]) if self.mesh is None
                  else self._put(np.stack([r.images for r in rows])))
        if images.dtype == np.uint8:
            images = _preprocess_batch_fn(self.model.cfg.sam.img_size)(
                images)
        valid = (jnp.stack([r.view_valid for r in rows])
                 if self.mesh is None
                 else self._put(np.stack([r.view_valid for r in rows])))
        return bev, images, valid

    def _dispatch(self, batch: List[_Request]):
        """Launch one bucket program; returns device futures (non-blocking)."""
        import jax

        n = len(batch)
        bucket = next(b for b in self.buckets if b >= n)
        rows = batch + [batch[0]] * (bucket - n)   # pad rows: clone row 0

        ids = self._put(np.stack([r.text_ids for r in rows]))
        lens = self._put(np.array([r.text_len for r in rows], np.int32))

        if self.sampling is not None:
            bev, images, valid = self._sensor_stacks(rows)
            self._rng, sub = jax.random.split(self._rng)
            toks, out_lens = sample_generate(
                self.model, self.params, sub, bev, images, valid, ids,
                lens, max_new_tokens=self.max_new_tokens,
                eos_id=self.eos_id, **self.sampling)
        elif self.prefix_cache_size:
            prefix = self._prefixes_for(rows, n)
            toks, out_lens = generate_from_prefix(
                self.model, self.params, prefix, ids, lens,
                max_new_tokens=self.max_new_tokens, eos_id=self.eos_id,
                params_decode=self.params_decode)
        else:
            bev, images, valid = self._sensor_stacks(rows)
            toks, out_lens = greedy_generate(
                self.model, self.params, bev, images, valid, ids, lens,
                max_new_tokens=self.max_new_tokens, eos_id=self.eos_id,
                params_decode=self.params_decode)
        return toks, out_lens, bucket

    def _dispatch_multi(self, groups: List[List[_Request]]):
        """Launch ONE resident program over G full buckets (non-blocking).
        Results flatten group-major, aligned with the flat request list.

        Sensors stack RAW (u8 frames / f16 bev stay in wire format): the
        multi program preprocesses per group inside its scan, so the f32
        image tensor exists for one group at a time — a G=4 x B=8 f32
        stack is 2.4 GB and OOMs with depth-2 pipelining."""
        import jax.numpy as jnp

        bev = jnp.stack([jnp.stack([r.bev for r in g]) for g in groups])
        images = jnp.stack([jnp.stack([r.images for r in g])
                            for g in groups])
        if images.dtype != jnp.uint8:
            images = images.astype(jnp.float32)
        valid = jnp.stack([jnp.stack([r.view_valid for r in g])
                           for g in groups])
        ids = self._put(np.stack(
            [np.stack([r.text_ids for r in g]) for g in groups]))
        lens = self._put(np.stack(
            [np.array([r.text_len for r in g], np.int32) for g in groups]))
        toks, out_lens = greedy_generate_multi(
            self.model, self.params, bev, images, valid, ids, lens,
            max_new_tokens=self.max_new_tokens, eos_id=self.eos_id,
            params_decode=self.params_decode)
        n = sum(len(g) for g in groups)
        return toks.reshape(n, -1), out_lens.reshape(n), n

    def _prefixes_for(self, rows, n_real):
        """[bucket] prefix rows, encoding (and uploading) only cache misses.

        Misses (plus every frame_id-less row) batch-encode through the
        standalone jitted prefix encoder at the same bucket sizes as the
        generate programs; hits are reused device rows whose sensors never
        leave the host. Encoding a frame once and answering N questions
        against it turns the dominant sensor-encode cost — AND the ~25 MB
        sensor upload — into ~1/N per answer: hit rows ship token ids only.

        A miss whose request carries no sensors (`images=None` hit-only
        submit) fails that request's future with KeyError unless another
        row in the batch encodes the same frame_id; its device row is a
        placeholder whose result the resolved future already ignores.
        """
        import jax.numpy as jnp

        enc = encode_prefix_fn(self.model)
        miss_idx = [i for i, r in enumerate(rows)
                    if r.frame_id is None
                    or r.frame_id not in self._prefix_cache]
        # hold hit rows' prefixes now — this batch's inserts could evict
        # them before assembly when the cache is smaller than the batch
        held = {r.frame_id: self._prefix_cache[r.frame_id]
                for i, r in enumerate(rows)
                if i not in set(miss_idx)}
        for fid in held:
            self._prefix_cache.move_to_end(fid)
        with self._stats_lock:  # over real rows only (pads clone row 0)
            real_miss = len([i for i in miss_idx if i < n_real])
            self._stats["prefix_hits"] += n_real - real_miss
            self._stats["prefix_misses"] += real_miss
        # dedup misses sharing a frame_id within this batch, preferring a
        # row that carries sensors (a hit-only row may land in the same
        # batch as the sensor-carrying first question about its frame);
        # pad rows are literal clones of row 0, so they dedup away too
        first_for_key = {}
        enc_order = []
        for i in miss_idx:
            fid = rows[i].frame_id
            if fid is not None and fid in first_for_key:
                j = first_for_key[fid]
                if rows[j].images is None and rows[i].images is not None:
                    enc_order[enc_order.index(j)] = i   # upgrade to sensors
                    first_for_key[fid] = i
                continue
            if fid is not None:
                first_for_key[fid] = i
            elif rows[i] is rows[0] and i != 0:
                continue   # fid-less pad clone of row 0
            enc_order.append(i)
        # sensor-less misses with no same-batch donor cannot be served
        failed = set()
        enc_final = []
        for i in enc_order:
            if rows[i].images is None:
                failed.add(rows[i].frame_id)
                _resolve(rows[i].future, exc=KeyError(
                    f"frame_id {rows[i].frame_id!r} not in the prefix "
                    f"cache and the request carried no sensors"))
            else:
                enc_final.append(i)
        if failed:   # fail every other hit-only row of a failed frame
            for i in miss_idx:
                fid = rows[i].frame_id
                if fid in failed and not rows[i].future.done():
                    _resolve(rows[i].future, exc=KeyError(
                        f"frame_id {fid!r} not in the prefix cache and "
                        f"the request carried no sensors"))
        fresh, batch_fid = {}, {}   # batch_fid survives LRU eviction below
        if enc_final:
            n = len(enc_final)
            bucket = next(b for b in self.buckets if b >= n)
            sel = enc_final + [enc_final[0]] * (bucket - n)
            bev_d, img_d, valid_d = self._sensor_stacks(
                [rows[i] for i in sel])
            new = enc(self.params, bev_d, img_d, valid_d)
            fresh = {i: new[j] for j, i in enumerate(enc_final)}
            for i in enc_final:
                fid = rows[i].frame_id
                if fid is not None:
                    batch_fid[fid] = fresh[i]
                    self._prefix_cache[fid] = fresh[i]
                    self._prefix_cache.move_to_end(fid)
            while len(self._prefix_cache) > self.prefix_cache_size:
                self._prefix_cache.popitem(last=False)
        out = []
        placeholder = next(iter(held.values()), None)
        if placeholder is None and fresh:
            placeholder = next(iter(fresh.values()))
        if placeholder is None:
            raise RuntimeError("no request in this batch could be served "
                               "(all were uncached sensor-less rows)")
        for i, r in enumerate(rows):
            fid = r.frame_id
            if fid is not None and fid in batch_fid:
                out.append(batch_fid[fid])
            elif fid is not None and fid in held:
                out.append(held[fid])
            elif i in fresh:
                out.append(fresh[i])
            elif i == 0 or rows[i] is not rows[0]:
                out.append(placeholder)   # failed row: future already set
            else:      # fid-less pad clone of row 0
                out.append(out[0])
        return jnp.stack(out)

    def _complete(self, batch: List[_Request], result: tuple) -> None:
        """Fetch one dispatched batch and resolve its futures."""
        try:
            toks, out_lens, bucket = result
            toks = np.asarray(toks)
            out_lens = np.asarray(out_lens)
        except Exception as e:
            for req in batch:
                if not req.future.done():
                    _resolve(req.future, exc=e)
            return

        n = len(batch)
        now = time.perf_counter()
        with self._stats_lock:
            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["pad_rows"] += bucket - n
            self._stats["batch_sizes"].append(n)
            self._stats["latency_s"] += [now - r.t_submit for r in batch]

        for i, req in enumerate(batch):
            cut = int(out_lens[i])
            if req.max_new_tokens is not None:
                cut = min(cut, int(req.max_new_tokens))
            ids_out = toks[i][:cut].tolist()
            text = (self.tokenizer.decode(ids_out)
                    if self.tokenizer is not None else None)
            _resolve(req.future, (ids_out, text))
