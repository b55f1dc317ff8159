"""Continuous-batching serving engine (slot-based, chunked decode).

`ServingEngine` (server.py) is batch-synchronous: a request arriving just
after a batch launches waits for that batch's ENTIRE generation. This
engine removes that barrier the way large-scale LLM servers do, adapted to
XLA's static-shape world:

- the KV cache is a fixed slab of `slots` rows ([S, Hkv, L, D] per layer,
  allocated once);
- new requests PREFILL into free slot rows (admissions batched to
  power-of-two buckets, inserted via one jitted scatter);
- decode runs over ALL slots in fixed `chunk_steps`-token chunks; finished
  or empty slots are masked (they emit eos into a row that the next
  admission overwrites);
- at every chunk boundary the host collects finished answers, frees their
  slots, and admits waiting requests.

So a request's latency is its own prefill + decode time + at most one
chunk of queueing, regardless of where its neighbors are in their
generations. Every program shape (admission buckets x one slab) compiles
once. Single-device greedy only; results are token-identical to
greedy_generate (tested).
"""
from __future__ import annotations

import functools
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import numpy as np

from ..models import VQAModel
from ..models.vqa import _prefix_len
from .server import _Request, _buckets_up_to, _resolve, \
    _text_request_arrays


class ContinuousServingEngine:
    def __init__(self, model, params, tokenizer=None, *,
                 slots: int = 8, chunk_steps: int = 8,
                 max_new_tokens: int = 32, eos_id: Optional[int] = None,
                 params_decode=None):
        if eos_id is None:
            if tokenizer is None:
                raise ValueError("pass eos_id when no tokenizer is given")
            eos_id = tokenizer.eos_id
        self.model = model
        self.params = params
        self.params_decode = params_decode
        self.tokenizer = tokenizer
        self.slots = int(slots)
        self.chunk_steps = int(chunk_steps)
        self.max_new_tokens = int(max_new_tokens)
        self.eos_id = int(eos_id)
        self.admit_buckets = _buckets_up_to(self.slots)

        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "admission_batches": 0,
                       "decode_chunks": 0, "latency_s": [],
                       "occupancy": []}
        self._closed = threading.Event()
        self._jit_ready = False
        self._worker = threading.Thread(target=self._serve_loop,
                                        name="lvv-continuous", daemon=True)
        self._worker.start()

    # ---------------------------------------------------------- public API

    def submit(self, bev, images, view_valid, text_ids, text_len: int,
               max_new_tokens: Optional[int] = None,
               on_tokens=None) -> Future:
        """`on_tokens(list_of_new_ids)` streams each decoded chunk's fresh
        tokens for this request (called from the serve thread as soon as a
        chunk lands on the host — tokens reach the caller `chunk_steps`
        at a time instead of after the full answer)."""
        if self._closed.is_set():
            raise RuntimeError("engine is closed")
        if bev is None or images is None:
            raise ValueError("the continuous engine has no prefix cache; "
                             "every request must carry bev and images")
        # upload-at-admission (ServingEngine.submit semantics): start the
        # host->device sensor transfer NOW in the submitter's thread —
        # jnp.asarray is async and a NO-OP for already-device-resident
        # arrays, so prestaged device inputs flow through zero-copy
        import jax.numpy as jnp
        req = _Request(jnp.asarray(bev), jnp.asarray(images),
                       np.asarray(view_valid, bool),
                       np.asarray(text_ids, np.int32), int(text_len),
                       max_new_tokens=max_new_tokens)
        req.on_tokens = on_tokens
        self._queue.put(req)
        return req.future

    def submit_text(self, question: str, bev, cam_paths=None) -> Future:
        if self.tokenizer is None:
            raise ValueError("submit_text requires a tokenizer")
        images, valid, ids, length = _text_request_arrays(
            self.model.cfg, self.tokenizer, question, cam_paths)
        return self.submit(bev, images, valid, ids, length)

    def generate(self, question: str, bev, cam_paths=None,
                 timeout: Optional[float] = None) -> str:
        return self.submit_text(question, bev,
                                cam_paths).result(timeout=timeout)[1]

    def stats(self) -> dict:
        with self._stats_lock:
            st = dict(self._stats)
            lat = sorted(st.pop("latency_s"))
            occ = st.pop("occupancy")
            st["p50_latency_s"] = lat[len(lat) // 2] if lat else None
            st["mean_occupancy"] = (float(np.mean(occ)) if occ else 0.0)
            return st

    def close(self, timeout: float = 60.0) -> None:
        if self._closed.is_set():
            return
        self._closed.set()
        self._worker.join(timeout=timeout)
        while True:
            try:
                _resolve(self._queue.get_nowait().future,
                         exc=RuntimeError("engine closed"))
            except queue.Empty:
                break

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------- jitted pieces

    def _build_programs(self, prompt_width: int):
        import jax
        import jax.numpy as jnp
        from ..models.qwen import KVCache, init_cache

        model = self.model
        self._max_cache = (_prefix_len(model.cfg) + prompt_width
                           + self.max_new_tokens + 8)
        max_cache = self._max_cache
        eos = self.eos_id
        chunk = self.chunk_steps

        def prefill(params, bev, images, valid, ids, lens):
            b = ids.shape[0]
            cache = init_cache(model.cfg.llm, b, max_cache,
                               dtype=model.dtype)
            last_logits, cache = model.apply(
                {"params": params}, bev, images, valid, ids, lens, cache,
                method=VQAModel.prefill)
            return last_logits, cache

        def insert(slab, logits_slab, new_cache, new_logits, slot_idx):
            k = [sk.at[slot_idx].set(nk)
                 for sk, nk in zip(slab.k, new_cache.k)]
            v = [sv.at[slot_idx].set(nv)
                 for sv, nv in zip(slab.v, new_cache.v)]
            length = slab.length.at[slot_idx].set(new_cache.length)
            logits_slab = logits_slab.at[slot_idx].set(new_logits)
            return KVCache(k=k, v=v, length=length), logits_slab

        p_dec = (self.params if self.params_decode is None
                 else self.params_decode)

        fused = (self.params_decode is not None
                 and "_fused_decode" in self.params_decode)

        def decode_chunk(params_dec, slab, last_logits, done):
            def body(state, _):
                logits, cache, done = state
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, eos, nxt)
                if fused:   # packed-matmul engine (models/decode_fused.py)
                    from ..models.decode_fused import fused_decode_step
                    logits, cache = fused_decode_step(
                        model.cfg.llm, model.dtype,
                        params_dec["_fused_decode"], nxt, cache)
                    logits = logits.astype(last_logits.dtype)
                else:
                    logits, cache = model.apply(
                        {"params": params_dec}, nxt, cache,
                        method=VQAModel.decode_step)
                done = done | (nxt == eos)
                return (logits, cache, done), nxt

            (logits, cache, done), toks = jax.lax.scan(
                body, (last_logits, slab, done), None, length=chunk)
            return cache, logits, toks.T     # toks [S, chunk]

        self._prefill = jax.jit(prefill)
        # donate the slab (and its logits row) so XLA aliases input to
        # output instead of holding two full KV slabs per chunk/admission
        self._insert = jax.jit(insert, donate_argnums=(0, 1))
        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(1, 2))
        self._prompt_width = int(prompt_width)
        self._p_dec = p_dec
        self._init_cache = lambda: init_cache(
            model.cfg.llm, self.slots, max_cache, dtype=model.dtype)
        self._jit_ready = True

    # ------------------------------------------------------------- worker

    def _admit(self, free: List[int], slab, logits_slab):
        """Drain up to len(free) queued requests into free slots."""
        import jax.numpy as jnp

        admits: List[_Request] = []
        while len(admits) < len(free):
            try:
                admits.append(self._queue.get_nowait())
            except queue.Empty:
                break
        if not admits:
            return slab, logits_slab, {}
        try:
            return self._admit_rows(admits, free, slab, logits_slab)
        except Exception as e:   # trace/device failure -> fail these admits
            for r in admits:
                if not r.future.done():
                    _resolve(r.future, exc=e)
            return slab, logits_slab, {}

    def _admit_rows(self, admits, free, slab, logits_slab):
        import jax.numpy as jnp
        if not self._jit_ready:
            self._build_programs(admits[0].text_ids.shape[0])
        if slab is None:
            # first successful admission, or re-init after a failed one
            # (a failed first prefill must not strand slab=None forever)
            slab = self._init_cache()
            # logits width discovered from the first prefill below
        for r in admits:
            if r.text_ids.shape[0] != self._prompt_width:
                raise ValueError(
                    f"prompt width {r.text_ids.shape[0]} != engine width "
                    f"{self._prompt_width}: all requests must share the "
                    f"static shapes the first request compiled with "
                    f"(wider prompts would silently overflow the KV slab)")

        n = len(admits)
        bucket = next(b for b in self.admit_buckets if b >= n)
        rows = admits + [admits[0]] * (bucket - n)
        # device-side stack: rows were uploaded at admission (jnp arrays),
        # so this concatenates on device — no host pull, and prestaged
        # device-resident inputs never cross the wire at all
        bev = jnp.stack([r.bev for r in rows])
        if bev.dtype != jnp.float32:    # f16 wire format: cast on device
            bev = bev.astype(jnp.float32)
        images = jnp.stack([r.images for r in rows])
        if images.dtype == jnp.uint8:   # raw [6,H,W,3] frames: preprocess
            from .server import _preprocess_batch_fn  # on device (4x fewer
            images = _preprocess_batch_fn(            # ingest bytes)
                self.model.cfg.sam.img_size)(images)
        valid = jnp.asarray(np.stack([r.view_valid for r in rows]))
        ids = jnp.asarray(np.stack([r.text_ids for r in rows]))
        lens = jnp.asarray(np.array([r.text_len for r in rows], np.int32))
        new_logits, new_cache = self._prefill(self.params, bev, images,
                                              valid, ids, lens)
        if logits_slab is None:
            logits_slab = jnp.zeros((self.slots, new_logits.shape[-1]),
                                    new_logits.dtype)
        slot_idx = jnp.asarray(list(free[:n]) + [free[0]] * (bucket - n))
        # pad rows re-write the first admitted slot with identical data
        slab, logits_slab = self._insert(slab, logits_slab, new_cache,
                                         new_logits, slot_idx)
        placed = {free[i]: admits[i] for i in range(n)}
        with self._stats_lock:
            self._stats["requests"] += n
            self._stats["admission_batches"] += 1
        return slab, logits_slab, placed

    def _serve_loop(self) -> None:
        import jax.numpy as jnp

        slab = None
        logits_slab = None
        active = {}            # slot -> [req, [tokens...]]
        while True:
            if (self._closed.is_set() and self._queue.empty()
                    and not active):
                return
            free = [s for s in range(self.slots) if s not in active]
            if free and not self._queue.empty():
                slab, logits_slab, placed = self._admit(
                    free, slab, logits_slab)
                for slot, req in placed.items():
                    active[slot] = [req, []]
            if not active:
                time.sleep(0.01)
                continue

            done = np.ones((self.slots,), bool)
            for slot in active:
                done[slot] = False
            try:
                slab, logits_slab, toks = self._decode_chunk(
                    self._p_dec, slab, logits_slab, jnp.asarray(done))
                toks = np.asarray(toks)  # host sync once per chunk
            except Exception as e:
                # a device/runtime failure mid-decode must not kill the
                # worker (futures would hang forever); fail the in-flight
                # requests and rebuild the slab for the next admissions
                # (donated buffers are invalid after a failed call)
                for slot, (req, _out) in list(active.items()):
                    _resolve(req.future, exc=e)
                active.clear()
                slab = None
                logits_slab = None
                continue
            with self._stats_lock:
                self._stats["decode_chunks"] += 1
                self._stats["occupancy"].append(len(active))

            now = time.perf_counter()
            for slot in list(active):
                req, out = active[slot]
                cap = (min(self.max_new_tokens, req.max_new_tokens)
                       if req.max_new_tokens is not None
                       else self.max_new_tokens)
                finished = False
                fresh = []
                for tok in toks[slot]:
                    t = int(tok)
                    if t == self.eos_id:
                        finished = True
                        break
                    out.append(t)
                    fresh.append(t)
                    if len(out) >= cap:
                        finished = True
                        break
                cb = getattr(req, "on_tokens", None)
                if cb is not None and fresh:
                    try:
                        cb(fresh)
                    except Exception:
                        pass    # a broken stream consumer must not kill serving
                if finished:
                    text = (self.tokenizer.decode(out)
                            if self.tokenizer is not None else None)
                    with self._stats_lock:
                        self._stats["latency_s"].append(now - req.t_submit)
                    _resolve(req.future, (out, text))
                    del active[slot]
