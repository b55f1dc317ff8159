"""ServingEngine: dynamic batching correctness (results match the directly
batched greedy_generate call), bucket padding, text API, shutdown semantics.

The reference has no serving runtime — its generate_batch is a sequential
Python loop (inference_engine.py:306-334); this subsystem is the TPU-native
replacement (see lvv_tpu/inference/server.py docstring)."""
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvv_tpu import config as C
from lvv_tpu.data import ByteTokenizer
from lvv_tpu.inference.server import ServingEngine, _buckets_up_to
from lvv_tpu.models import VQABatch, VQAModel, greedy_generate

NEW_TOKENS = 4


@pytest.fixture(scope="module")
def setup():
    cfg = C.override(C.tiny_config(), "model.dtype", "float32")
    model = VQAModel(cfg.model)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    batch = VQABatch(
        bev=jnp.zeros((1, c, h, w)), images=jnp.zeros((1, 6, 3, s, s)),
        view_valid=jnp.ones((1, 6), bool),
        text_ids=jnp.zeros((1, 8), jnp.int32),
        text_len=jnp.full((1,), 8, jnp.int32),
        labels=jnp.full((1, 8), -100, jnp.int32),
        use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(3):
        reqs.append(dict(
            bev=rng.normal(size=(c, h, w)).astype(np.float32),
            images=rng.uniform(-1, 1, (6, 3, s, s)).astype(np.float32),
            view_valid=np.ones((6,), bool),
            text_ids=rng.integers(1, 200, (8,)).astype(np.int32),
            text_len=8 - i))
    return cfg, model, params, reqs


@pytest.mark.fast
def test_bucket_schedule():
    assert _buckets_up_to(8) == [1, 2, 4, 8]
    assert _buckets_up_to(6) == [1, 2, 4, 6]
    assert _buckets_up_to(1) == [1]


def test_batched_results_match_direct_call(setup):
    cfg, model, params, reqs = setup
    eng = ServingEngine(model, params, max_batch=4, max_wait_ms=300.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2)
    try:
        futs = [eng.submit(r["bev"], r["images"], r["view_valid"],
                           r["text_ids"], r["text_len"]) for r in reqs]
        got = [f.result(timeout=300) for f in futs]
    finally:
        eng.close()

    st = eng.stats()
    assert st["requests"] == 3
    assert st["batches"] == 1, "requests should have shared one bucket"
    assert st["batch_sizes"] == [3]
    assert st["pad_rows"] == 1          # bucket 4, 3 real rows
    assert st["p50_latency_s"] is not None

    # direct call on the identical padded bucket -> identical program,
    # identical tokens
    rows = reqs + [reqs[0]]
    toks, lens = greedy_generate(
        model, params,
        jnp.asarray(np.stack([r["bev"] for r in rows])),
        jnp.asarray(np.stack([r["images"] for r in rows])),
        jnp.asarray(np.stack([r["view_valid"] for r in rows])),
        jnp.asarray(np.stack([r["text_ids"] for r in rows])),
        jnp.asarray(np.array([r["text_len"] for r in rows], np.int32)),
        max_new_tokens=NEW_TOKENS, eos_id=2)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i, (ids, text) in enumerate(got):
        assert text is None             # no tokenizer attached
        assert ids == toks[i][: int(lens[i])].tolist()


def test_partial_bucket_flushes_after_wait(setup):
    cfg, model, params, reqs = setup
    eng = ServingEngine(model, params, max_batch=4, max_wait_ms=5.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2)
    try:
        r = reqs[0]
        fut = eng.submit(r["bev"], r["images"], r["view_valid"],
                         r["text_ids"], r["text_len"])
        ids, _ = fut.result(timeout=300)
        assert len(ids) <= NEW_TOKENS
        assert eng.stats()["batch_sizes"] == [1]
    finally:
        eng.close()


def test_text_api_and_tokenizer(setup):
    cfg, model, params, reqs = setup
    tk = ByteTokenizer(cfg.model.llm.special_tokens)
    eng = ServingEngine(model, params, tk, max_batch=2, max_wait_ms=5.0,
                        max_new_tokens=NEW_TOKENS)
    try:
        out = eng.generate("what is ahead?", reqs[0]["bev"], timeout=300)
        assert isinstance(out, str)
    finally:
        eng.close()


def test_prefix_cache_results_and_hits(setup):
    """frame_id prefix caching: repeated questions about one frame skip the
    sensor encode (hit counters prove it) and return the same greedy tokens
    as the uncached engine."""
    cfg, model, params, reqs = setup
    r = reqs[0]

    # uncached reference tokens for this request (single-row bucket)
    eng0 = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                         max_new_tokens=NEW_TOKENS, eos_id=2)
    try:
        ref = eng0.submit(r["bev"], r["images"], r["view_valid"],
                          r["text_ids"], r["text_len"]).result(300)[0]
    finally:
        eng0.close()

    eng = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2,
                        prefix_cache_size=4)
    try:
        outs = []
        for _ in range(3):   # sequential: same frame, cache warm after 1st
            outs.append(eng.submit(
                r["bev"], r["images"], r["view_valid"],
                r["text_ids"], r["text_len"],
                frame_id="frame-A").result(300)[0])
        st = eng.stats()
    finally:
        eng.close()
    assert outs[0] == outs[1] == outs[2] == ref
    assert st["prefix_misses"] == 1
    assert st["prefix_hits"] == 2


def test_prefix_cache_mixed_batch_and_eviction(setup):
    """Distinct frames in one bucket encode independently; the LRU evicts
    oldest frames; frame_id-less requests always encode."""
    cfg, model, params, reqs = setup
    eng = ServingEngine(model, params, max_batch=4, max_wait_ms=300.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2,
                        prefix_cache_size=1)
    try:
        futs = [eng.submit(reqs[i]["bev"], reqs[i]["images"],
                           reqs[i]["view_valid"], reqs[i]["text_ids"],
                           reqs[i]["text_len"],
                           frame_id=f"f{i}" if i < 2 else None)
                for i in range(3)]
        got = [f.result(timeout=300)[0] for f in futs]
        st = eng.stats()
    finally:
        eng.close()
    assert st["prefix_misses"] == 3 and st["prefix_hits"] == 0

    # must match the uncached engine on the identical bucket-4 batch
    rows = reqs + [reqs[0]]
    toks, lens = greedy_generate(
        model, params,
        jnp.asarray(np.stack([r["bev"] for r in rows])),
        jnp.asarray(np.stack([r["images"] for r in rows])),
        jnp.asarray(np.stack([r["view_valid"] for r in rows])),
        jnp.asarray(np.stack([r["text_ids"] for r in rows])),
        jnp.asarray(np.array([r["text_len"] for r in rows], np.int32)),
        max_new_tokens=NEW_TOKENS, eos_id=2)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i, ids in enumerate(got):
        assert ids == toks[i][: int(lens[i])].tolist()


def test_prefix_cache_rejects_mesh_and_sampling(setup):
    from lvv_tpu.parallel import make_mesh
    from lvv_tpu.config.schema import MeshConfig

    cfg, model, params, _ = setup
    with pytest.raises(ValueError, match="prefix caching"):
        ServingEngine(model, params, max_batch=8, eos_id=2,
                      prefix_cache_size=2,
                      mesh=make_mesh(MeshConfig(data=4, model=2)))
    with pytest.raises(ValueError, match="prefix caching"):
        ServingEngine(model, params, max_batch=2, eos_id=2,
                      prefix_cache_size=2, sampling={"temperature": 1.0})


def test_per_request_token_cap(setup):
    """max_new_tokens on submit truncates that request's answer only."""
    cfg, model, params, reqs = setup
    eng = ServingEngine(model, params, max_batch=4, max_wait_ms=300.0,
                        max_new_tokens=NEW_TOKENS, eos_id=-1)  # no eos stop
    try:
        r = reqs[0]
        f_full = eng.submit(r["bev"], r["images"], r["view_valid"],
                            r["text_ids"], r["text_len"])
        f_cap = eng.submit(r["bev"], r["images"], r["view_valid"],
                           r["text_ids"], r["text_len"], max_new_tokens=2)
        full, _ = f_full.result(timeout=300)
        cap, _ = f_cap.result(timeout=300)
    finally:
        eng.close()
    assert len(full) == NEW_TOKENS
    assert cap == full[:2]


def test_sampling_mode(setup):
    """Engine-level sampling config routes through sample_generate and is
    deterministic for a fixed seed."""
    cfg, model, params, reqs = setup
    outs = []
    for _ in range(2):
        eng = ServingEngine(
            model, params, max_batch=2, max_wait_ms=5.0,
            max_new_tokens=NEW_TOKENS, eos_id=2,
            sampling={"temperature": 0.8, "top_k": 10, "top_p": 0.95,
                      "seed": 7})
        try:
            r = reqs[0]
            fut = eng.submit(r["bev"], r["images"], r["view_valid"],
                             r["text_ids"], r["text_len"])
            outs.append(fut.result(timeout=300)[0])
        finally:
            eng.close()
    assert outs[0] == outs[1]
    with pytest.raises(ValueError, match="int8"):
        ServingEngine(model, params, max_batch=2, eos_id=2,
                      sampling={"temperature": 1.0},
                      params_decode={"llm": {}})


def test_pipelined_vs_unpipelined_same_results(setup):
    """pipeline_depth=2 (dispatch-ahead) must not change any result; it
    only overlaps the host fetch of batch N with the device run of N+1."""
    cfg, model, params, reqs = setup
    outs = {}
    for depth in (1, 2):
        eng = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                            max_new_tokens=NEW_TOKENS, eos_id=2,
                            pipeline_depth=depth)
        try:
            futs = [eng.submit(r["bev"], r["images"], r["view_valid"],
                               r["text_ids"], r["text_len"]) for r in reqs]
            outs[depth] = [f.result(timeout=300)[0] for f in futs]
        finally:
            eng.close()
        assert eng.stats()["batches"] == len(reqs)
    assert outs[1] == outs[2]
    with pytest.raises(ValueError):
        ServingEngine(model, params, max_batch=1, eos_id=2,
                      pipeline_depth=0)


def test_closed_engine_rejects(setup):
    cfg, model, params, reqs = setup
    eng = ServingEngine(model, params, max_batch=2, max_wait_ms=1.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2)
    eng.close()
    eng.close()                          # idempotent
    r = reqs[0]
    with pytest.raises(RuntimeError):
        eng.submit(r["bev"], r["images"], r["view_valid"],
                   r["text_ids"], r["text_len"])


def test_mesh_sharded_serving(setup):
    """DPxTP serving over the 8-device mesh: params tensor-parallel over
    'model', request rows split over 'data'; buckets snap to multiples of
    the data axis. Results must match the single-device engine."""
    from lvv_tpu.parallel import make_mesh
    from lvv_tpu.config.schema import MeshConfig

    cfg, model, params, reqs = setup
    mesh = make_mesh(MeshConfig(data=4, model=2))
    eng = ServingEngine(model, params, max_batch=8, max_wait_ms=300.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2, mesh=mesh)
    try:
        assert eng.buckets == [4, 8]
        futs = [eng.submit(r["bev"], r["images"], r["view_valid"],
                           r["text_ids"], r["text_len"]) for r in reqs]
        got = [f.result(timeout=300) for f in futs]
    finally:
        eng.close()
    assert eng.stats()["batch_sizes"] == [3]     # one bucket-4 program

    # reference: unsharded single-device call on the identical bucket
    rows = reqs + [reqs[0]]
    toks, lens = greedy_generate(
        model, params,
        jnp.asarray(np.stack([r["bev"] for r in rows])),
        jnp.asarray(np.stack([r["images"] for r in rows])),
        jnp.asarray(np.stack([r["view_valid"] for r in rows])),
        jnp.asarray(np.stack([r["text_ids"] for r in rows])),
        jnp.asarray(np.array([r["text_len"] for r in rows], np.int32)),
        max_new_tokens=NEW_TOKENS, eos_id=2)
    toks, lens = np.asarray(toks), np.asarray(lens)
    for i, (ids, _) in enumerate(got):
        assert ids == toks[i][: int(lens[i])].tolist()


def test_mesh_max_batch_divisibility(setup):
    from lvv_tpu.parallel import make_mesh
    from lvv_tpu.config.schema import MeshConfig

    cfg, model, params, _ = setup
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with pytest.raises(ValueError, match="multiple"):
        ServingEngine(model, params, max_batch=6, max_wait_ms=1.0,
                      max_new_tokens=NEW_TOKENS, eos_id=2, mesh=mesh)


def test_concurrent_submitters(setup):
    """Many client threads, one device program at a time; every future
    resolves and per-request results are independent of co-travellers."""
    cfg, model, params, reqs = setup
    eng = ServingEngine(model, params, max_batch=2, max_wait_ms=20.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2)
    results = {}
    lock = threading.Lock()

    def client(i):
        r = reqs[i % len(reqs)]
        fut = eng.submit(r["bev"], r["images"], r["view_valid"],
                         r["text_ids"], r["text_len"])
        ids, _ = fut.result(timeout=300)
        with lock:
            results[i] = ids

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        eng.close()
    assert set(results) == set(range(5))
    # same request payload -> same greedy tokens, whoever it batched with
    assert results[0] == results[3]
    assert eng.stats()["requests"] == 5


def test_u8_ingest_matches_preprocessed_f32(setup):
    """Raw uint8 [6,H,W,3] frames through the engine's on-device
    preprocess produce the exact tokens of a host-preprocessed f32 submit
    (same XLA preprocess program either way)."""
    from lvv_tpu.ops.image import preprocess_views

    cfg, model, params, reqs = setup
    s = cfg.model.sam.img_size
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (6, s, s, 3), dtype=np.uint8)
    f32 = np.asarray(preprocess_views(jnp.asarray(u8), s))
    r = reqs[0]

    def run(images):
        eng = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                            max_new_tokens=NEW_TOKENS, eos_id=2)
        try:
            return eng.submit(r["bev"], images, r["view_valid"],
                              r["text_ids"], r["text_len"]).result(300)[0]
        finally:
            eng.close()

    assert run(u8) == run(f32)


def test_f16_bev_ingest_matches_f32(setup):
    """f16 BEV wire format: tokens equal a f32 submit of the rounded
    values (the engine casts on device; f16 is the precompute_bev
    product format)."""
    cfg, model, params, reqs = setup
    r = reqs[0]
    bev16 = r["bev"].astype(np.float16)

    def run(bev):
        eng = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                            max_new_tokens=NEW_TOKENS, eos_id=2)
        try:
            return eng.submit(bev, r["images"], r["view_valid"],
                              r["text_ids"], r["text_len"]).result(300)[0]
        finally:
            eng.close()

    assert run(bev16) == run(bev16.astype(np.float32))


def test_prefix_hit_only_submit(setup):
    """With a frame cached, a sensor-less submit (bev=None, images=None)
    returns the same answer as a full resubmit; an uncached sensor-less
    frame fails its future with KeyError; and without prefix caching a
    sensor-less submit is rejected outright."""
    cfg, model, params, reqs = setup
    r = reqs[0]
    eng = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2,
                        prefix_cache_size=4)
    try:
        full = eng.submit(r["bev"], r["images"], r["view_valid"],
                          r["text_ids"], r["text_len"],
                          frame_id="A").result(300)[0]
        lean = eng.submit(None, None, None, r["text_ids"], r["text_len"],
                          frame_id="A").result(300)[0]
        assert lean == full
        st = eng.stats()
        assert st["prefix_hits"] == 1 and st["prefix_misses"] == 1

        miss = eng.submit(None, None, None, r["text_ids"], r["text_len"],
                          frame_id="NEVER-SEEN")
        with pytest.raises(KeyError):
            miss.result(300)
    finally:
        eng.close()

    eng0 = ServingEngine(model, params, max_batch=1, max_wait_ms=1.0,
                         max_new_tokens=NEW_TOKENS, eos_id=2)
    try:
        with pytest.raises(ValueError, match="prefix caching"):
            eng0.submit(None, None, None, r["text_ids"], r["text_len"])
    finally:
        eng0.close()


def test_prefix_hit_only_same_batch_donor(setup):
    """A hit-only row batched WITH the sensor-carrying first question about
    its frame is served from that same-batch encode (no KeyError)."""
    cfg, model, params, reqs = setup
    r = reqs[0]
    eng = ServingEngine(model, params, max_batch=4, max_wait_ms=300.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2,
                        prefix_cache_size=4)
    try:
        f_lean = eng.submit(None, None, None, r["text_ids"],
                            r["text_len"], frame_id="B")
        f_full = eng.submit(r["bev"], r["images"], r["view_valid"],
                            r["text_ids"], r["text_len"], frame_id="B")
        assert f_lean.result(300)[0] == f_full.result(300)[0]
        assert eng.stats()["batches"] == 1
    finally:
        eng.close()


@pytest.mark.fast
def test_multi_group_generate_matches_single(setup):
    """greedy_generate_multi (one resident program scanning G batches) is
    token-identical to G separate greedy_generate calls."""
    from lvv_tpu.models import greedy_generate_multi
    cfg, model, params, reqs = setup
    gs = []
    for r in (reqs[0], reqs[1]):
        gs.append(dict(
            bev=jnp.asarray(r["bev"])[None], images=jnp.asarray(r["images"])[None],
            vv=jnp.asarray(r["view_valid"])[None],
            ids=jnp.asarray(r["text_ids"])[None],
            lens=jnp.full((1,), r["text_len"], jnp.int32)))
    toks_m, lens_m = greedy_generate_multi(
        model, params,
        jnp.stack([g["bev"] for g in gs]), jnp.stack([g["images"] for g in gs]),
        jnp.stack([g["vv"] for g in gs]), jnp.stack([g["ids"] for g in gs]),
        jnp.stack([g["lens"] for g in gs]),
        max_new_tokens=NEW_TOKENS, eos_id=2)
    for gi, g in enumerate(gs):
        toks, lens = greedy_generate(
            model, params, g["bev"], g["images"], g["vv"], g["ids"],
            g["lens"], max_new_tokens=NEW_TOKENS, eos_id=2)
        np.testing.assert_array_equal(np.asarray(toks_m[gi]),
                                      np.asarray(toks))
        np.testing.assert_array_equal(np.asarray(lens_m[gi]),
                                      np.asarray(lens))


@pytest.mark.fast
def test_engine_multi_groups(setup):
    """With the queue >= 2 full buckets deep, multi_groups=2 serves both
    buckets from ONE dispatch with the same answers as direct calls."""
    cfg, model, params, reqs = setup
    work = (reqs * 4)[:10]
    eng = ServingEngine(model, params, max_batch=2, max_wait_ms=400.0,
                        max_new_tokens=NEW_TOKENS, eos_id=2,
                        multi_groups=2)
    try:
        futs = [eng.submit(q["bev"], q["images"], q["view_valid"],
                           q["text_ids"], q["text_len"]) for q in work]
        got = [f.result(timeout=300) for f in futs]
    finally:
        eng.close()
    st = eng.stats()
    assert st["requests"] == 10
    # while the first (compiling) dispatch is in flight the queue fills, so
    # at least one subsequent dispatch must pack 2 full buckets (size 4)
    assert 4 in st["batch_sizes"], st["batch_sizes"]
    direct = []
    for q in work:
        toks, lens = greedy_generate(
            model, params, jnp.asarray(q["bev"])[None],
            jnp.asarray(q["images"])[None],
            jnp.asarray(q["view_valid"])[None],
            jnp.asarray(q["text_ids"])[None],
            jnp.full((1,), q["text_len"], jnp.int32),
            max_new_tokens=NEW_TOKENS, eos_id=2)
        direct.append(np.asarray(toks)[0][:int(lens[0])].tolist())
    assert [g[0] for g in got] == direct


@pytest.mark.fast
def test_engine_multi_groups_u8_wire(setup):
    """Raw uint8 frames through the multi path (preprocess inside the
    resident program) answer identically to the single-batch path (which
    preprocesses at dispatch)."""
    cfg, model, params, reqs = setup
    s = cfg.model.sam.img_size
    rng = np.random.default_rng(11)
    u8 = rng.integers(0, 256, (6, s, s, 3), dtype=np.uint8)
    row = dict(bev=reqs[0]["bev"].astype(np.float16), images=u8,
               view_valid=reqs[0]["view_valid"],
               text_ids=reqs[0]["text_ids"], text_len=reqs[0]["text_len"])

    def run(multi_groups, n):
        eng = ServingEngine(model, params, max_batch=2, max_wait_ms=400.0,
                            max_new_tokens=NEW_TOKENS, eos_id=2,
                            multi_groups=multi_groups)
        try:
            futs = [eng.submit(**row) for _ in range(n)]
            out = [f.result(timeout=300)[0] for f in futs]
        finally:
            eng.close()
        return out, eng.stats()

    single, _ = run(1, 2)
    multi, st = run(2, 8)
    assert 4 in st["batch_sizes"], st["batch_sizes"]   # a packed dispatch
    assert all(m == single[0] for m in multi)
