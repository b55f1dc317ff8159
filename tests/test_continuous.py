"""ContinuousServingEngine: slot-based chunked decode — token parity with
the fused greedy program, staggered admissions, per-request caps."""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvv_tpu import config as C
from lvv_tpu.data import ByteTokenizer
from lvv_tpu.inference import ContinuousServingEngine
from lvv_tpu.models import VQABatch, VQAModel, greedy_generate

NEW_TOKENS = 6


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
    rng = np.random.default_rng(3)
    reqs = []
    for i in range(3):
        reqs.append(dict(
            bev=rng.normal(size=(c, h, w)).astype(np.float32),
            images=rng.uniform(-1, 1, (6, 3, s, s)).astype(np.float32),
            view_valid=np.ones((6,), bool),
            text_ids=rng.integers(1, 200, (8,)).astype(np.int32),
            text_len=8 - i))
    return cfg, model, params, reqs


def _expected(model, params, reqs, eos=2, n=NEW_TOKENS):
    """Fused-program greedy tokens on the bucket-4 padded batch."""
    rows = reqs + [reqs[0]]
    toks, lens = greedy_generate(
        model, params,
        jnp.asarray(np.stack([r["bev"] for r in rows])),
        jnp.asarray(np.stack([r["images"] for r in rows])),
        jnp.asarray(np.stack([r["view_valid"] for r in rows])),
        jnp.asarray(np.stack([r["text_ids"] for r in rows])),
        jnp.asarray(np.array([r["text_len"] for r in rows], np.int32)),
        max_new_tokens=n, eos_id=eos)
    toks, lens = np.asarray(toks), np.asarray(lens)
    return [toks[i][: int(lens[i])].tolist() for i in range(len(reqs))]


def test_burst_matches_fused_program(setup):
    cfg, model, params, reqs = setup
    eng = ContinuousServingEngine(model, params, slots=4, chunk_steps=2,
                                  max_new_tokens=NEW_TOKENS, eos_id=2)
    try:
        futs = [eng.submit(r["bev"], r["images"], r["view_valid"],
                           r["text_ids"], r["text_len"]) for r in reqs]
        got = [f.result(timeout=600)[0] for f in futs]
        st = eng.stats()
    finally:
        eng.close()
    assert got == _expected(model, params, reqs)
    assert st["requests"] == 3
    assert st["decode_chunks"] >= NEW_TOKENS // 2
    assert st["mean_occupancy"] > 0


def test_staggered_admissions(setup):
    """A request arriving while others decode is admitted at a chunk
    boundary and still yields the fused-program tokens."""
    cfg, model, params, reqs = setup
    eng = ContinuousServingEngine(model, params, slots=4, chunk_steps=2,
                                  max_new_tokens=NEW_TOKENS, eos_id=2)
    try:
        f0 = eng.submit(reqs[0]["bev"], reqs[0]["images"],
                        reqs[0]["view_valid"], reqs[0]["text_ids"],
                        reqs[0]["text_len"])
        time.sleep(0.5)   # let the first admission/decode start
        f1 = eng.submit(reqs[1]["bev"], reqs[1]["images"],
                        reqs[1]["view_valid"], reqs[1]["text_ids"],
                        reqs[1]["text_len"])
        f2 = eng.submit(reqs[2]["bev"], reqs[2]["images"],
                        reqs[2]["view_valid"], reqs[2]["text_ids"],
                        reqs[2]["text_len"])
        got = [f.result(timeout=600)[0] for f in (f0, f1, f2)]
        st = eng.stats()
    finally:
        eng.close()
    assert got == _expected(model, params, reqs)
    assert st["admission_batches"] >= 2


def test_per_request_cap_and_text(setup):
    cfg, model, params, reqs = setup
    tk = ByteTokenizer(cfg.model.llm.special_tokens)
    eng = ContinuousServingEngine(model, params, tk, slots=2,
                                  chunk_steps=3, max_new_tokens=NEW_TOKENS,
                                  eos_id=-1)   # never hits eos
    try:
        r = reqs[0]
        full = eng.submit(r["bev"], r["images"], r["view_valid"],
                          r["text_ids"], r["text_len"]).result(600)
        capped = eng.submit(r["bev"], r["images"], r["view_valid"],
                            r["text_ids"], r["text_len"],
                            max_new_tokens=2).result(600)
    finally:
        eng.close()
    assert len(full[0]) == NEW_TOKENS
    assert capped[0] == full[0][:2]
    assert isinstance(full[1], str)


def test_streaming_callback(setup):
    """on_tokens delivers each chunk's fresh ids; concatenation equals the
    final answer, and chunks arrive at most chunk_steps at a time."""
    cfg, model, params, reqs = setup
    eng = ContinuousServingEngine(model, params, slots=2, chunk_steps=2,
                                  max_new_tokens=NEW_TOKENS, eos_id=-1)
    chunks = []
    try:
        r = reqs[0]
        ids, _ = eng.submit(r["bev"], r["images"], r["view_valid"],
                            r["text_ids"], r["text_len"],
                            on_tokens=chunks.append).result(600)
    finally:
        eng.close()
    assert [t for c in chunks for t in c] == ids
    assert len(chunks) >= 2
    assert all(len(c) <= 2 for c in chunks)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_closed_rejects(setup):
    cfg, model, params, reqs = setup
    eng = ContinuousServingEngine(model, params, slots=2, eos_id=2)
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(reqs[0]["bev"], reqs[0]["images"],
                   reqs[0]["view_valid"], reqs[0]["text_ids"],
                   reqs[0]["text_len"])


def test_u8_ingest_matches_preprocessed_f32(setup):
    """Raw uint8 frames admit identically to host-preprocessed f32."""
    from lvv_tpu.ops.image import preprocess_views

    cfg, model, params, reqs = setup
    s = cfg.model.sam.img_size
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (6, s, s, 3), dtype=np.uint8)
    f32 = np.asarray(preprocess_views(jnp.asarray(u8), s))
    r = reqs[0]

    def run(images):
        eng = ContinuousServingEngine(model, params, slots=2,
                                      chunk_steps=2, eos_id=2,
                                      max_new_tokens=4)
        try:
            return eng.submit(r["bev"], images, r["view_valid"],
                              r["text_ids"], r["text_len"]).result(600)[0]
        finally:
            eng.close()

    assert run(u8) == run(f32)


def test_rejects_sensorless_submit(setup):
    cfg, model, params, reqs = setup
    eng = ContinuousServingEngine(model, params, slots=2, eos_id=2)
    try:
        with pytest.raises(ValueError, match="prefix cache"):
            eng.submit(None, None, None, reqs[0]["text_ids"],
                       reqs[0]["text_len"])
    finally:
        eng.close()


@pytest.mark.fast
def test_continuous_fused_decode_tree(setup):
    """ContinuousServingEngine accepts the packed fused-decode tree and
    still answers token-identically to the fused generate path."""
    from lvv_tpu.models import greedy_generate, prepare_serving_params_fused
    cfg, model, params, reqs = setup
    pf = prepare_serving_params_fused(model, params)
    r = reqs[0]
    eng = ContinuousServingEngine(model, params, slots=2, chunk_steps=2,
                                  max_new_tokens=NEW_TOKENS, eos_id=2,
                                  params_decode=pf)
    try:
        got = eng.submit(r["bev"], r["images"], r["view_valid"],
                         r["text_ids"], r["text_len"]).result(300)[0]
    finally:
        eng.close()
    toks, lens = greedy_generate(
        model, params, jnp.asarray(r["bev"])[None],
        jnp.asarray(r["images"])[None], jnp.asarray(r["view_valid"])[None],
        jnp.asarray(r["text_ids"])[None],
        jnp.full((1,), r["text_len"], jnp.int32),
        max_new_tokens=NEW_TOKENS, eos_id=2, params_decode=pf)
    assert got == np.asarray(toks)[0][: int(lens[0])].tolist()
