"""int8 weight quantization + dequantizing matmul kernel (ops/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.ops.quant import quantize_weight, quantized_matmul


@pytest.mark.fast
def test_quantize_roundtrip_error_bounded(rng):
    w = jnp.asarray(rng.normal(size=(256, 384)), jnp.float32)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (384,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    err = np.abs(deq - np.asarray(w)).max(axis=0)
    # per-channel symmetric: max error <= scale/2 per channel
    assert (err <= np.asarray(s) * 0.5 + 1e-6).all()


@pytest.mark.parametrize("m,k,n", [(1, 896, 1280), (2, 300, 700),
                                   (8, 1024, 512)])
def test_quantized_matmul_matches_reference(rng, m, k, n):
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    q, s = quantize_weight(w)
    ref = np.asarray(quantized_matmul(x, q, s, bias=b))   # cpu fallback
    out = np.asarray(quantized_matmul(x, q, s, bias=b, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=6e-3 * scale)
    # and both approximate the fp matmul within int8 noise
    fp = np.asarray(x @ w + b[None])
    assert np.abs(ref - fp).max() <= 0.03 * scale


def test_int8_dot_w8a8_accuracy(rng):
    from lvv_tpu.ops.quant import int8_dot
    x = jnp.asarray(rng.normal(size=(2, 96, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(384,)) * 0.1, jnp.float32)
    out = np.asarray(int8_dot(x, w, b))
    fp = np.asarray(jnp.einsum("bmk,kn->bmn", x, w) + b)
    assert out.shape == fp.shape
    scale = np.abs(fp).max()
    # W8A8 per-row x per-col: both quantization noises compose
    assert np.abs(out - fp).max() <= 0.04 * scale
    rel = np.linalg.norm(out - fp) / np.linalg.norm(fp)
    assert rel < 0.02


def test_fused_ln_mlp_quant8_matches_float(rng):
    from lvv_tpu.ops import fused_mlp
    n, c, h = 128, 256, 512
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.bfloat16)
    ls = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, h)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.bfloat16)
    ref = np.asarray(fused_mlp.ln_mlp_residual(
        x, ls, lb, w1, b1, w2, b2, interpret=True), np.float32)
    q8 = np.asarray(fused_mlp.ln_mlp_residual(
        x, ls, lb, w1, b1, w2, b2, quant8=True, interpret=True), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(q8 - ref).max() <= 0.05 * scale
    rel = np.linalg.norm(q8 - ref) / np.linalg.norm(ref)
    assert rel < 0.02


def test_fused_ln_mlp_quant8_grad_flows(rng):
    # straight-through VJP: jax.grad must be legal through the quant path
    from lvv_tpu.ops import fused_mlp
    n, c, h = 16, 256, 512
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    ls = jnp.ones((c,), jnp.float32)
    lb = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, h)) * 0.05, jnp.float32)
    b1 = jnp.zeros((h,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, c)) * 0.05, jnp.float32)
    b2 = jnp.zeros((c,), jnp.float32)

    def loss(w1):
        return jnp.sum(fused_mlp.ln_mlp_residual(
            x, ls, lb, w1, b1, w2, b2, quant8=True, interpret=True) ** 2)

    g = jax.grad(loss)(w1)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_sam_block_quant8_close_to_float(rng):
    """End-to-end SAM block with quant8: output within int8 noise of the
    float path (the serving-preset accuracy guarantee)."""
    from lvv_tpu.models.sam import SAMBlock
    from lvv_tpu.ops import fused_mlp
    x = jnp.asarray(rng.normal(size=(1, 14, 14, 256)), jnp.float32)
    fused_mlp.set_interpret(True)
    try:
        blk = SAMBlock(num_heads=4, window_size=14, input_size=(14, 14))
        params = blk.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(blk.apply(params, x))
        blk_q = SAMBlock(num_heads=4, window_size=14, input_size=(14, 14),
                         quant8=True)
        out = np.asarray(blk_q.apply(params, x))
    finally:
        fused_mlp.set_interpret(False)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() <= 0.06 * scale


def test_w8a8_matmul_matches_int8_dot(rng):
    from lvv_tpu.ops.quant import int8_dot, w8a8_matmul
    x = jnp.asarray(rng.normal(size=(2, 70, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 384)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(384,)) * 0.1, jnp.float32)
    ref = np.asarray(int8_dot(x, w, b))           # XLA path (same math)
    out = np.asarray(w8a8_matmul(x, w, b, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-3 * np.abs(ref).max())
    fp = np.asarray(jnp.einsum("bmk,kn->bmn", x, w) + b)
    assert np.abs(out - fp).max() <= 0.04 * np.abs(fp).max()


def test_dense_dict_kernel_matches_float(rng):
    from lvv_tpu.models.layers import Dense
    from lvv_tpu.ops.quant import quantize_weight
    x = jnp.asarray(rng.normal(size=(3, 5, 64)), jnp.float32)
    d = Dense(128)
    p = d.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(d.apply(p, x))
    w = p["params"]["kernel"]
    q, s = quantize_weight(w)
    pq = {"params": {**p["params"], "kernel": {"q": q, "s": s}}}
    out = np.asarray(d.apply(pq, x))
    assert np.abs(out - ref).max() <= 0.02 * np.abs(ref).max()


def test_quantized_matmul_nk_matches_einsum(rng):
    from lvv_tpu.ops.quant import quantized_matmul_nk
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(300, 128)) * 0.05, jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w / sc[:, None]), -127, 127).astype(jnp.int8)
    ref = np.asarray(jnp.einsum("mk,nk->mn", x, wq.astype(jnp.float32))
                     * sc[None, :])
    out = np.asarray(quantized_matmul_nk(x, wq, sc, interpret=True))
    np.testing.assert_allclose(out, ref, atol=3e-3 * np.abs(ref).max())


def test_quantize_llm_params_decode_parity(rng):
    """Weight-only int8 Qwen tree: greedy decode logits stay within int8
    noise of the float tree (the serving-mode guarantee)."""
    from lvv_tpu.config.schema import LLMConfig
    from lvv_tpu.models.qwen import QwenModel, init_cache
    from lvv_tpu.ops.quant import quantize_llm_params
    cfg = LLMConfig(vocab_size=128, hidden_size=64, num_layers=2,
                    num_heads=4, num_kv_heads=2, head_dim=16,
                    intermediate_size=128, tie_word_embeddings=True,
                    special_tokens=())
    model = QwenModel(cfg)
    emb = jnp.asarray(rng.normal(size=(1, 5, 64)) * 0.5, jnp.float32)
    p = model.init(jax.random.PRNGKey(0), emb)["params"]
    pq = quantize_llm_params(p)
    assert "unembed_q" in pq
    assert isinstance(pq["layer_0"]["attn"]["q_proj"]["kernel"], dict)
    # norms / biases untouched
    assert not isinstance(pq["layer_0"]["input_ln"]["scale"], dict)

    cache = init_cache(cfg, 1, 16)
    ref, _ = model.apply({"params": p}, emb,
                         seq_len=jnp.asarray([5]), cache=cache)
    out, _ = model.apply({"params": pq}, emb,
                         seq_len=jnp.asarray([5]), cache=cache)
    ref, out = np.asarray(ref), np.asarray(out)
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05
    # greedy argmax agreement on most positions
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree >= 0.6


@pytest.mark.fast
def test_bf16_generate_with_int8_decode_tree(rng):
    """greedy_generate(params_decode=int8 tree) at model dtype bf16 — the
    exact serving configuration (LVV_BENCH_LLM_INT8=1). Regression: the f32
    unembed scales used to promote the decode-scan logits carry to f32 and
    crash the scan with a carry dtype mismatch."""
    from lvv_tpu import config as C
    from lvv_tpu.models import (VQABatch, VQAModel, greedy_generate,
                                prepare_serving_params)
    cfg = C.tiny_config()
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)
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
    pq = prepare_serving_params(params)
    toks, lens = greedy_generate(
        model, params, batch.bev, batch.images, batch.view_valid,
        batch.text_ids, batch.text_len, max_new_tokens=4, eos_id=2,
        params_decode=pq)
    assert np.asarray(toks).shape == (1, 4)
    assert 0 <= int(lens[0]) <= 4


@pytest.mark.fast
def test_fused_decode_parity():
    """Packed-matmul decode engine (decode_fused.py) produces EXACTLY the
    unfused int8 tree's greedy tokens: q|k|v / gate|up concatenation keeps
    per-column scales, so every output column computes the same sum."""
    from lvv_tpu import config as C
    from lvv_tpu.models import (VQABatch, VQAModel, greedy_generate,
                                prepare_serving_params,
                                prepare_serving_params_fused)
    cfg = C.tiny_config()
    model = VQAModel(cfg.model, dtype=jnp.bfloat16)
    c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
    s = cfg.model.sam.img_size
    rng = np.random.default_rng(5)
    bev = jnp.asarray(rng.normal(size=(1, c, h, w)).astype(np.float32))
    imgs = jnp.asarray(
        rng.uniform(-1, 1, (1, 6, 3, s, s)).astype(np.float32))
    vv = jnp.ones((1, 6), bool)
    ids = jnp.asarray(rng.integers(1, 200, (1, 8)), jnp.int32)
    plen = jnp.full((1,), 8, jnp.int32)
    batch = VQABatch(bev=bev, images=imgs, view_valid=vv, text_ids=ids,
                     text_len=plen, labels=jnp.full_like(ids, -100),
                     use_vision=jnp.asarray(True),
                     use_lidar=jnp.asarray(True))
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    pq = prepare_serving_params(params)
    pf = prepare_serving_params_fused(model, params)
    t_ref, l_ref = greedy_generate(model, params, bev, imgs, vv, ids,
                                   plen, max_new_tokens=6, eos_id=2,
                                   params_decode=pq)
    t_fused, l_fused = greedy_generate(model, params, bev, imgs, vv, ids,
                                       plen, max_new_tokens=6, eos_id=2,
                                       params_decode=pf)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_fused))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_fused))
