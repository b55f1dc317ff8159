"""Qwen decoder parity vs transformers Qwen2ForCausalLM (random weights) +
KV-cache decode self-consistency."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lvv_tpu.config.schema import LLMConfig
from lvv_tpu.convert import merge_params
from lvv_tpu.convert.qwen_hf import convert_qwen_state
from lvv_tpu.models.qwen import (QwenModel, cross_entropy_loss, init_cache)

SMALL = LLMConfig(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=8, intermediate_size=64,
                  rope_theta=10000.0, max_position_embeddings=64,
                  tie_word_embeddings=True)


def _oracle():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    tc = Qwen2Config(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     intermediate_size=64, rope_theta=10000.0,
                     max_position_embeddings=64, tie_word_embeddings=True,
                     rms_norm_eps=1e-6, attention_dropout=0.0)
    torch.manual_seed(0)
    return Qwen2ForCausalLM(tc).eval()


def _converted_params(model, key):
    oracle = _oracle()
    ids = jnp.zeros((1, 4), jnp.int32)
    e = model.init(key, jnp.zeros((1, 4, 32)))["params"]
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = merge_params(e, convert_qwen_state(sd, num_layers=2))
    return oracle, params


def test_qwen_logits_match_hf(key):
    model = QwenModel(SMALL)
    oracle, params = _converted_params(model, key)
    ids = np.random.default_rng(0).integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(ids)).logits.numpy()
    embeds = model.apply({"params": params}, jnp.asarray(ids),
                         method=QwenModel.embed)
    logits = model.apply({"params": params}, embeds)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4, rtol=3e-4)


def test_qwen_padded_batch_matches_unpadded(key):
    """Right padding + seq_len mask must not change valid-position logits."""
    model = QwenModel(SMALL)
    _, params = _converted_params(model, key)
    ids = np.random.default_rng(1).integers(0, 128, (1, 6))
    emb = model.apply({"params": params}, jnp.asarray(ids),
                      method=QwenModel.embed)
    full = model.apply({"params": params}, emb)
    padded = jnp.pad(emb, ((0, 0), (0, 4), (0, 0)))
    out = model.apply({"params": params}, padded,
                      seq_len=jnp.asarray([6], jnp.int32))
    np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_decode_matches_prefill(key):
    """Greedy KV-cache decode must reproduce teacher-forced argmax chain."""
    model = QwenModel(SMALL)
    _, params = _converted_params(model, key)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 128, (2, 5))

    emb = model.apply({"params": params}, jnp.asarray(prompt),
                      method=QwenModel.embed)
    logits = model.apply({"params": params}, emb)
    # teacher-forced continuation of 4 greedy tokens
    ref_tokens = []
    ids = jnp.asarray(prompt)
    for _ in range(4):
        emb = model.apply({"params": params}, ids, method=QwenModel.embed)
        lg = model.apply({"params": params}, emb)
        nxt = jnp.argmax(lg[:, -1], axis=-1)
        ref_tokens.append(np.asarray(nxt))
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)

    # cached decode: prefill via full forward, then 1-token steps
    cache = init_cache(SMALL, batch=2, max_len=16)
    # prefill by stepping token by token (exercises the cache write path)
    toks = jnp.asarray(prompt)
    last_logits = None
    for t in range(prompt.shape[1]):
        emb = model.apply({"params": params}, toks[:, t:t + 1],
                          method=QwenModel.embed)
        pos = cache.length[:, None]
        last_logits, cache = model.apply({"params": params}, emb,
                                         positions=pos, cache=cache)
    got = []
    for _ in range(4):
        nxt = jnp.argmax(last_logits[:, -1], axis=-1)
        got.append(np.asarray(nxt))
        emb = model.apply({"params": params}, nxt[:, None],
                          method=QwenModel.embed)
        pos = cache.length[:, None]
        last_logits, cache = model.apply({"params": params}, emb,
                                         positions=pos, cache=cache)
    np.testing.assert_array_equal(np.stack(got), np.stack(ref_tokens))


def test_extra_token_rows(key):
    model = QwenModel(SMALL, extra_tokens=4)
    e = model.init(key, jnp.zeros((1, 2, 32)))["params"]
    assert e["embed_tokens"]["embedding"].shape == (132, 32)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_cross_entropy_masking():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[-100, 2, -100, 3]])
    loss, count = cross_entropy_loss(logits, labels)
    assert int(count) == 2
    np.testing.assert_allclose(float(loss), np.log(8), atol=1e-5)


def test_lora_params_exist(key):
    model = QwenModel(SMALL, lora_rank=4, lora_alpha=8)
    p = model.init(key, jnp.zeros((1, 2, 32)))["params"]
    attn = p["layer_0"]["attn"]["q_proj"]
    assert "lora_a" in attn and attn["lora_a"].shape == (32, 4)
