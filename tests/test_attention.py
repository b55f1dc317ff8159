"""Flash-attention kernel vs XLA reference (numeric golden tests — the
reference repo has none; SURVEY.md §4 calls for adding them)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.ops.attention import (attention, attention_reference,
                                   decode_attention, flash_attention)


def _rand(key, *shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


def _mk(key, b, hq, hkv, sq, sk, d):
    kq, kk, kv = jax.random.split(key, 3)
    return (_rand(kq, b, hq, sq, d), _rand(kk, b, hkv, sk, d),
            _rand(kv, b, hkv, sk, d))


@pytest.mark.parametrize("b,hq,hkv,sq,sk,d,causal", [
    (1, 2, 2, 128, 128, 64, False),     # encoder, aligned
    (2, 4, 2, 128, 128, 64, True),      # GQA causal (LLM shapes)
    (1, 2, 2, 96, 200, 64, False),      # unaligned -> padding path
    (2, 2, 2, 256, 256, 48, True),      # head-dim padding
    (1, 8, 8, 64, 384, 112, False),     # VAT head dim 112 cross-attn
])
def test_flash_matches_reference(key, b, hq, hkv, sq, sk, d, causal):
    q, k, v = _mk(key, b, hq, hkv, sq, sk, d)
    ref = attention_reference(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_kv_len_mask(key):
    b, h, sq, sk, d = 2, 2, 128, 256, 64
    q, k, v = _mk(key, b, h, h, sq, sk, d)
    kv_len = jnp.array([100, 256], jnp.int32)
    ref = attention_reference(q, k, v, kv_len=kv_len)
    out = flash_attention(q, k, v, kv_len=kv_len, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # the masked region must actually change the result
    full = attention_reference(q, k, v)
    assert not np.allclose(np.asarray(full[0]), np.asarray(ref[0]))


def test_flash_causal_plus_kvlen(key):
    b, h, s, d = 2, 2, 128, 64
    q, k, v = _mk(key, b, h, h, s, s, d)
    kv_len = jnp.array([77, 128], jnp.int32)
    ref = attention_reference(q, k, v, causal=True, kv_len=kv_len)
    out = flash_attention(q, k, v, causal=True, kv_len=kv_len, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_bf16(key):
    q, k, v = _mk(key, 1, 2, 2, 128, 128, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = attention_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_decode_attention_matches_full(key):
    """KV-cache decode == full attention's last-position output."""
    b, hq, hkv, s, d = 2, 4, 2, 64, 64
    q, k, v = _mk(key, b, hq, hkv, s, s, d)
    full = attention_reference(q, k, v, causal=True)
    smax = 96
    kc = jnp.pad(k, ((0, 0), (0, 0), (0, smax - s), (0, 0)))
    vc = jnp.pad(v, ((0, 0), (0, 0), (0, smax - s), (0, 0)))
    out = decode_attention(q[:, :, -1:], kc, vc,
                           jnp.full((b,), s, jnp.int32))
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(full[:, :, -1]), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.fast
def test_dispatcher_reference_on_cpu(key):
    q, k, v = _mk(key, 1, 2, 2, 64, 64, 32)
    out = attention(q, k, v, causal=True)  # CPU -> reference path
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_flash_attention_grads_match_reference():
    """custom-VJP flash backward (XLA recompute) vs reference autodiff —
    the LLM-LoRA training path differentiates through causal attention."""
    import numpy as np
    from lvv_tpu.ops.attention import attention_reference, flash_attention
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 2, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    kv_len = jnp.asarray([200, 256], jnp.int32)

    for kwargs in ({"causal": True}, {"kv_len": kv_len},
                   {"causal": True, "kv_len": kv_len}):
        gf = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
            q, k, v, block_q=128, block_k=128, interpret=True,
            **kwargs) ** 2), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(attention_reference(
            q, k, v, **kwargs) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, w in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                       rtol=2e-4, atol=2e-4)
