"""int8 weight quantization + dequantizing matmul kernel (ops/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.ops.quant import quantize_weight, quantized_matmul


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
