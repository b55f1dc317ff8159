"""flash_attention_relpos vs the materialized-bias oracle."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.ops.attention import attention_reference, flash_attention_relpos


@pytest.mark.parametrize("gh,gw,d", [(4, 64, 64), (8, 32, 64), (2, 128, 64),
                                     # s=1024 > 512: streaming (non-mh) path
                                     (8, 128, 64)])
@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_relpos_flash_matches_bias_oracle(key, gh, gw, d):
    b, h = 1, 2
    s = gh * gw
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    q_rh = jax.random.normal(ks[3], (b, h, s, gh)) * 0.3
    q_rw = jax.random.normal(ks[4], (b, h, s, gw)) * 0.3

    # oracle: materialize bias[q, kv] = q_rh[q, kv//gw] + q_rw[q, kv%gw]
    kv = np.arange(s)
    bias = (np.asarray(q_rh)[..., kv // gw]
            + np.asarray(q_rw)[..., kv % gw])
    # index trick above gathers wrong axis; build explicitly
    bias = np.zeros((b, h, s, s), np.float32)
    for i in range(s):
        bias[..., i] = np.asarray(q_rh)[..., i // gw] + \
            np.asarray(q_rw)[..., i % gw]
    ref = attention_reference(q, k, v, bias=jnp.asarray(bias),
                              scale=1.0 / math.sqrt(d))

    out = flash_attention_relpos(q, k, v, q_rh, q_rw,
                                 scale=1.0 / math.sqrt(d), grid_w=gw,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("gh,gw,d,blk", [(14, 14, 64, 256),   # SAM window
                                         (6, 14, 64, 128)])   # ragged pad
def test_relpos_flash_padded_window(key, gh, gw, d, blk):
    """Non-lane-aligned S (e.g. 196-token SAM windows) pads to a block and
    masks the padded kv columns — must still match the bias oracle."""
    b, h = 3, 2
    s = gh * gw
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    q_rh = jax.random.normal(ks[3], (b, h, s, gh)) * 0.3
    q_rw = jax.random.normal(ks[4], (b, h, s, gw)) * 0.3

    bias = np.zeros((b, h, s, s), np.float32)
    for i in range(s):
        bias[..., i] = np.asarray(q_rh)[..., i // gw] + \
            np.asarray(q_rw)[..., i % gw]
    ref = attention_reference(q, k, v, bias=jnp.asarray(bias),
                              scale=1.0 / math.sqrt(d))
    out = flash_attention_relpos(q, k, v, q_rh, q_rw,
                                 scale=1.0 / math.sqrt(d), grid_w=gw,
                                 block_q=blk, block_k=blk, interpret=True)
    assert out.shape == (b, h, s, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("win,heads,hd", [(4, 2, 32), (7, 3, 64)])
def test_window_attention_packed_matches_oracle(key, win, heads, hd):
    """Packed-qkv window kernel vs materialized-bias oracle."""
    import numpy as np
    from lvv_tpu.ops.attention import window_attention_packed
    b, s, c = 3, win * win, heads * hd
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, heads, s, hd))
    k = jax.random.normal(ks[1], (b, heads, s, hd))
    v = jax.random.normal(ks[2], (b, heads, s, hd))
    rel_h = jax.random.normal(ks[3], (win, win, hd)) * 0.3
    rel_w = jax.random.normal(ks[4], (win, win, hd)) * 0.3

    # oracle bias[b,h,t,kt] = q·rel_h[qh(t),kh(kt)] + q·rel_w[qw(t),kw(kt)]
    qn = np.asarray(q)
    bias = np.zeros((b, heads, s, s), np.float32)
    for t in range(s):
        for kt in range(s):
            bias[:, :, t, kt] = (
                (qn[:, :, t] * np.asarray(rel_h)[t // win, kt // win]).sum(-1)
                + (qn[:, :, t] * np.asarray(rel_w)[t % win, kt % win]).sum(-1))
    ref = attention_reference(q, k, v, bias=jnp.asarray(bias),
                              scale=1.0 / math.sqrt(hd))
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(b, s, c)

    # pack [q heads | k heads | v heads] like the qkv Dense output
    def merge(x):
        return np.asarray(x).transpose(0, 2, 1, 3).reshape(b, s, c)
    qkv = jnp.asarray(np.concatenate([merge(q), merge(k), merge(v)], -1))
    out = window_attention_packed(qkv, rel_h, rel_w,
                                  scale=1.0 / math.sqrt(hd), heads=heads,
                                  win=win, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bq,bk", [(1024, 1024), (512, 256), (256, 1024)])
def test_relpos_fused_matches_bias_oracle(key, bq, bk):
    """flash_attention_relpos_fused (bias_h folded into the augmented score
    contraction, exp2 softmax) vs the materialized-bias oracle, across tile
    splits — including multi-kv-tile online-softmax carries."""
    from lvv_tpu.ops.attention import flash_attention_relpos_fused
    b, h, gh, gw, d = 1, 2, 8, 128, 64
    s = gh * gw
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    q_rh = jax.random.normal(ks[3], (b, h, s, gh)) * 0.3
    q_rw = jax.random.normal(ks[4], (b, h, s, gw)) * 0.3

    bias = np.zeros((b, h, s, s), np.float32)
    for i in range(s):
        bias[..., i] = np.asarray(q_rh)[..., i // gw] + \
            np.asarray(q_rw)[..., i % gw]
    ref = attention_reference(q, k, v, bias=jnp.asarray(bias),
                              scale=1.0 / math.sqrt(d))
    out = flash_attention_relpos_fused(q, k, v, q_rh, q_rw,
                                       scale=1.0 / math.sqrt(d), grid_w=gw,
                                       block_q=bq, block_k=bk,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_relpos_dispatch_prefers_fused_and_matches_streaming(key):
    """The public entry dispatches aligned big-S cases to the fused kernel;
    fused=False keeps the streaming kernel — both must agree."""
    b, h, gh, gw, d = 1, 2, 8, 128, 64
    s = gh * gw
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    q_rh = jax.random.normal(ks[3], (b, h, s, gh)) * 0.3
    q_rw = jax.random.normal(ks[4], (b, h, s, gw)) * 0.3
    kw = dict(scale=1.0 / math.sqrt(d), grid_w=gw, block_q=512,
              block_k=512, interpret=True)
    fused = flash_attention_relpos(q, k, v, q_rh, q_rw, **kw)
    stream = flash_attention_relpos(q, k, v, q_rh, q_rw, fused=False, **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(stream),
                               atol=2e-5, rtol=2e-5)


def test_flash_relpos_quant8_close_to_float(rng):
    """int8 p@v path (serving mode): within int8 noise of the float
    kernel on the streaming (large-S) path."""
    import jax.numpy as jnp
    from lvv_tpu.ops.attention import flash_attention_relpos
    b, h, gh, gw, d = 1, 2, 32, 32, 64
    s = gh * gw
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    qrh = jnp.asarray(rng.normal(size=(b, h, s, gh)) * 0.1, jnp.float32)
    qrw = jnp.asarray(rng.normal(size=(b, h, s, gw)) * 0.1, jnp.float32)
    kw = dict(scale=0.125, grid_w=gw, block_q=512, block_k=512,
              interpret=True)
    ref = np.asarray(flash_attention_relpos(q, k, v, qrh, qrw, **kw))
    out = np.asarray(flash_attention_relpos(q, k, v, qrh, qrw, quant8=True,
                                            **kw))
    # error bound is set by the QUANTIZED operands' scales, not the output
    # scale (attention averages random v toward 0): v-quant error <= half a
    # step = max|v| / 254, plus p-quant noise of the same order
    v_scale = np.abs(np.asarray(v)).max()
    assert np.abs(out - ref).max() <= 2.5 * v_scale / 254
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03


@pytest.mark.parametrize("win,heads,hd", [(4, 2, 32), (7, 3, 64),
                                          (14, 12, 64)])
def test_window_attention_fused_matches_oracle(key, win, heads, hd):
    """Fused-bias window kernel (bias folded into the augmented score
    contraction, exp2 softmax) vs the materialized-bias oracle."""
    import numpy as np
    from lvv_tpu.ops.attention import window_attention_fused
    b, s, c = 2, win * win, heads * hd
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, heads, s, hd))
    k = jax.random.normal(ks[1], (b, heads, s, hd))
    v = jax.random.normal(ks[2], (b, heads, s, hd))
    rel_h = jax.random.normal(ks[3], (win, win, hd)) * 0.3
    rel_w = jax.random.normal(ks[4], (win, win, hd)) * 0.3

    qn = np.asarray(q)
    bias = np.zeros((b, heads, s, s), np.float32)
    for t in range(s):
        for kt in range(s):
            bias[:, :, t, kt] = (
                (qn[:, :, t] * np.asarray(rel_h)[t // win, kt // win]).sum(-1)
                + (qn[:, :, t] * np.asarray(rel_w)[t % win, kt % win]).sum(-1))
    ref = attention_reference(q, k, v, bias=jnp.asarray(bias),
                              scale=1.0 / math.sqrt(hd))
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(b, s, c)

    def merge(x):
        return np.asarray(x).transpose(0, 2, 1, 3).reshape(b, s, c)
    qkv = jnp.asarray(np.concatenate([merge(q), merge(k), merge(v)], -1))
    out = window_attention_fused(qkv, rel_h, rel_w,
                                 scale=1.0 / math.sqrt(hd), heads=heads,
                                 win=win, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bq,bk", [(1024, 256), (512, 512)])
def test_relpos_hpacked_matches_bias_oracle(key, bq, bk):
    """flash_attention_relpos_hpacked (head-packed lane-block layout,
    q·R einsums computed inside the wrapper from raw packed qkv) vs the
    materialized-bias oracle."""
    from lvv_tpu.ops.attention import flash_attention_relpos_hpacked
    b, heads, gh, gw, d = 1, 2, 8, 128, 64
    s = gh * gw
    c = heads * d
    ks = jax.random.split(key, 3)
    qkv = jax.random.normal(ks[0], (b, s, 3 * c)) * 0.5
    rel_h = jax.random.normal(ks[1], (gh, gh, d)) * 0.1
    rel_w = jax.random.normal(ks[2], (gw, gw, d)) * 0.1

    qr = np.asarray(qkv[..., :c].reshape(b, s, heads, d).transpose(0, 2, 1, 3))
    kr = np.asarray(
        qkv[..., c:2 * c].reshape(b, s, heads, d).transpose(0, 2, 1, 3))
    vr = np.asarray(
        qkv[..., 2 * c:].reshape(b, s, heads, d).transpose(0, 2, 1, 3))
    rh = np.asarray(rel_h)
    rw = np.asarray(rel_w)
    bias = np.zeros((b, heads, s, s), np.float32)
    for t in range(s):
        qh, qw = t // gw, t % gw
        # bias[t, j] = q[t]·rh[qh, kh(j)] + q[t]·rw[qw, kw(j)]
        brh = qr[:, :, t] @ rh[qh].T          # [b, h, gh]
        brw = qr[:, :, t] @ rw[qw].T          # [b, h, gw]
        for j in range(s):
            bias[:, :, t, j] = brh[..., j // gw] + brw[..., j % gw]
    ref = attention_reference(jnp.asarray(qr), jnp.asarray(kr),
                              jnp.asarray(vr), bias=jnp.asarray(bias),
                              scale=1.0 / math.sqrt(d))
    ref_m = np.asarray(ref).transpose(0, 2, 1, 3).reshape(b, s, c)
    out = flash_attention_relpos_hpacked(
        qkv, rel_h, rel_w, scale=1.0 / math.sqrt(d), grid_w=gw,
        heads=heads, block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref_m, atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("win,heads,hd", [(4, 2, 32), (7, 3, 64)])
def test_window_attention_fused2_matches_packed(key, win, heads, hd):
    """window_attention_fused2 (bias via a second dot against the one-hot
    table) vs window_attention_packed on the same packed qkv."""
    from lvv_tpu.ops.attention import (window_attention_fused2,
                                       window_attention_packed)
    s = win * win
    c = heads * hd
    qkv = jax.random.normal(key, (3, s, 3 * c)) * 0.5
    ks = jax.random.split(key, 2)
    rel_h = jax.random.normal(ks[0], (win, win, hd)) * 0.2
    rel_w = jax.random.normal(ks[1], (win, win, hd)) * 0.2
    scale = 1.0 / math.sqrt(hd)
    a = window_attention_packed(qkv, rel_h, rel_w, scale=scale,
                                heads=heads, win=win, interpret=True)
    b = window_attention_fused2(qkv, rel_h, rel_w, scale=scale,
                                heads=heads, win=win, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.fast
def test_relpos_hpacked_qk8_close_to_float(key):
    """int8-score-matmul variant (qk8): outputs stay within int8 logit
    noise of the float hpacked kernel — the serving-mode guarantee for
    the LVV_Q8_SCOPE=...,qk path."""
    from lvv_tpu.ops.attention import flash_attention_relpos_hpacked
    # grid_w 64 like the product SAM global shape (qk8 stashes its scales
    # in qrw lane grid_w / v lane d, so it needs grid_w < 128 free lanes)
    b, heads, gh, gw, d = 1, 2, 8, 64, 64
    s = gh * gw
    c = heads * d
    ks = jax.random.split(key, 3)
    qkv = jax.random.normal(ks[0], (b, s, 3 * c)) * 0.5
    rel_h = jax.random.normal(ks[1], (gh, gh, d)) * 0.1
    rel_w = jax.random.normal(ks[2], (gw, gw, d)) * 0.1
    kw = dict(scale=1.0 / math.sqrt(d), grid_w=gw, heads=heads,
              block_q=512, block_k=256, interpret=True)
    ref = np.asarray(flash_attention_relpos_hpacked(
        qkv, rel_h, rel_w, **kw))
    got = np.asarray(flash_attention_relpos_hpacked(
        qkv, rel_h, rel_w, qk8=True, **kw))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
