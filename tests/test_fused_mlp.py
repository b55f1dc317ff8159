"""Oracle tests for ops.fused_mlp.ln_mlp_residual (pallas interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.ops.fused_mlp import _xla_forward, ln_mlp_residual


def _inputs(n, c, h, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, c)), dtype)
    ls = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)), jnp.float32)
    lb = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, h)) / np.sqrt(c), dtype)
    b1 = jnp.asarray(0.1 * rng.normal(size=(h,)), dtype)
    w2 = jnp.asarray(rng.normal(size=(h, c)) / np.sqrt(h), dtype)
    b2 = jnp.asarray(0.1 * rng.normal(size=(c,)), dtype)
    return x, ls, lb, w1, b1, w2, b2


@pytest.mark.parametrize("n,c,h,act", [
    (512, 256, 1024, "gelu"),          # single h-chunk
    (300, 256, 512, "quick_gelu"),     # token padding (300 -> 512)
    (64, 128, 256, "gelu_exact"),
])
def test_matches_xla(n, c, h, act):
    args = _inputs(n, c, h)
    want = _xla_forward(*args, 1e-6, act)
    got = ln_mlp_residual(*args, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.fast
def test_h_chunking_matches():
    args = _inputs(256, 256, 1024, seed=3)
    want = ln_mlp_residual(*args, interpret=True)           # one chunk
    got = ln_mlp_residual(*args, block_h=256, interpret=True)  # 4 chunks
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_leading_dims_and_bf16():
    x, *rest = _inputs(192, 256, 512, seed=1, dtype=jnp.bfloat16)
    x3 = x.reshape(4, 48, 256)
    want = _xla_forward(x3, *rest, 1e-6, "gelu")
    got = ln_mlp_residual(x3, *rest, interpret=True)
    assert got.shape == (4, 48, 256) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_custom_vjp_matches_autodiff():
    args = _inputs(128, 256, 512, seed=2)

    def loss_fused(*a):
        return jnp.sum(ln_mlp_residual(*a, interpret=True) ** 2)

    def loss_xla(*a):
        return jnp.sum(_xla_forward(*a, 1e-6, "gelu") ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(*args)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 3, 5))(*args)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=2e-4, atol=2e-4)


def test_sam_block_fused_matches_xla_path():
    from lvv_tpu.models.sam import SAMBlock
    from lvv_tpu.ops import fused_mlp
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
    blk = SAMBlock(num_heads=2, window_size=0, use_rel_pos=False,
                   input_size=(8, 8))
    params = blk.init(jax.random.PRNGKey(0), x)
    want = blk.apply(params, x)
    fused_mlp.set_interpret(True)
    try:
        params_f = blk.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_f)
        got = blk.apply(params, x)
    finally:
        fused_mlp.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_clip_layer_fused_matches_xla_path():
    from lvv_tpu.models.clip import CLIPEncoderLayer
    from lvv_tpu.ops import fused_mlp
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 17, 128)), jnp.float32)
    layer = CLIPEncoderLayer(num_heads=2, intermediate_size=256,
                             lora_rank=4)
    params = layer.init(jax.random.PRNGKey(0), x)
    want = layer.apply(params, x)
    fused_mlp.set_interpret(True)
    try:
        params_f = layer.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_f)
        got = layer.apply(params, x)
    finally:
        fused_mlp.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_norm_fast_matches_xla():
    from lvv_tpu.ops.fused_mlp import norm_fast
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(3, 77, 256)), jnp.float32)
    s = jnp.asarray(1 + 0.1 * rng.normal(size=(256,)), jnp.float32)
    b = jnp.asarray(0.1 * rng.normal(size=(256,)), jnp.float32)
    # LayerNorm
    want = (x - x.mean(-1, keepdims=True)) / np.sqrt(
        np.asarray(x.var(-1, keepdims=True)) + 1e-6) * s + b
    got = norm_fast(x, s, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # RMSNorm
    want = np.asarray(x) / np.sqrt(
        (np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-6) * np.asarray(s)
    got = norm_fast(x, s, rms=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_norm_fast_grads_match():
    from lvv_tpu.ops.fused_mlp import _norm_xla, norm_fast
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    s = jnp.asarray(1 + 0.1 * rng.normal(size=(128,)), jnp.float32)
    b = jnp.asarray(0.1 * rng.normal(size=(128,)), jnp.float32)
    for rms in (False, True):
        gf = jax.grad(lambda *a: jnp.sum(
            norm_fast(*a, rms=rms, interpret=True) ** 2),
            argnums=(0, 1, 2))(x, s, b)
        gx = jax.grad(lambda *a: jnp.sum(
            _norm_xla(*a, 1e-6, rms) ** 2), argnums=(0, 1, 2))(x, s, b)
        for a, w in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                       rtol=2e-4, atol=2e-4)


def test_sam_windowed_block_full_kernel_path():
    """Windowed SAMBlock with EVERY pallas path active (interpret) vs the
    pure-XLA module path — covers window_attention_packed + fused MLP +
    norm_fast end-to-end through the module."""
    import lvv_tpu.models.sam as sam_mod
    from lvv_tpu.ops import fused_mlp
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 128)), jnp.float32)
    blk = sam_mod.SAMBlock(num_heads=2, window_size=4, use_rel_pos=True,
                           input_size=(10, 10))
    params = blk.init(jax.random.PRNGKey(0), x)
    # rel tables are zero-init; randomize so the bias actually matters
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.random.default_rng(3).normal(
            size=p.shape), p.dtype) * 0.1, params)
    want = blk.apply(params, x)
    fused_mlp.set_interpret(True)
    try:
        params_f = blk.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params_f)
        got = blk.apply(params, x)
    finally:
        fused_mlp.set_interpret(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_sam_frozen_trunk_stops_gradients():
    """frozen_trunk (default, = reference freeze of everything but
    net_2/net_3) must zero trunk grads WITHOUT requiring a VJP through the
    attention kernels — this is what lets the full train step compile on
    real TPU where SAM attention runs as pallas calls."""
    import numpy as np
    from lvv_tpu.models.sam import SAMImageEncoder
    enc = SAMImageEncoder(img_size=32, patch_size=8, embed_dim=64, depth=2,
                          num_heads=2, window_size=2,
                          global_attn_indexes=(1,), vary_dims=(16, 32),
                          use_rel_pos=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 32, 32)),
                    jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    g = jax.grad(lambda p: jnp.sum(
        enc.apply({"params": p}, x) ** 2))(params)
    gnorm = jax.tree_util.tree_map(
        lambda t: float(jnp.sum(jnp.abs(t))), g)
    assert gnorm["net_2"]["kernel"] > 0
    assert gnorm["net_3"]["kernel"] > 0
    for name, sub in gnorm.items():
        if name.startswith("block_") or name in ("patch_embed",
                                                 "neck_conv1", "neck_conv2",
                                                 "neck_ln1", "neck_ln2"):
            assert all(v == 0.0 for v in jax.tree_util.tree_leaves(sub)), \
                (name, sub)
