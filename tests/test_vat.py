"""VAT family tests (reference training-test/test_vat_*.py style: shape
contracts across configs + sector-geometry validation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.models.vat import (NUM_VIEWS, VATBlock, VATLiDAR, VATVision,
                                VisionAdapter, bev_geometry)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_vat_block_shapes(key):
    blk = VATBlock(num_heads=2)
    q = jnp.ones((2, 8, 32))
    kv = jnp.ones((2, 50, 32))
    params = blk.init(key, q, kv)
    out = blk.apply(params, q, kv)
    assert out.shape == (2, 8, 32)


@pytest.mark.parametrize("h,w", [(12, 12), (24, 24), (10, 16)])
def test_vat_lidar_shapes(key, h, w):
    m = VATLiDAR(d_model=64, n_queries=12, n_blocks=2, n_heads=2,
                 pe_hidden=16)
    bev = jax.random.normal(key, (2, 16, h, w))
    params = m.init(key, bev)
    out = m.apply(params, bev)
    assert out.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_bev_geometry_sectors():
    """Six 60-degree polar sectors with the reference's camera-aligned
    numbering (vat_lidar.py:127-186: front=0, front_right=1, front_left=2,
    back=3, back_right=4, back_left=5)."""
    geo, sector = bev_geometry(24, 24)
    assert geo.shape == (576, 5) and sector.shape == (576,)
    assert set(np.unique(sector)) == set(range(NUM_VIEWS))
    # radius clamped to [0,1]; sin/cos consistent with x,y
    assert geo[:, 2].max() <= 1.0 + 1e-6
    theta = np.arctan2(geo[:, 1], geo[:, 0])
    np.testing.assert_allclose(np.sin(theta), geo[:, 3], atol=1e-5)
    pi = np.pi
    bands = {0: (pi / 3, 2 * pi / 3), 1: (0.0, pi / 3),
             2: (2 * pi / 3, pi), 3: (-2 * pi / 3, -pi / 3),
             4: (-pi / 3, 0.0), 5: (-pi, -2 * pi / 3)}
    for s, (lo, hi) in bands.items():
        th = theta[sector == s]
        assert ((th >= lo - 1e-5) & (th <= hi + 1e-5)).all(), s


def test_vat_lidar_grad_flows(key):
    m = VATLiDAR(d_model=32, n_queries=6, n_blocks=1, n_heads=2, pe_hidden=8)
    bev = jax.random.normal(key, (1, 8, 12, 12))
    params = m.init(key, bev)

    def loss(p):
        return jnp.sum(m.apply(p, bev) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    norms = [float(jnp.abs(l).max()) for l in leaves]
    assert max(norms) > 0


@pytest.mark.parametrize("cf,per_view", [(2, True), (8, True), (3, False)])
def test_vat_vision_shapes(key, cf, per_view):
    n_tokens = 48
    m = VATVision(d_in=64, d_model=32, n_tokens=n_tokens,
                  compression_factor=cf, n_blocks=1, n_heads=2,
                  per_view_queries=per_view)
    kv = jax.random.normal(key, (2, n_tokens, 64))
    params = m.init(key, kv)
    out = m.apply(params, kv)
    assert out.shape == (2, n_tokens // cf, 32)


def test_vat_vision_per_view_auto_disable(key):
    """n_q % 6 != 0 must silently disable per-view embeds
    (reference vat_vision.py:74-96)."""
    m = VATVision(d_in=32, d_model=16, n_tokens=20, compression_factor=4,
                  n_blocks=1, n_heads=2, per_view_queries=True)  # n_q=5
    kv = jnp.ones((1, 20, 32))
    params = m.init(key, kv)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("view_embed" in n for n in names)


def test_vision_adapter(key):
    m = VisionAdapter(d_model=32)
    x = jax.random.normal(key, (2, 6, 10, 32))
    params = m.init(key, x)
    out = m.apply(params, x)
    assert out.shape == (2, 60, 32)
    # view embedding must distinguish identical inputs across views
    same = jnp.ones((1, 6, 10, 32))
    out2 = np.asarray(m.apply(params, same)).reshape(6, 10, 32)
    assert not np.allclose(out2[0], out2[1])


def test_lora_dense_starts_as_identity(key):
    """LoRA b is zero-init: adapter output == base output at init."""
    from lvv_tpu.models.layers import Dense
    x = jax.random.normal(key, (2, 16))
    base = Dense(8)
    lora = Dense(8, lora_rank=4, lora_alpha=8)
    pb = base.init(key, x)
    pl = lora.init(key, x)
    # same base kernel/bias
    pl = jax.tree_util.tree_map(lambda a: a, pl)
    pl["params"]["kernel"] = pb["params"]["kernel"]
    pl["params"]["bias"] = pb["params"]["bias"]
    np.testing.assert_allclose(np.asarray(base.apply(pb, x)),
                               np.asarray(lora.apply(pl, x)), atol=1e-6)
    assert pl["params"]["lora_a"].shape == (16, 4)
