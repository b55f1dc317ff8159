"""Native C++ IO runtime vs numpy/JAX oracles."""
import numpy as np
import pytest

from lvv_tpu import native


def test_load_points_roundtrip(tmp_path, rng):
    raw = rng.normal(size=(100, 5)).astype(np.float32)
    p = tmp_path / "scan.pcd.bin"
    raw.tofile(p)
    pts, n = native.load_points(str(p), max_points=128)
    assert n == 100
    np.testing.assert_array_equal(pts[:100], raw[:, :4])
    assert (pts[100:] == 0).all()
    # truncation
    pts2, n2 = native.load_points(str(p), max_points=50)
    assert n2 == 50
    np.testing.assert_array_equal(pts2, raw[:50, :4])


def test_voxelize_mean_host_matches_jax(rng):
    pts = rng.uniform(-4, 4, (200, 4)).astype(np.float32)
    pr = (-4.0, -4.0, -1.0, 4.0, 4.0, 1.0)
    vs = (1.0, 1.0, 0.5)
    feats, coords, counts, nv = native.voxelize_mean_host(pts, pr, vs, 256)

    import jax.numpy as jnp
    from lvv_tpu.ops.voxelize import VoxelGrid, voxelize_mean
    grid = VoxelGrid.create(pr, vs)
    jx = voxelize_mean(jnp.asarray(pts), jnp.int32(200), grid, 256)
    assert nv == int(jx.num_voxels)
    # order differs (host: first-come; jax: sorted ids) — compare as sets
    nx, ny, _ = grid.grid_size
    def as_map(cs, fs, n):
        return {tuple(cs[i]): fs[i] for i in range(n)}
    host = as_map(coords, feats, nv)
    dev = as_map(np.asarray(jx.coords), np.asarray(jx.features), nv)
    assert set(host) == set(dev)
    for k in host:
        np.testing.assert_allclose(host[k], dev[k], atol=1e-4)


def test_f16_conversion(rng):
    x = rng.normal(size=(64,)).astype(np.float32) * 100
    x[0], x[1] = 1e9, -1e9  # overflow -> inf
    got = native.f32_to_f16(x)
    want = x.astype(np.float16)
    np.testing.assert_array_equal(got.view(np.uint16), want.view(np.uint16))


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_lib_is_used():
    assert native.get_lib() is not None
