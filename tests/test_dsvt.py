"""DSVT backbone tests: window bucketing contract + forward/grad."""
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.models.dsvt import (DSVTBackbone, DSVTBlock,
                                 window_partition_sparse)
from lvv_tpu.ops.sparse import from_voxels


def _sparse(rng, grid=(16, 16, 4), n=40, c=8, cap=64):
    nx, ny, nz = grid
    lin = rng.choice(nx * ny * nz, size=n, replace=False)
    z, y, x = lin // (nx * ny), (lin // nx) % ny, lin % nx
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n] = np.stack([z, y, x], 1)
    feats = np.zeros((cap, c), np.float32)
    feats[:n] = rng.normal(size=(n, c))
    return from_voxels(jnp.asarray(coords), jnp.asarray(feats), grid)


def test_window_partition_groups_neighbors(rng):
    st = _sparse(rng)
    wid, slot, ok = window_partition_sparse(st, (4, 4, 4), max_windows=64,
                                            capacity=16)
    wid, slot, ok = np.asarray(wid), np.asarray(slot), np.asarray(ok)
    from lvv_tpu.ops.sparse import delinearize
    coords = np.asarray(delinearize(st.ids, st.grid))
    for i in np.nonzero(ok)[0]:
        for j in np.nonzero(ok)[0]:
            same_window = (coords[i] // 4 == coords[j] // 4).all()
            assert (wid[i] == wid[j]) == same_window
    # slots unique within a window
    for w in np.unique(wid[ok]):
        s = slot[ok & (wid == w)]
        assert len(set(s.tolist())) == len(s)


def test_dsvt_block_preserves_structure(rng):
    st = _sparse(rng)
    blk = DSVTBlock(num_heads=2, window=(4, 4, 4), max_windows=64,
                    capacity=16)
    params = blk.init(jax.random.PRNGKey(0), st)
    out = blk.apply(params, st)
    assert out.ids.shape == st.ids.shape
    np.testing.assert_array_equal(np.asarray(out.ids), np.asarray(st.ids))
    # padded rows stay zero
    inactive = ~np.asarray(st.valid)
    assert np.abs(np.asarray(out.features)[inactive]).max() == 0


def test_dsvt_backbone_forward_and_grad(rng):
    st = _sparse(rng)
    bb = DSVTBackbone(channels=16, num_blocks=2, num_heads=2,
                      window=(4, 4, 4), max_windows=64, capacity=16)
    params = bb.init(jax.random.PRNGKey(0), st)
    out = bb.apply(params, st)
    assert out.features.shape == (st.ids.shape[0], 16)
    assert np.isfinite(np.asarray(out.features)).all()

    def loss(p):
        return jnp.sum(bb.apply(p, st).features ** 2)

    g = jax.grad(loss)(params)
    assert max(float(jnp.abs(l).max())
               for l in jax.tree_util.tree_leaves(g)) > 0
