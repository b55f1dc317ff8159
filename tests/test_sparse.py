"""Sparse conv vs dense torch oracle (the contract of spconv's SubMConv /
SparseConv, which the reference consumes via spconv_utils.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lvv_tpu.ops.sparse import (SENTINEL, SparseTensor, bev_collapse,
                                from_voxels, merge_add, reindex_upscale,
                                sparse_conv, submanifold_conv, to_dense)


def _random_sparse(rng, grid, n_active, cin, cap=64):
    nx, ny, nz = grid
    lin = rng.choice(nx * ny * nz, size=n_active, replace=False)
    z, y, x = lin // (nx * ny), (lin // nx) % ny, lin % nx
    coords = np.stack([z, y, x], 1).astype(np.int32)
    feats = rng.normal(size=(n_active, cin)).astype(np.float32)
    coords_p = np.full((cap, 3), -1, np.int32)
    feats_p = np.zeros((cap, cin), np.float32)
    coords_p[:n_active] = coords
    feats_p[:n_active] = feats
    st = from_voxels(jnp.asarray(coords_p), jnp.asarray(feats_p), grid)
    return st, coords, feats


def _dense_from(st: SparseTensor):
    return np.asarray(to_dense(st))  # [C, nz, ny, nx]


def _torch_conv3d(dense_cin, weight_k, stride, padding):
    # dense_cin [C, nz, ny, nx]; weight [K^3, Cin, Cout] centered-offset order
    cin = dense_cin.shape[0]
    k3, _, cout = weight_k.shape
    k = round(k3 ** (1 / 3))
    w = weight_k.reshape(k, k, k, cin, cout)  # (dz, dy, dx, cin, cout)
    wt = torch.from_numpy(np.transpose(w, (4, 3, 0, 1, 2)).copy())
    x = torch.from_numpy(dense_cin[None])
    out = torch.nn.functional.conv3d(x, wt, stride=stride, padding=padding)
    return out[0].numpy()  # [Cout, nz', ny', nx']


@pytest.mark.fast
def test_submanifold_matches_dense_on_active_sites(rng):
    grid = (6, 5, 4)  # nx, ny, nz
    st, coords, feats = _random_sparse(rng, grid, n_active=20, cin=3)
    w = rng.normal(size=(27, 3, 5)).astype(np.float32) * 0.1
    out = submanifold_conv(st, jnp.asarray(w))
    dense_ref = _torch_conv3d(_dense_from(st), w, stride=1, padding=1)
    got_dense = _dense_from(out)
    # submanifold: only ACTIVE sites carry output; compare there
    for (z, y, x) in coords:
        np.testing.assert_allclose(got_dense[:, z, y, x],
                                   dense_ref[:, z, y, x], atol=1e-4)
    # inactive sites stay empty (submanifold property)
    mask = np.zeros(grid[::-1], bool)
    mask[coords[:, 0], coords[:, 1], coords[:, 2]] = True
    assert np.abs(got_dense[:, ~mask]).max() == 0


def test_sparse_conv_stride2_matches_dense(rng):
    grid = (8, 8, 4)
    st, coords, feats = _random_sparse(rng, grid, n_active=25, cin=3, cap=128)
    w = rng.normal(size=(27, 3, 4)).astype(np.float32) * 0.1
    out = sparse_conv(st, jnp.asarray(w), stride=2, padding=1,
                      out_capacity=128)
    dense_ref = _torch_conv3d(_dense_from(st), w, stride=2, padding=1)
    got = _dense_from(out)
    assert got.shape == dense_ref.shape
    np.testing.assert_allclose(got, dense_ref, atol=1e-4)


def test_sparse_conv2d_on_bev(rng):
    grid = (8, 8, 1)
    st, coords, feats = _random_sparse(rng, grid, n_active=12, cin=4, cap=64)
    w = rng.normal(size=(9, 4, 6)).astype(np.float32) * 0.1
    out = submanifold_conv(st, jnp.asarray(w), ndim2d=True)
    # oracle: 2D conv on the z=0 plane
    k = 3
    wt = torch.from_numpy(np.transpose(
        w.reshape(k, k, 4, 6), (3, 2, 0, 1)).copy())
    x = torch.from_numpy(_dense_from(st)[:, 0][None])
    ref = torch.nn.functional.conv2d(x, wt, padding=1)[0].numpy()
    got = _dense_from(out)[:, 0]
    for (z, y, x_) in coords:
        np.testing.assert_allclose(got[:, y, x_], ref[:, y, x_], atol=1e-4)


def test_bev_collapse_sums_z(rng):
    grid = (4, 4, 3)
    coords = np.array([[0, 1, 1], [1, 1, 1], [2, 1, 1], [0, 2, 3]], np.int32)
    feats = np.array([[1.0], [2.0], [4.0], [10.0]], np.float32)
    cp = np.full((8, 3), -1, np.int32)
    fp = np.zeros((8, 1), np.float32)
    cp[:4], fp[:4] = coords, feats
    st = from_voxels(jnp.asarray(cp), jnp.asarray(fp), grid)
    bev = bev_collapse(st)
    dense = _dense_from(bev)[0, 0]  # [ny, nx]
    assert dense[1, 1] == 7.0
    assert dense[2, 3] == 10.0
    assert dense.sum() == 17.0


def test_reindex_and_merge(rng):
    fine = (8, 8, 1)
    coarse = (4, 4, 1)
    cp = np.full((4, 3), -1, np.int32)
    cp[0] = [0, 1, 2]
    fp = np.zeros((4, 2), np.float32)
    fp[0] = [1.0, 2.0]
    st_c = from_voxels(jnp.asarray(cp), jnp.asarray(fp), coarse)
    up = reindex_upscale(st_c, 2, fine)
    d = _dense_from(up)
    assert d[0, 0, 2, 4] == 1.0  # (y=1,x=2) -> (2,4)
    merged = merge_add(up, up, capacity=8)
    assert _dense_from(merged)[0, 0, 2, 4] == 2.0


def test_gradients_flow_through_sparse_conv(rng):
    import jax
    grid = (6, 6, 2)
    st, coords, feats = _random_sparse(rng, grid, n_active=10, cin=3)
    w = jnp.asarray(rng.normal(size=(27, 3, 3)).astype(np.float32) * 0.1)

    def loss(w):
        out = submanifold_conv(st, w)
        out2 = sparse_conv(out, w, stride=2, padding=1, out_capacity=64)
        return jnp.sum(out2.features ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_shared_rulebook_matches_fresh():
    """A rulebook from build_subm_rulebook reused across convs on the same
    active set gives identical results to per-conv construction (spconv
    indice_key semantics)."""
    import numpy as np
    from lvv_tpu.ops.sparse import (build_subm_rulebook, from_voxels,
                                    submanifold_conv)
    rng = np.random.default_rng(7)
    grid = (12, 12, 6)
    n = 64
    coords = np.stack([rng.integers(0, 6, n), rng.integers(0, 12, n),
                       rng.integers(0, 12, n)], axis=1).astype(np.int32)
    coords[50:] = -1  # padding rows
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    st = from_voxels(jnp.asarray(coords), jnp.asarray(feats), grid)
    w1 = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.normal(size=(27, 16, 8)).astype(np.float32)) * 0.1
    rb = build_subm_rulebook(st)
    a1 = submanifold_conv(st, w1, rulebook=rb)
    b1 = submanifold_conv(st, w1)
    np.testing.assert_allclose(np.asarray(a1.features),
                               np.asarray(b1.features), atol=1e-5)
    # second conv on the same set reuses the same rulebook
    a2 = submanifold_conv(a1, w2, rulebook=rb)
    b2 = submanifold_conv(b1, w2)
    np.testing.assert_allclose(np.asarray(a2.features),
                               np.asarray(b2.features), atol=1e-5)


def test_gather_conv_matches_sorted_fallback(rng, monkeypatch):
    """The output-centric gather formulation and the sort+segment-sum
    fallback produce the same active set and features, including under
    capacity overflow (both keep the lowest-id sites)."""
    import lvv_tpu.ops.sparse as S
    grid = (8, 8, 4)
    st, coords, feats = _random_sparse(rng, grid, n_active=25, cin=3, cap=64)
    w = jnp.asarray(rng.normal(size=(27, 3, 4)).astype(np.float32) * 0.1)
    for cap in (64, 8):  # ample + overflowing
        fast = S.sparse_conv(st, w, stride=2, padding=1, out_capacity=cap)
        monkeypatch.setattr(S, "_DENSE_LOOKUP_MAX_CELLS", 0)
        slow = S.sparse_conv(st, w, stride=2, padding=1, out_capacity=cap)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(fast.ids),
                                      np.asarray(slow.ids))
        np.testing.assert_allclose(np.asarray(fast.features),
                                   np.asarray(slow.features), atol=1e-4)


@pytest.mark.slow
def test_capacity_schedule_stress():
    """Capacity-schedule stress (VERDICT r2 weak #6) on a 1/16-area
    surrogate of the nuScenes product config (0.075 m voxels, stage-0 cap
    10k standing in for 160k):

    - realistic worst case (radially-concentrated surface cloud at max
      density): the NUSCENES_CAPACITY_SCHEDULE ratios must absorb every
      stage with ZERO drops downstream of the voxelizer;
    - adversarial i.i.d.-uniform cloud (active set EXPANDS ~3.2x through
      the first stride-2 conv — measured, benchmarks/capacity_stress.py):
      truncation must be graceful and exactly telemetered.
    """
    import importlib.util
    import pathlib

    import jax
    import jax.numpy as jnp

    from lvv_tpu.config import VQAConfig, load
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.models.voxelnext import NUSCENES_CAPACITY_SCHEDULE
    from lvv_tpu.ops import sparse as sp

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "capacity_stress", root / "benchmarks" / "capacity_stress.py")
    cs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cs)

    extent, cap0, n = 13.5, 10000, 18750
    full_cap0 = 160000
    sched = [max(int(c * cap0 / full_cap0), 64)
             for c in NUSCENES_CAPACITY_SCHEDULE]
    cfg = load(VQAConfig, str(root / "configs" / "voxelnext_nuscenes.json"),
               [f"voxelize.point_range=[-{extent},-{extent},-5.0,"
                f"{extent},{extent},3.0]",
                f"voxelize.max_voxels={cap0}", "voxelize.max_points=20000",
                "model.voxelnext.capacity_schedule="
                + str(sched).replace(" ", "")])
    det = build_detector("VoxelNeXt", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pr = cfg.voxelize.point_range
    params = det.init(jax.random.PRNGKey(0),
                      jnp.asarray(cs.uniform_cloud(rng, 1000, pr)),
                      jnp.int32(1000))

    def run(pts):
        sp.set_overflow_debug(True)
        sp.reset_overflow_log()
        try:
            out = det.apply(params, jnp.asarray(pts), jnp.int32(len(pts)))
            jax.block_until_ready(out["preds"])
        finally:
            sp.set_overflow_debug(False)
        return sp.overflow_log()

    # realistic worst case: zero drops everywhere downstream of voxelize
    log = run(cs.surface_cloud(rng, n, extent * 0.98))
    downstream = {k: v for k, v in log.items()
                  if not k.startswith("voxelize")}
    assert downstream, "overflow telemetry recorded nothing"
    bad = {k: v for k, v in downstream.items() if v["dropped"] > 0}
    assert not bad, f"schedule drops on the surface worst case: {bad}"

    # adversarial uniform: graceful, exactly-telemetered truncation
    log = run(cs.uniform_cloud(rng, n, pr))
    for k, v in log.items():
        assert v["dropped"] == max(v["demand"] - v["cap"], 0), (k, v)


@pytest.mark.fast
def test_plan_capacity_demand_exact():
    """Host planner replays the voxelizer + stride-2 chain EXACTLY: its
    per-stage demands equal the live sparse_conv active-site counts."""
    import numpy as np
    from lvv_tpu.ops.sparse import (SENTINEL, from_voxels,
                                    plan_capacity_demand,
                                    pick_capacity_bucket, sparse_conv)
    from lvv_tpu.ops.voxelize import VoxelGrid

    rng = np.random.default_rng(3)
    grid = VoxelGrid.create((-8, -8, -2, 8, 8, 2), (0.5, 0.5, 0.5))
    pts = np.stack([rng.uniform(-9, 9, 600), rng.uniform(-9, 9, 600),
                    rng.uniform(-3, 3, 600)], 1).astype(np.float32)
    n_vox, demands = plan_capacity_demand(pts, grid, n_stages=2)

    # live chain: voxel coords -> two stride-2 convs, count active sites
    nx, ny, nz = grid.grid_size
    xi = np.floor((pts[:, 0] + 8) / 0.5).astype(np.int64)
    yi = np.floor((pts[:, 1] + 8) / 0.5).astype(np.int64)
    zi = np.floor((pts[:, 2] + 2) / 0.5).astype(np.int64)
    ok = ((xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
          & (zi >= 0) & (zi < nz))
    lin = np.unique((zi[ok] * ny + yi[ok]) * nx + xi[ok])
    assert n_vox == lin.size
    cap = 4096
    coords = np.stack([lin // (nx * ny), (lin // nx) % ny, lin % nx], 1)
    coords = np.pad(coords, ((0, cap - len(coords)), (0, 0)),
                    constant_values=-1)
    st = from_voxels(jnp.asarray(coords, jnp.int32),
                     jnp.ones((cap, 4), jnp.float32), grid.grid_size)
    w = jnp.zeros((27, 4, 4), jnp.float32)
    for stage in range(2):
        st = sparse_conv(st, w, out_capacity=cap)
        live = int(np.sum(np.asarray(st.ids) != SENTINEL))
        assert demands[stage] == live, (stage, demands[stage], live)

    # bucket pick: smallest dominating schedule wins; overflow -> largest
    buckets = ((100, (50, 20)), (1000, (500, 200)), (10**6, (10**6, 10**6)))
    assert pick_capacity_bucket((80, (40, 10)), buckets) == 0
    assert pick_capacity_bucket((80, (60, 10)), buckets) == 1
    assert pick_capacity_bucket((10**7, (10**7, 1)), buckets) == 2
