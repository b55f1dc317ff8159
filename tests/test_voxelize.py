"""Voxelization vs a straightforward numpy oracle (replaces spconv
Point2VoxelCPU3d semantics, reference data_processor.py:133-150)."""
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.ops.voxelize import VoxelGrid, Voxels, mean_vfe, voxelize, \
    voxelize_mean

GRID = VoxelGrid.create((-4.0, -4.0, -1.0, 4.0, 4.0, 1.0), (1.0, 1.0, 0.5))


def _numpy_voxelize(points, grid):
    """Oracle: dict voxel_id -> list of point rows, insertion-ordered by
    sorted linear id (our deterministic policy)."""
    nx, ny, nz = grid.grid_size
    buckets = {}
    for p in points:
        xi = int(np.floor((p[0] - grid.point_range[0]) / grid.voxel_size[0]))
        yi = int(np.floor((p[1] - grid.point_range[1]) / grid.voxel_size[1]))
        zi = int(np.floor((p[2] - grid.point_range[2]) / grid.voxel_size[2]))
        if not (0 <= xi < nx and 0 <= yi < ny and 0 <= zi < nz):
            continue
        buckets.setdefault((zi * ny + yi) * nx + xi, []).append(p)
    return dict(sorted(buckets.items()))


def test_voxelize_matches_oracle(rng):
    pts = rng.uniform(-5, 5, size=(200, 4)).astype(np.float32)
    n_valid = 150
    out = jax.jit(lambda p: voxelize(p, jnp.int32(n_valid), GRID,
                                     max_voxels=128, max_points_per_voxel=8))(
        jnp.asarray(pts))
    oracle = _numpy_voxelize(pts[:n_valid], GRID)

    nv = int(out.num_voxels)
    assert nv == len(oracle)
    nx, ny, _ = GRID.grid_size
    for slot, (vid, bucket) in enumerate(oracle.items()):
        z, y, x = np.asarray(out.coords[slot])
        assert (z * ny + y) * nx + x == vid
        assert int(out.num_points[slot]) == min(len(bucket), 8)
        got = np.asarray(out.features[slot, :out.num_points[slot]])
        want = np.stack(bucket[:int(out.num_points[slot])])
        # order within a voxel follows input order (stable sort)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # slots beyond num_voxels are empty
    assert np.all(np.asarray(out.coords[nv:]) == -1)
    assert np.all(np.asarray(out.num_points[nv:]) == 0)


def test_voxelize_mean_matches_bucketed(rng):
    pts = rng.uniform(-4, 4, size=(300, 4)).astype(np.float32)
    dense = voxelize(jnp.asarray(pts), jnp.int32(300), GRID,
                     max_voxels=256, max_points_per_voxel=32)
    fused = voxelize_mean(jnp.asarray(pts), jnp.int32(300), GRID,
                          max_voxels=256)
    assert int(dense.num_voxels) == int(fused.num_voxels)
    nv = int(fused.num_voxels)
    np.testing.assert_array_equal(np.asarray(dense.coords[:nv]),
                                  np.asarray(fused.coords[:nv]))
    means = mean_vfe(dense)
    np.testing.assert_allclose(np.asarray(means[:nv]),
                               np.asarray(fused.features[:nv]), atol=1e-5)


def test_voxelize_overflow_capacity(rng):
    """More voxels than capacity: first max_voxels (by id order) kept."""
    pts = rng.uniform(-4, 4, size=(300, 4)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), jnp.int32(300), GRID,
                   max_voxels=10, max_points_per_voxel=4)
    assert int(out.num_voxels) == 10
    oracle = _numpy_voxelize(pts, GRID)
    ids = list(oracle.keys())[:10]
    nx, ny, _ = GRID.grid_size
    got_ids = [(int(z) * ny + int(y)) * nx + int(x)
               for z, y, x in np.asarray(out.coords)]
    assert got_ids == ids


def test_voxelize_all_out_of_range():
    pts = jnp.full((50, 4), 100.0)
    out = voxelize(pts, jnp.int32(50), GRID, max_voxels=8,
                   max_points_per_voxel=4)
    assert int(out.num_voxels) == 0
    assert np.all(np.asarray(out.point_voxel) == -1)


def test_point_voxel_backref(rng):
    pts = rng.uniform(-4, 4, size=(100, 4)).astype(np.float32)
    out = voxelize(jnp.asarray(pts), jnp.int32(100), GRID,
                   max_voxels=128, max_points_per_voxel=16)
    pv = np.asarray(out.point_voxel)
    coords = np.asarray(out.coords)
    for i, p in enumerate(pts):
        if pv[i] < 0:
            continue
        z, y, x = coords[pv[i]]
        assert int(np.floor((p[0] + 4.0) / 1.0)) == x
        assert int(np.floor((p[1] + 4.0) / 1.0)) == y
        assert int(np.floor((p[2] + 1.0) / 0.5)) == z
