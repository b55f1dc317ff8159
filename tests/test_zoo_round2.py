"""Round-2 zoo tier: dynamic VFEs, AnchorHeadMulti, VoxelNeXt2D backbone,
focal sparse conv (reference vfe/dynamic_*.py, dense_heads/
anchor_head_multi.py, spconv_backbone_voxelnext2d.py,
focal_sparse_conv/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.models.anchor_head import (AnchorHeadMulti,
                                        multi_anchor_table)
from lvv_tpu.models.focal_conv import (FocalSparseConv,
                                       focal_importance_loss)
from lvv_tpu.models.vfe import (DynamicPillarVFE, DynamicPillarVFESimple2D,
                                point_pillar_slots)
from lvv_tpu.models.voxelnext2d import VoxelNeXt2DBackbone
from lvv_tpu.ops.sparse import from_voxels
from lvv_tpu.ops.voxelize import VoxelGrid


@pytest.fixture
def grid():
    return VoxelGrid.create((-8, -8, -3, 8, 8, 1), (1.0, 1.0, 4.0))


def test_point_pillar_slots(grid):
    pts = jnp.asarray([[0.5, 0.5, 0.0, 1.0],    # pillar A
                       [0.7, 0.3, 0.0, 2.0],    # pillar A again
                       [3.5, 0.5, 0.0, 3.0],    # pillar B
                       [99.0, 0.0, 0.0, 4.0],   # out of range
                       [0.0, 0.0, 0.0, 5.0]])   # beyond num_points
    slot, valid, coords, counts = point_pillar_slots(
        pts, jnp.int32(4), grid, max_pillars=8)
    valid = np.asarray(valid)
    assert valid.tolist() == [True, True, True, False, False]
    slot = np.asarray(slot)
    assert slot[0] == slot[1] and slot[0] != slot[2]
    assert int(np.asarray(counts)[slot[0]]) == 2
    # coords are (0, y, x) on the pillar grid
    c = np.asarray(coords)[slot[0]]
    assert c[0] == 0 and c[1] == 8 and c[2] == 8


def test_dynamic_pillar_vfe_uncapped_mean(grid):
    """Every point contributes (no per-pillar cap), max-pooled features."""
    rng = np.random.default_rng(0)
    pts = np.zeros((64, 4), np.float32)
    pts[:60, 0] = 0.5          # 60 points in ONE pillar
    pts[:60, 1] = 0.5
    pts[:60, 3] = rng.normal(size=60)
    vfe = DynamicPillarVFE(out_ch=8)
    out, params = None, None
    params = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                      jnp.int32(60), grid, 16)
    out = vfe.apply(params, jnp.asarray(pts), jnp.int32(60), grid, 16)
    n_valid = int(np.asarray(out.num_voxels))
    assert n_valid == 1
    idx = int(np.argmax(np.asarray(out.coords)[:, 1] >= 0))
    assert int(np.asarray(out.num_points)[idx]) == 60   # uncapped
    assert np.isfinite(np.asarray(out.features)).all()
    # Simple2D variant drops the cluster branch -> fewer params in fc
    s2d = DynamicPillarVFESimple2D(out_ch=8)
    p2 = s2d.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.int32(60),
                  grid, 16)
    w_full = params["params"]["fc"]["kernel"].shape[0]
    w_s2d = p2["params"]["fc"]["kernel"].shape[0]
    assert w_s2d == w_full - 3


def test_anchor_head_multi_groups():
    groups = ((0, 1), (2,))
    head = AnchorHeadMulti(num_classes=3, class_groups=groups)
    bev = jnp.ones((8, 4, 4))
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    # anchors: group0 has 2 classes x 2 rot, group1 1 x 2 per cell
    assert preds["cls"].shape == (4 * 4 * (4 + 2), 3)
    assert preds["box"].shape[0] == preds["cls"].shape[0]
    # group-local logits lift into global class space: group0 rows can
    # never predict class 2
    cls = np.asarray(preds["cls"])
    g0_rows = 4 * 4 * 4
    assert (cls[:g0_rows, 2] < -1e8).all()
    assert (cls[g0_rows:, :2] < -1e8).all()

    sizes = [(4, 2, 1.5), (6, 2.5, 2.0), (0.8, 0.8, 1.7)]
    anchors, acls = multi_anchor_table(
        (4, 4), groups, sizes, (-8, -8, -3, 8, 8, 1), (4.0, 4.0))
    assert anchors.shape == (preds["cls"].shape[0], 7)
    # class ids follow the group layout
    assert set(acls[:g0_rows]) == {0, 1}
    assert set(acls[g0_rows:]) == {2}


def _pillar_sparse(rng, cap=64, n=40, c=8, grid2d=(32, 32, 1)):
    nx, ny, _ = grid2d
    lin = rng.choice(nx * ny, size=n, replace=False)
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n] = np.stack([np.zeros(n, np.int64), lin // nx, lin % nx], 1)
    feats = np.zeros((cap, c), np.float32)
    feats[:n] = rng.normal(size=(n, c))
    return from_voxels(jnp.asarray(coords), jnp.asarray(feats), grid2d)


def test_voxelnext2d_backbone(rng):
    st = _pillar_sparse(rng)
    bb = VoxelNeXt2DBackbone(channels=(8, 8, 16, 16, 16), capacity=64)
    params = bb.init(jax.random.PRNGKey(0), st)
    out = bb.apply(params, st)
    assert out.grid == (4, 4, 1)          # stride 8 over 32x32
    assert np.isfinite(np.asarray(out.features)).all()
    assert int(np.asarray(out.num_active())) > 0


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_focal_sparse_conv_grows_active_set(rng):
    coords = np.full((32, 3), -1, np.int32)
    coords[:4] = [[0, 4, 4], [0, 4, 5], [0, 10, 10], [0, 2, 9]]
    feats = np.zeros((32, 6), np.float32)
    feats[:4] = rng.normal(size=(4, 6))
    st = from_voxels(jnp.asarray(coords), jnp.asarray(feats), (16, 16, 2))
    conv = FocalSparseConv(out_ch=6, spawn=8)
    params = conv.init(jax.random.PRNGKey(0), st)
    out, imp = conv.apply(params, st)
    assert imp.shape == (32,)
    assert np.isfinite(np.asarray(out.features)).all()
    # active set can only grow (spawned sites join the 4 originals)
    assert int(np.asarray(out.num_active())) >= 4

    # importance supervision: voxel centers inside a gt box get label 1
    centers = jnp.asarray([[4.5, 4.5, 0.0], [10.0, 10.0, 0.0]])
    valid = jnp.asarray([True, True])
    gt = jnp.zeros((1, 9)).at[0].set(
        jnp.asarray([4.5, 4.5, 0.0, 2.0, 2.0, 4.0, 0.0, 0, 0]))
    loss = focal_importance_loss(imp[:2], centers, valid, gt,
                                 jnp.asarray([True]))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_dynamic_voxel_vfe(grid):
    """3D dynamic voxel encoder: z participates in the grid (two points at
    the same xy but different z land in DIFFERENT voxels, unlike the
    pillar variant)."""
    from lvv_tpu.models.vfe import DynamicVoxelVFE
    from lvv_tpu.ops.voxelize import VoxelGrid
    g3 = VoxelGrid.create((-8, -8, -4, 8, 8, 4), (1.0, 1.0, 1.0))
    pts = np.zeros((8, 4), np.float32)
    pts[0] = [0.5, 0.5, 0.5, 1.0]
    pts[1] = [0.5, 0.5, 2.5, 2.0]     # same xy, different z
    vfe = DynamicVoxelVFE(out_ch=8)
    params = vfe.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                      jnp.int32(2), g3, 16)
    out = vfe.apply(params, jnp.asarray(pts), jnp.int32(2), g3, 16)
    assert int(np.asarray(out.num_voxels)) == 2
    pv = np.asarray(out.point_voxel)
    assert pv[0] != pv[1] and pv[0] >= 0 and pv[1] >= 0
    assert np.isfinite(np.asarray(out.features)).all()
