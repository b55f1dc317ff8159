"""voxel_query / vector_pool ops (reference pointnet2_stack
voxel_query_gpu.cu + vector_pool_gpu.cu) and the VoxelRCNN family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.registry import build_detector
from lvv_tpu.ops.sparse import from_voxels
from lvv_tpu.ops.voxel_query import (gather_neighborhood,
                                     neighborhood_offsets, vector_pool,
                                     voxel_query)


@pytest.fixture
def small_sparse():
    coords = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 3, 3],
                       [-1, -1, -1]], np.int32)     # zyx
    feats = np.arange(10, dtype=np.float32).reshape(5, 2)
    feats[4] = 0
    return from_voxels(jnp.asarray(coords), jnp.asarray(feats), (4, 4, 1))


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_voxel_query_hits(small_sparse):
    st = small_sparse
    # query at (0,0,0): 3x3x3 neighborhood catches (0,0,0), (0,0,1), (0,1,0)
    q = jnp.asarray([[0, 0, 0], [0, 3, 3], [0, 2, 2]], jnp.int32)
    slots, hit = voxel_query(st, q, ranges=(1, 1, 1))
    assert slots.shape == (3, 27)
    assert int(hit[0].sum()) == 3
    # isolated voxel (3,3) only finds itself
    assert int(hit[1].sum()) == 1
    # (2,2) neighborhood includes (3,3) and (1,1)? (1,1) inactive ->
    # only (3,3)
    assert int(hit[2].sum()) == 1
    # gathered ids must match the queried neighbors
    got_ids = np.asarray(st.ids)[np.asarray(slots[0])][np.asarray(hit[0])]
    assert sorted(got_ids.tolist()) == [0, 1, 4]    # lin ids y*4+x


def test_gather_neighborhood_radius_cut(small_sparse):
    st = small_sparse
    q_xyz = jnp.asarray([[0.5, 0.5, 0.5]])          # center of voxel (0,0)
    q_coord = jnp.asarray([[0, 0, 0]], jnp.int32)
    rel, feats, mask = gather_neighborhood(
        st, q_xyz, q_coord, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
        ranges=(1, 1, 1), radius=1.05)
    # neighbors at distance 1.0 survive, the self voxel at 0 too
    assert int(mask.sum()) == 3
    rel2, feats2, mask2 = gather_neighborhood(
        st, q_xyz, q_coord, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0),
        ranges=(1, 1, 1), radius=0.5)
    assert int(mask2.sum()) == 1                    # only self


def test_vector_pool_bins():
    # 2 neighbors in opposite x bins, mean mode
    rel = jnp.asarray([[[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0],
                        [0.0, 0.0, 0.0]]])
    feats = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]])
    mask = jnp.asarray([[True, True, False]])
    out = vector_pool(rel, feats, mask, extent=(1.0, 1.0, 1.0),
                      divisions=(2, 1, 1))
    out = np.asarray(out.reshape(2, 2))             # [bins, C]
    np.testing.assert_allclose(out[0], [1.0, 2.0])  # x<0 bin
    np.testing.assert_allclose(out[1], [3.0, 4.0])  # x>=0 bin
    # max mode
    mask_all = jnp.asarray([[True, True, True]])
    outm = vector_pool(rel, feats, mask_all, extent=(1.0, 1.0, 1.0),
                       divisions=(2, 1, 1), mode="max")
    outm = np.asarray(outm.reshape(2, 2))
    np.testing.assert_allclose(outm[1], [5.0, 6.0])  # max of both in-bin


def test_neighborhood_offsets_count():
    assert neighborhood_offsets((1, 1, 1)).shape == (27, 3)
    assert neighborhood_offsets((0, 2, 2)).shape == (25, 3)


@pytest.fixture(scope="module")
def voxelrcnn_setup():
    cfg = tiny_config()
    det = build_detector("VoxelRCNN", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (256, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 256)
    args = (jnp.asarray(pts), jnp.int32(256))
    params = det.init(jax.random.PRNGKey(0), *args)
    return det, params, args


def test_voxelrcnn_forward_and_detect(voxelrcnn_setup):
    det, params, args = voxelrcnn_setup
    out = det.apply(params, *args)
    assert np.isfinite(np.asarray(out["roi_preds"]["cls"])).all()
    dets = out["detections"]
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_voxelrcnn_loss_grads(voxelrcnn_setup):
    det, params, args = voxelrcnn_setup
    gt = jnp.zeros((4, 9)).at[0].set(
        jnp.asarray([1.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.3, 0, 0]))
    gm = jnp.zeros((4,), bool).at[0].set(True)

    def loss_fn(p):
        out = det.apply(p, *args)
        loss, _ = det.loss(out, gt, jnp.zeros((4,), jnp.int32), gm)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    roi_norm = sum(float(jnp.sum(jnp.abs(l))) for p, l in leaves
                   if "roi_head" in jax.tree_util.keystr(p))
    assert roi_norm > 0
