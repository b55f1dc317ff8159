"""PartA2 family: inverse sparse conv, UNet decoder, part targets,
full-assembly forward/detect/loss (reference PartA2_net.py + spconv_unet.py
+ point_intra_part_offset_head.py + partA2_head.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.part_a2 import (PartA2Detector, SparseUNet,
                                    part_targets, point_part_loss)
from lvv_tpu.models.registry import build_detector
from lvv_tpu.ops.sparse import (SENTINEL, from_voxels, inverse_conv,
                                sparse_conv, to_dense)


def test_inverse_conv_restores_active_set():
    """inverse_conv puts features back onto the pre-conv active set, and a
    one-hot kernel routes each coarse feature to exactly the fine sites
    that produced it in the forward conv."""
    rng = np.random.default_rng(0)
    coords = np.array([[0, 0, 0], [0, 0, 1], [0, 2, 2], [0, 3, 3],
                       [-1, -1, -1]], np.int32)
    feats = rng.normal(size=(5, 2)).astype(np.float32)
    feats[4] = 0
    st = from_voxels(jnp.asarray(coords), jnp.asarray(feats), (4, 4, 1))

    k = 27
    w_down = jnp.asarray(rng.normal(size=(k, 2, 3)), jnp.float32)
    down = sparse_conv(st, w_down, kernel=3, stride=2, padding=1,
                       out_capacity=5)

    # identity-ish inverse: only the center offset (index 13) carries
    w_inv = jnp.zeros((k, 3, 3)).at[13].set(jnp.eye(3))
    up = inverse_conv(down, st.ids, st.grid, w_inv, kernel=3, stride=2,
                      padding=1)
    assert up.grid == st.grid
    np.testing.assert_array_equal(np.asarray(up.ids), np.asarray(st.ids))
    # every fine site whose coord/2 (with pad algebra) hits an active
    # coarse site must carry that coarse feature; others zero. Site (0,0):
    # center-offset inverse => coarse site (0,0).
    dense_coarse = np.asarray(to_dense(down))        # [3, nz, ny, nx]
    dense_up = np.asarray(to_dense(up))
    np.testing.assert_allclose(dense_up[:, 0, 0, 0],
                               dense_coarse[:, 0, 0, 0], atol=1e-5)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_sparse_unet_decoder_resolution():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    coords = np.stack([np.zeros(64, np.int32),
                       rng.integers(0, 16, 64).astype(np.int32),
                       rng.integers(0, 16, 64).astype(np.int32)], axis=1)
    feats = rng.normal(size=(64, 4)).astype(np.float32)
    st = from_voxels(jnp.asarray(coords), jnp.asarray(feats), (16, 16, 1))
    unet = SparseUNet(channels=(8, 8, 16, 16), capacity=64)
    params = unet.init(jax.random.PRNGKey(0), st)
    out = unet.apply(params, st)
    # decoder output lives on the ENCODER's stride-1 active set
    np.testing.assert_array_equal(np.asarray(out["point_feats"].ids),
                                  np.asarray(st.ids))
    assert out["point_feats"].features.shape[1] == 8
    assert out["encoded"].grid == (2, 2, 1)
    assert np.isfinite(np.asarray(out["point_feats"].features)).all()


def test_part_targets_canonical_coords():
    centers = jnp.asarray([[0.0, 0.0, 0.0],    # box center -> (0.5,0.5,0.5)
                           [1.0, 0.0, 0.0],    # +x face -> u = 1.0
                           [9.0, 9.0, 9.0]])   # outside
    valid = jnp.array([True, True, True])
    gt = jnp.zeros((2, 9)).at[0, 3:6].set(jnp.asarray([2.0, 1.0, 1.0]))
    mask = jnp.array([True, False])
    labels = jnp.array([2, 0])
    t = part_targets(centers, valid, gt, labels, mask)
    assert t["seg"].tolist() == [3, 3, 0]
    np.testing.assert_allclose(np.asarray(t["part"][0]), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(t["part"][1]), [1.0, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(t["part"][2]), 0.0)
    # padded voxels are ignore
    t2 = part_targets(centers, jnp.array([True, True, False]), gt, labels,
                      mask)
    assert int(t2["seg"][2]) == -1


@pytest.fixture(scope="module")
def parta2_setup():
    cfg = tiny_config()
    det = build_detector("PartA2", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (256, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 256)
    args = (jnp.asarray(pts), jnp.int32(256))
    params = det.init(jax.random.PRNGKey(0), *args)
    return det, params, args


def test_parta2_forward_and_detect(parta2_setup):
    det, params, args = parta2_setup
    out = det.apply(params, *args)
    assert np.isfinite(np.asarray(out["point_preds"]["seg"])).all()
    assert out["point_preds"]["part"].shape[1] == 3
    dets = det.apply(params, *args, method=PartA2Detector.detect)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_parta2_loss_and_grad(parta2_setup):
    det, params, args = parta2_setup
    gt = jnp.zeros((4, 9)).at[0].set(
        jnp.asarray([1.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.3, 0, 0]))
    gl = jnp.zeros((4,), jnp.int32)
    gm = jnp.zeros((4,), bool).at[0].set(True)

    def loss_fn(p):
        out = det.apply(p, *args)
        loss, stats = det.loss(out, gt, gl, gm)
        return loss

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_flatten_with_path(g)[0]

    def norm_of(substr):
        return sum(float(jnp.sum(jnp.abs(leaf)))
                   for path, leaf in flat
                   if substr in jax.tree_util.keystr(path))

    assert norm_of("unet") > 0
    assert norm_of("point_head") > 0
    assert norm_of("head") > 0
