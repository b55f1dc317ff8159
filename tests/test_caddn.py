"""CaDDN family: LID binning, frustum sampling, monocular assembly
(reference detectors/caddn.py + image_vfe modules)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.caddn import (CaDDNDetector, bin_centers, bin_depths,
                                  conv2d_collapse, frustum_features,
                                  sample_frustum)
from lvv_tpu.models.registry import build_detector


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_bin_depths_lid_roundtrip():
    centers = bin_centers(num_bins=10, depth_min=2.0, depth_max=20.0)
    idx = bin_depths(jnp.asarray(centers), num_bins=10, depth_min=2.0,
                     depth_max=20.0)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
    # out of range -> background bin
    assert int(bin_depths(jnp.asarray([0.5]), num_bins=10, depth_min=2.0,
                          depth_max=20.0)[0]) == 10
    assert int(bin_depths(jnp.asarray([25.0]), num_bins=10, depth_min=2.0,
                          depth_max=20.0)[0]) == 10
    # LID bins grow with depth
    widths = np.diff(centers)
    assert (np.diff(widths) > 0).all()


def test_frustum_features_prob_weighted():
    logits = jnp.zeros((3, 2, 2)).at[0, 0, 0].set(100.0)  # bin0 certain
    feats = jnp.ones((4, 2, 2))
    vol = frustum_features(logits, feats)                  # [2, 2, 2, 4]
    assert vol.shape == (2, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(vol[0, 0, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vol[1, 0, 0]), 0.0, atol=1e-5)


def test_sample_frustum_trilinear():
    vol = jnp.zeros((2, 2, 2, 1)).at[0, 0, 0, 0].set(8.0)
    # exactly at the (0,0,0) corner
    out = sample_frustum(vol, jnp.asarray([0.0]), jnp.asarray([0.0]),
                         jnp.asarray([0.0]))
    assert float(out[0, 0]) == pytest.approx(8.0)
    # halfway to the next u: weight 0.5
    out2 = sample_frustum(vol, jnp.asarray([0.5]), jnp.asarray([0.0]),
                          jnp.asarray([0.0]))
    assert float(out2[0, 0]) == pytest.approx(4.0)
    # far out of range: zero
    out3 = sample_frustum(vol, jnp.asarray([99.0]), jnp.asarray([0.0]),
                          jnp.asarray([-10.0]))
    assert float(out3[0, 0]) == 0.0


def test_conv2d_collapse():
    v = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    out = conv2d_collapse(v)
    assert out.shape == (6, 4, 5)


@pytest.fixture(scope="module")
def caddn_setup():
    cfg = tiny_config()
    det = build_detector("CaDDN", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(-1, 1, (3, 32, 32)), jnp.float32)
    intr = jnp.asarray([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]])
    l2c = jnp.asarray(np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                                [1, 0, 0, 0], [0, 0, 0, 1]], np.float32))
    args = (img, intr, l2c)
    params = det.init(jax.random.PRNGKey(0), *args)
    return det, params, args


def test_caddn_forward_detect_loss(caddn_setup):
    det, params, args = caddn_setup
    out = det.apply(params, *args)
    assert np.isfinite(np.asarray(out["preds"]["cls"])).all()
    dets = det.apply(params, *args, method=CaDDNDetector.detect)
    assert np.isfinite(np.asarray(dets.boxes)).all()

    gt = jnp.zeros((4, 9)).at[0].set(
        jnp.asarray([5.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0, 0, 0]))
    gm = jnp.zeros((4,), bool).at[0].set(True)
    dm = jnp.zeros((8, 8)).at[4, 4].set(10.0)   # one lidar return

    def loss_fn(p):
        o = det.apply(p, *args)
        l, _ = det.loss(o, gt, jnp.zeros((4,), jnp.int32), gm,
                        lidar_depth_map=dm)
        return l

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    ffn_norm = sum(float(jnp.sum(jnp.abs(l))) for p, l in leaves
                   if "ffn" in jax.tree_util.keystr(p))
    assert ffn_norm > 0
