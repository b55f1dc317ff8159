"""PV-RCNN++ family: proposal-centric sampling + VectorPool VSA
(reference detectors/pv_rcnn_plusplus.py + voxel_set_abstraction.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.pv_rcnn_pp import (PVRCNNPlusPlusDetector,
                                       proposal_centric_mask)
from lvv_tpu.models.registry import build_detector


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_proposal_centric_mask():
    pts = jnp.asarray([[0.0, 0.0, 0.0, 1.0],
                       [3.0, 0.0, 0.0, 1.0],
                       [50.0, 50.0, 0.0, 1.0]])
    valid = jnp.asarray([True, True, True])
    props = jnp.zeros((2, 7)).at[0].set(
        jnp.asarray([0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]))
    scores = jnp.asarray([0.9, 0.0])        # second proposal is padding
    m = np.asarray(proposal_centric_mask(pts, valid, props, scores))
    assert m.tolist() == [True, True, False]
    # dead proposals select nothing
    m2 = np.asarray(proposal_centric_mask(pts, valid, props,
                                          jnp.zeros(2)))
    assert not m2.any()


@pytest.fixture(scope="module")
def pp_setup():
    cfg = tiny_config()
    det = build_detector("PVRCNNPlusPlus", cfg.model.voxelnext,
                         cfg.voxelize)
    det = PVRCNNPlusPlusDetector(det_cfg=cfg.model.voxelnext,
                                 vox_cfg=cfg.voxelize, num_keypoints=64)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (256, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 256)
    args = (jnp.asarray(pts), jnp.int32(256))
    params = det.init(jax.random.PRNGKey(0), *args)
    return det, params, args


def test_pvrcnn_pp_forward_detect(pp_setup):
    det, params, args = pp_setup
    out = det.apply(params, *args)
    assert out["keypoints"].shape == (64, 3)
    assert np.isfinite(np.asarray(out["keypoint_features"])).all()
    dets = out["detections"]
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_pvrcnn_pp_grads(pp_setup):
    det, params, args = pp_setup

    def loss_fn(p):
        out = det.apply(p, *args)
        return jnp.sum(out["keypoint_features"].astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_flatten_with_path(g)[0]
    vsa_norm = sum(float(jnp.sum(jnp.abs(l))) for p, l in leaves
                   if "vsa" in jax.tree_util.keystr(p))
    assert vsa_norm > 0
