"""BEVFusion assembly: neck math, depth projection, forward + grad
(reference detectors/bevfusion.py + img_neck/generalized_lss.py +
view_transforms/depth_lss.py wired per tools/cfgs/nuscenes_models/
bevfusion.yaml)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.bevfusion import (BEVFusionDetector, GeneralizedLSSFPN)
from lvv_tpu.models.depth_lss import project_points_to_depth
from lvv_tpu.models.registry import build_detector


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_generalized_lss_fpn_shapes():
    fpn = GeneralizedLSSFPN(out_channels=16)
    ins = [jnp.ones((2, 8, 16, 16)), jnp.ones((2, 12, 8, 8)),
           jnp.ones((2, 24, 4, 4))]
    params = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(params, ins)
    # reference semantics: N inputs -> N-1 outputs (levels 0..N-2), each
    # at the input level's resolution with out_channels channels
    assert len(outs) == 2
    assert outs[0].shape == (2, 16, 16, 16)
    assert outs[1].shape == (2, 16, 8, 8)


def test_project_points_to_depth():
    # one camera at the lidar origin looking down +z(cam) = +x(lidar)
    cam2lidar = np.eye(4, dtype=np.float32)
    # camera axes: x_cam=-y_lidar, y_cam=-z_lidar, z_cam=+x_lidar
    cam2lidar[:3, :3] = np.array([[0, 0, 1],
                                  [-1, 0, 0],
                                  [0, -1, 0]], np.float32)
    intr = np.array([[[10.0, 0, 8.0], [0, 10.0, 8.0], [0, 0, 1]]],
                    np.float32)
    pts = np.zeros((4, 4), np.float32)
    pts[0, :3] = [5.0, 0.0, 0.0]     # straight ahead, 5 m
    pts[1, :3] = [5.0, 0.0, 0.0]     # duplicate: min wins
    pts[2, :3] = [-5.0, 0.0, 0.0]    # behind the camera: dropped
    pts[3, :3] = [100.0, 100.0, 0.0]  # projects out of frame? (u=18) drop
    d = project_points_to_depth(jnp.asarray(pts), jnp.int32(4),
                                jnp.asarray(intr),
                                jnp.asarray(cam2lidar)[None], (16, 16))
    d = np.asarray(d)
    assert d.shape == (1, 1, 16, 16)
    # principal point pixel (8, 8) sees depth 5
    assert d[0, 0, 8, 8] == pytest.approx(5.0)
    assert (d > 0).sum() == 1


@pytest.fixture(scope="module")
def bevfusion_setup():
    cfg = tiny_config()
    assert "BEVFusion" in __import__(
        "lvv_tpu.models.registry", fromlist=["DETECTORS"]).DETECTORS
    det = BEVFusionDetector(
        det_cfg=cfg.model.voxelnext, vox_cfg=cfg.voxelize,
        image_hw=(32, 32), swin_embed=8, swin_depths=(1, 1, 1),
        swin_heads=(1, 2, 4), swin_window=4, out_indices=(1, 2),
        fpn_channels=8, cam_bev_channels=8, fuse_channels=8, num_queries=4)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (200, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 200)
    imgs = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    intr = np.tile(np.array([[20.0, 0, 16], [0, 20.0, 16], [0, 0, 1]],
                            np.float32), (2, 1, 1))
    c2l = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    c2l[:, :3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]],
                              np.float32)
    args = (jnp.asarray(pts), jnp.int32(200), jnp.asarray(imgs),
            jnp.asarray(intr), jnp.asarray(c2l))
    params = det.init(jax.random.PRNGKey(0), *args)
    return det, params, args


def test_bevfusion_forward(bevfusion_setup):
    det, params, args = bevfusion_setup
    out = det.apply(params, *args)
    assert out["cam_bev"].shape[1:] == out["lidar_bev"].shape[1:]
    assert np.isfinite(np.asarray(out["preds"]["cls"])).all()
    assert np.isfinite(np.asarray(out["cam_bev"])).all()
    dets = det.apply(params, *args, method=BEVFusionDetector.detect)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_bevfusion_grad_flows_to_both_branches(bevfusion_setup):
    det, params, args = bevfusion_setup

    def loss(p):
        out = det.apply(p, *args)
        return (jnp.sum(out["preds"]["cls"].astype(jnp.float32) ** 2)
                + jnp.sum(out["preds"]["box"].astype(jnp.float32) ** 2))

    g = jax.grad(lambda p: loss(p))(params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]

    def norm_of(substr):
        tot = 0.0
        for path, leaf in flat:
            if substr in jax.tree_util.keystr(path):
                tot += float(jnp.sum(jnp.abs(leaf)))
        return tot

    assert norm_of("image_backbone") > 0      # camera branch trains
    assert norm_of("backbone3d") > 0          # lidar branch trains
    assert norm_of("vtransform") > 0
    assert norm_of("neck") > 0
