"""PointPillars family + registry tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.pointpillars import PointPillarsDetector, pillar_scatter
from lvv_tpu.models.registry import DETECTORS, build_detector


def test_registry():
    assert "VoxelNeXt" in DETECTORS and "PointPillars" in DETECTORS
    with pytest.raises(KeyError):
        build_detector("NoSuch", None, None)


def test_pillar_scatter_places_features():
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    coords = jnp.asarray([[0, 1, 2], [0, 3, 0]])  # (z, y, x)
    canvas = pillar_scatter(feats, coords, (4, 4))
    assert canvas.shape == (2, 4, 4)
    assert canvas[0, 1, 2] == 1.0 and canvas[1, 3, 0] == 4.0
    assert float(jnp.abs(canvas).sum()) == 10.0


def test_pointpillars_forward_and_detect():
    cfg = tiny_config()
    det = build_detector("PointPillars", cfg.model.voxelnext, cfg.voxelize)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-7.5, 7.5, (400, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 400)
    points, n = jnp.asarray(pts), jnp.int32(400)
    params = det.init(jax.random.PRNGKey(0), points, n)
    out = det.apply(params, points, n)
    grid = det.voxel_grid().grid_size
    assert out["preds"]["hm"].shape[0] == cfg.model.voxelnext.num_classes
    assert out["preds"]["hm"].shape[1:] == (grid[1], grid[0])
    dets = det.apply(params, points, n,
                     method=PointPillarsDetector.detect)
    assert dets.boxes.shape == (cfg.model.voxelnext.nms_post_max, 9)
    assert np.isfinite(np.asarray(dets.boxes)).all()


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_bev_res_backbone_shapes(rng):
    from lvv_tpu.models.pointpillars import BaseBEVResBackbone
    x = jnp.asarray(rng.normal(size=(32, 40, 40)), jnp.float32)
    m = BaseBEVResBackbone(layer_channels=(32, 64), layer_strides=(1, 2),
                           layer_nums=(1, 1), upsample_channels=(32, 32))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    # stride-1 first level keeps resolution; channels = sum(upsample)
    assert out.shape == (64, 40, 40)
    assert np.isfinite(np.asarray(out)).all()


def test_bev_backbone_v1_shapes(rng):
    from lvv_tpu.models.pointpillars import BaseBEVBackboneV1
    x4 = jnp.asarray(rng.normal(size=(64, 40, 40)), jnp.float32)
    x5 = jnp.asarray(rng.normal(size=(128, 20, 20)), jnp.float32)
    m = BaseBEVBackboneV1(num_filters=(64, 128), layer_nums=(2, 2),
                          upsample_channels=(64, 64),
                          upsample_strides=(1, 2))
    p = m.init(jax.random.PRNGKey(0), x4, x5)
    out = m.apply(p, x4, x5)
    assert out.shape == (128, 40, 40)
    assert np.isfinite(np.asarray(out)).all()
