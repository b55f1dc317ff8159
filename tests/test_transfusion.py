"""TransFusion query head: forward, matcher, decode, loss."""
import pytest  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from lvv_tpu.config import tiny_config
from lvv_tpu.models.transfusion import (TransFusionHead, decode_queries,
                                        greedy_one_to_one, transfusion_loss)


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
def test_greedy_matcher_one_to_one():
    cost = jnp.asarray([[0.1, 5.0], [0.2, 0.05], [9.0, 9.0]])
    gt_of_q, matched = greedy_one_to_one(cost, jnp.asarray([True, True]))
    g = np.asarray(gt_of_q)
    # global min is (1,1)=0.05 -> q1:g1; next min for g0 is q0
    assert g[1] == 1 and g[0] == 0 and g[2] == -1
    # each gt used once
    used = g[g >= 0]
    assert len(set(used.tolist())) == len(used)


def test_transfusion_forward_decode_loss():
    cfg = tiny_config()
    det_cfg = cfg.model.voxelnext
    head = TransFusionHead(num_classes=det_cfg.num_classes, num_queries=16,
                           d_model=32, num_layers=1, num_heads=2)
    rng = np.random.default_rng(0)
    bev = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), bev)
    preds = head.apply(params, bev)
    assert preds["cls"].shape == (16, det_cfg.num_classes)
    assert preds["box"].shape == (16, 8)

    dets = decode_queries(preds, det_cfg, cfg.voxelize, stride=2)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()

    gt = jnp.asarray([[0, 0, -1, 4, 2, 1.5, 0.1, 0, 0]], jnp.float32)
    loss, aux = transfusion_loss(preds, gt, jnp.asarray([0], jnp.int32),
                                 jnp.asarray([True]), det_cfg, cfg.voxelize,
                                 stride=2)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_transfusion_trains():
    import optax
    cfg = tiny_config()
    det_cfg = cfg.model.voxelnext
    head = TransFusionHead(num_classes=det_cfg.num_classes, num_queries=8,
                           d_model=32, num_layers=1, num_heads=2)
    rng = np.random.default_rng(0)
    bev = jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32))
    params = head.init(jax.random.PRNGKey(0), bev)
    gt = jnp.asarray([[0, 0, -1, 4, 2, 1.5, 0.1, 0, 0]], jnp.float32)

    def loss_fn(p):
        preds = head.apply(p, bev)
        return transfusion_loss(preds, gt, jnp.asarray([0], jnp.int32),
                                jnp.asarray([True]), det_cfg, cfg.voxelize,
                                stride=2)[0]

    tx = optax.adam(1e-3)
    opt = tx.init(params)
    l0 = float(loss_fn(params))
    for _ in range(8):
        g = jax.grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        params = optax.apply_updates(params, up)
    assert float(loss_fn(params)) < l0

def test_transfusion_standalone_detector():
    """Registered lidar-only assembly (reference detectors/transfusion.py)."""
    from lvv_tpu.models.registry import build_detector
    from lvv_tpu.models.transfusion import TransFusionDetector

    cfg = tiny_config()
    det = build_detector("TransFusion", cfg.model.voxelnext, cfg.voxelize)
    assert isinstance(det, TransFusionDetector)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-7.5, 7.5, (300, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.5, 0.5, 300)
    points, n = jnp.asarray(pts), jnp.int32(300)
    det = TransFusionDetector(det_cfg=cfg.model.voxelnext,
                              vox_cfg=cfg.voxelize, num_queries=4)
    params = det.init(jax.random.PRNGKey(0), points, n)
    out = det.apply(params, points, n)
    assert out["preds"]["cls"].shape[1] == cfg.model.voxelnext.num_classes
    dets = det.apply(params, points, n, method=TransFusionDetector.detect)
    assert dets.boxes.shape[1] == 9
    assert np.isfinite(np.asarray(dets.boxes)).all()
