"""MPPNet family: trajectory propagation, point intertwining head,
E2E memory bank (reference roi_heads/mppnet_head.py +
mppnet_memory_bank_e2e.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lvv_tpu.config import tiny_config
from lvv_tpu.models.mppnet import (MemoryBank, MPPNetE2E, MPPNetHead,
                                   canonicalize, mppnet_loss,
                                   propagate_trajectories)
from lvv_tpu.models.voxelnext import Detections


def test_propagate_trajectories_velocity():
    boxes = jnp.zeros((2, 9)).at[0].set(
        jnp.asarray([10.0, 0.0, 0.0, 4, 2, 1.5, 0.3, 2.0, -1.0]))
    traj = propagate_trajectories(boxes, num_frames=3, dt=0.5)
    assert traj.shape == (3, 2, 7)
    np.testing.assert_allclose(np.asarray(traj[0, 0, :2]), [10, 0])
    # one frame back: -v * dt
    np.testing.assert_allclose(np.asarray(traj[1, 0, :2]), [9.0, 0.5])
    np.testing.assert_allclose(np.asarray(traj[2, 0, :2]), [8.0, 1.0])
    # dims/yaw constant along the trajectory
    np.testing.assert_allclose(np.asarray(traj[:, 0, 6]), 0.3)


def test_canonicalize():
    box = jnp.asarray([1.0, 2.0, 0.0, 4, 2, 1.5, np.pi / 2])
    pts = jnp.asarray([[1.0, 3.0, 0.5]])     # 1m "ahead" along +y = box +x
    local = canonicalize(pts, box)
    np.testing.assert_allclose(np.asarray(local[0]), [1.0, 0.0, 0.5],
                               atol=1e-6)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    t, p = 3, 128
    pts = rng.uniform(-10, 10, (t, p, 4)).astype(np.float32)
    # a stable cluster near (5, 0) in every frame
    pts[:, :20, 0] = rng.normal(5.0, 0.3, (t, 20))
    pts[:, :20, 1] = rng.normal(0.0, 0.3, (t, 20))
    pts[:, :20, 2] = 0.0
    counts = jnp.asarray([p, p, p], jnp.int32)
    return jnp.asarray(pts), counts


def test_mppnet_head_forward(frames):
    pts, counts = frames
    boxes = jnp.zeros((4, 9)).at[0].set(
        jnp.asarray([5.0, 0.0, 0.0, 3, 3, 3, 0.0, 0, 0]))
    traj = propagate_trajectories(boxes, num_frames=3)
    head = MPPNetHead(num_frames=3, samples=16, d_model=32, num_layers=1)
    params = head.init(jax.random.PRNGKey(0), pts, counts, traj)
    preds = head.apply(params, pts, counts, traj)
    assert preds["cls"].shape == (4,)
    assert preds["reg"].shape == (4, 7)
    assert np.isfinite(np.asarray(preds["reg"])).all()

    # loss path
    gt = jnp.zeros((2, 9)).at[0].set(
        jnp.asarray([5.1, 0.0, 0.0, 3, 3, 3, 0.05, 0, 0]))
    loss, stats = mppnet_loss(preds, traj[0], gt,
                              jnp.asarray([True, False]))
    assert np.isfinite(float(loss))


def test_memory_bank_rolls(frames):
    pts, counts = frames
    bank = MemoryBank.create(num_frames=3, max_points=128, feat_dim=4)
    assert bank.points.shape == (2, 128, 4)
    b1 = bank.push(pts[0], counts[0])
    b2 = b1.push(pts[1], counts[1])
    np.testing.assert_allclose(np.asarray(b2.points[0]), np.asarray(pts[1]))
    np.testing.assert_allclose(np.asarray(b2.points[1]), np.asarray(pts[0]))
    b3 = b2.push(pts[2], counts[2])
    # the oldest frame fell off
    np.testing.assert_allclose(np.asarray(b3.points[1]), np.asarray(pts[1]))


def test_mppnet_e2e_step(frames):
    pts, counts = frames
    cfg = tiny_config()
    props = Detections(
        boxes=jnp.zeros((4, 9)).at[0].set(
            jnp.asarray([5.0, 0.0, 0.0, 3, 3, 3, 0.0, 0, 0])),
        scores=jnp.asarray([0.9, 0, 0, 0]),
        labels=jnp.asarray([0, -1, -1, -1]),
        count=jnp.int32(1))
    m = MPPNetE2E(det_cfg=cfg.model.voxelnext, num_frames=3, samples=16)
    bank = MemoryBank.create(num_frames=3, max_points=128, feat_dim=4)
    params = m.init(jax.random.PRNGKey(0), bank, pts[0], counts[0], props)
    step = jax.jit(lambda p, b, x, n, pr: m.apply(p, b, x, n, pr))
    for t in range(3):
        bank, dets = step(params, bank, pts[t], counts[t], props)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    assert dets.boxes.shape == (4, 9)
    # bank now holds frames 2 and 1
    np.testing.assert_allclose(np.asarray(bank.points[0]),
                               np.asarray(pts[2]))


def test_mppnet_offline_detector(frames):
    """Registered offline T-frame variant (reference detectors/mppnet.py)."""
    from lvv_tpu.models.mppnet import MPPNetDetector
    from lvv_tpu.models.registry import build_detector

    pts, counts = frames
    cfg = tiny_config()
    det = build_detector("MPPNet", cfg.model.voxelnext, cfg.voxelize)
    assert isinstance(det, MPPNetDetector)
    props = Detections(
        boxes=jnp.zeros((4, 9)).at[0].set(
            jnp.asarray([5.0, 0.0, 0.0, 3, 3, 3, 0.0, 0, 0])),
        scores=jnp.asarray([0.9, 0, 0, 0]),
        labels=jnp.asarray([0, -1, -1, -1]),
        count=jnp.int32(1))
    m = MPPNetDetector(det_cfg=cfg.model.voxelnext, num_frames=3, samples=16)
    params = m.init(jax.random.PRNGKey(0), pts, counts, props)
    dets = m.apply(params, pts, counts, props)
    assert dets.boxes.shape == (4, 9)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    # e2e is registered separately
    from lvv_tpu.models.mppnet import MPPNetE2E as _E2E
    assert isinstance(
        build_detector("MPPNetE2E", cfg.model.voxelnext, cfg.voxelize), _E2E)
