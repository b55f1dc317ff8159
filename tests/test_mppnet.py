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


@pytest.mark.fast  # smoke pick: subsystem coverage in the 5-min gate
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


def test_subsample_rois_caps_foreground():
    """Fixed-shape port of ProposalTargetLayer.subsample_rois: fg capped at
    FG_RATIO*M, bg fills the rest, hard bg preferred."""
    from lvv_tpu.models.mppnet import subsample_rois

    # 10 fg (iou .6), 20 hard bg (.3), 34 easy bg (.01)
    iou = jnp.concatenate([jnp.full((10,), 0.6), jnp.full((20,), 0.3),
                           jnp.full((34,), 0.01)])
    sampled, fg = subsample_rois(jax.random.PRNGKey(0), iou,
                                 roi_per_image=16, fg_ratio=0.5)
    s, f = np.asarray(sampled), np.asarray(fg)
    assert len(s) == 16 and len(set(s.tolist())) == 16  # distinct
    assert f.sum() == 8                                  # fg cap hit
    assert (s[f] < 10).all()
    # hard-bg preference: most bg picks from the hard pool
    bg_picks = s[~f]
    assert (bg_picks >= 10).all()
    assert ((bg_picks >= 10) & (bg_picks < 30)).sum() >= 5

    # no fg at all -> all slots bg
    sampled2, fg2 = subsample_rois(jax.random.PRNGKey(1),
                                   jnp.full((64,), 0.05), roi_per_image=16)
    assert np.asarray(fg2).sum() == 0
    assert len(set(np.asarray(sampled2).tolist())) == 16


def test_mppnet_proposal_targets_trajectories():
    """Per-frame sampling keeps whole trajectories + valid_length aligned
    (reference ProposalTargetLayerMPPNet.sample_rois_for_mppnet)."""
    from lvv_tpu.models.mppnet import mppnet_proposal_targets

    t_num, r_num = 3, 32
    rng = np.random.default_rng(0)
    traj = rng.uniform(-20, 20, (t_num, r_num, 7)).astype(np.float32)
    traj[..., 3:6] = rng.uniform(1, 3, (t_num, r_num, 3))
    # roi 0 sits exactly on the gt -> fg
    gt = np.asarray([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3, 0, 0]], np.float32)
    traj[0, 0, :7] = gt[0, :7]
    vl = np.ones((t_num, r_num), bool)
    out = mppnet_proposal_targets(
        jax.random.PRNGKey(0), jnp.asarray(traj),
        roi_scores=jnp.zeros((r_num,)),
        roi_labels=jnp.zeros((r_num,), jnp.int32),
        valid_length=jnp.asarray(vl), gt_boxes=jnp.asarray(gt),
        gt_mask=jnp.asarray([True]), roi_per_image=8)
    sel = np.asarray(out["sampled_idx"])
    assert out["trajectory_rois"].shape == (t_num, 8, 7)
    assert out["valid_length"].shape == (t_num, 8)
    # the perfect-overlap roi is sampled as fg with cls target 1
    assert 0 in sel.tolist()
    pos = sel.tolist().index(0)
    assert bool(out["fg_mask"][pos])
    assert float(out["cls_tgt"][pos]) == 1.0
    # trajectories gathered consistently with the sampled index
    np.testing.assert_allclose(np.asarray(out["trajectory_rois"][:, pos]),
                               traj[:, 0], rtol=1e-6)
    # reg target of a perfect match is (near) zero in the canonical frame
    assert np.abs(np.asarray(out["reg_tgt"][pos][:6])).max() < 1e-4


def test_mppnet_loss_with_trajectory_sampling():
    from lvv_tpu.models.mppnet import mppnet_loss

    r_num = 16
    rng = np.random.default_rng(2)
    traj = rng.uniform(-10, 10, (2, r_num, 7)).astype(np.float32)
    traj[..., 3:6] = 2.0
    preds = {"cls": jnp.asarray(rng.normal(size=r_num), jnp.float32),
             "reg": jnp.asarray(rng.normal(size=(r_num, 7)), jnp.float32)}
    gt = jnp.asarray([[0.0, 0, 0, 4, 2, 1.5, 0.0, 0, 0]], jnp.float32)
    loss, aux = mppnet_loss(preds, jnp.asarray(traj[0]), gt,
                            jnp.asarray([True]),
                            key=jax.random.PRNGKey(0),
                            trajectory_rois=jnp.asarray(traj))
    assert np.isfinite(float(loss))
    assert "roi_cls_loss" in aux
