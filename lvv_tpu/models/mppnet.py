"""MPPNet — multi-frame proposal trajectory refinement (+E2E memory bank).

Re-design of the reference MPPNet (pcdet roi_heads/mppnet_head.py:1-992
and mppnet_memory_bank_e2e.py:1-580; "MPPNet: Multi-Frame Feature
Intertwining with Proxy Points"): first-stage proposals become
TRAJECTORIES — each box propagated backward through past frames with its
velocity — and per (proposal, frame) the points inside the trajectory box
are pooled, canonicalized in the box frame, stamped with a time
embedding, and intertwined through self-attention over all frames' tokens
before the confidence/refinement heads.

The E2E variant keeps a rolling memory bank of the last T-1 frames' point
clouds so online inference refines with history; on TPU the bank is an
explicit fixed-shape pytree threaded through the step function (shift
buffers, no host state).

Fixed shapes everywhere: T frames static, S sampled points per
(proposal, frame) via roipoint_pool3d's deterministic first-S rule, empty
boxes masked.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.schema import VoxelizeConfig, VoxelNeXtConfig
from ..ops.pool import roipoint_pool3d
from .layers import Dense, LayerNorm, MultiHeadAttention
from .roi_head import canonical_decode
from .voxelnext import Detections


def propagate_trajectories(boxes: jax.Array, num_frames: int,
                           dt: float = 0.1) -> jax.Array:
    """[R, 9] current boxes (vx, vy in cols 7:9) -> [T, R, 7] trajectory
    boxes, frame 0 = now, frame t = box shifted back t*dt by its velocity
    (reference generate_trajectory: backward velocity propagation)."""
    steps = jnp.arange(num_frames, dtype=jnp.float32) * dt
    xy = boxes[None, :, :2] - steps[:, None, None] * boxes[None, :, 7:9]
    rest = jnp.broadcast_to(boxes[None, :, 2:7],
                            (num_frames,) + boxes[:, 2:7].shape)
    return jnp.concatenate([xy, rest], axis=-1)      # [T, R, 7]


def canonicalize(points_xyz: jax.Array, box: jax.Array) -> jax.Array:
    """[S, 3] points into the box's canonical frame."""
    d = points_xyz - box[:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    return jnp.stack([d[..., 0] * c - d[..., 1] * s,
                      d[..., 0] * s + d[..., 1] * c,
                      d[..., 2]], axis=-1)


class MPPNetHead(nn.Module):
    """Trajectory point intertwining + refinement."""
    num_frames: int = 4
    samples: int = 32
    d_model: int = 64
    num_layers: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(self, frame_points: jax.Array, frame_counts: jax.Array,
                 trajectories: jax.Array) -> Dict[str, jax.Array]:
        """frame_points [T, P, >=3]; frame_counts [T]; trajectories
        [T, R, 7] -> {cls [R], reg [R, 7]}."""
        t_num, r_num = trajectories.shape[:2]
        tok_list, mask_list = [], []
        for t in range(t_num):
            valid = jnp.arange(frame_points.shape[1]) < frame_counts[t]
            pooled, empty = roipoint_pool3d(
                frame_points[t, :, :3],
                frame_points[t, :, 3:] if frame_points.shape[-1] > 3 else
                frame_points[t, :, :1] * 0.0,
                trajectories[t], self.samples, valid_points=valid)
            # pooled [R, S, 3+C]; canonicalize xyz per box
            xyz = jax.vmap(canonicalize)(pooled[..., :3], trajectories[t])
            extra = pooled[..., 3:]
            tok = jnp.concatenate([xyz, extra], axis=-1)
            tok = Dense(self.d_model, name=f"embed_{t}")(tok)
            # learned time embedding per frame (reference per-frame PE)
            te = self.param(f"time_embed_{t}", nn.initializers.normal(0.02),
                            (self.d_model,))
            tok = tok + te[None, None]
            tok_list.append(tok)
            mask_list.append(jnp.broadcast_to(~empty[:, None],
                                              tok.shape[:2]))
        tokens = jnp.concatenate(tok_list, axis=1)    # [R, T*S, D]
        mask = jnp.concatenate(mask_list, axis=1)     # [R, T*S]
        tokens = jnp.where(mask[..., None], tokens, 0.0)

        # intertwining: self-attention over all frames' proxy tokens
        for li in range(self.num_layers):
            y = LayerNorm(name=f"ln{li}")(tokens)
            a = MultiHeadAttention(self.num_heads,
                                   name=f"attn{li}")(y, y)
            tokens = tokens + jnp.where(mask[..., None], a, 0.0)
            y = LayerNorm(name=f"ln{li}b")(tokens)
            h = Dense(2 * self.d_model, name=f"fc{li}a")(y)
            tokens = tokens + Dense(self.d_model,
                                    name=f"fc{li}b")(nn.relu(h))

        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
        pooled = jnp.sum(jnp.where(mask[..., None], tokens, 0.0),
                         axis=1) / denom
        h = nn.relu(Dense(self.d_model, name="shared")(pooled))
        return {"cls": Dense(1, name="cls")(h)[:, 0],
                "reg": Dense(7, name="reg")(h)}


class MemoryBank(NamedTuple):
    """Rolling point-cloud history (reference memory bank, functional)."""
    points: jax.Array    # [T-1, P, F]
    counts: jax.Array    # [T-1]

    @classmethod
    def create(cls, num_frames: int, max_points: int, feat_dim: int = 4):
        return cls(points=jnp.zeros((num_frames - 1, max_points, feat_dim)),
                   counts=jnp.zeros((num_frames - 1,), jnp.int32))

    def push(self, points: jax.Array, count: jax.Array) -> "MemoryBank":
        return MemoryBank(
            points=jnp.concatenate([points[None], self.points[:-1]]),
            counts=jnp.concatenate([count[None], self.counts[:-1]]))


class MPPNetE2E(nn.Module):
    """Online refinement step: (bank, frame, proposals) -> (bank',
    refined detections). The bank is explicit state — jit the step and
    thread the pytree (reference MPPNetHeadE2E keeps it in the module)."""
    det_cfg: VoxelNeXtConfig
    num_frames: int = 4
    samples: int = 32

    @nn.compact
    def __call__(self, bank: MemoryBank, points: jax.Array,
                 num_points: jax.Array, proposals: Detections
                 ) -> Tuple[MemoryBank, Detections]:
        frame_points = jnp.concatenate([points[None], bank.points])
        frame_counts = jnp.concatenate([num_points[None], bank.counts])
        traj = propagate_trajectories(proposals.boxes, self.num_frames)
        preds = MPPNetHead(num_frames=self.num_frames, samples=self.samples,
                           name="head")(frame_points, frame_counts, traj)
        conf = jax.nn.sigmoid(preds["cls"].astype(jnp.float32))
        refined = canonical_decode(preds["reg"].astype(jnp.float32),
                                   proposals.boxes[:, :7])
        boxes9 = jnp.concatenate([refined, proposals.boxes[:, 7:9]], axis=1)
        out = Detections(boxes=boxes9, scores=conf * proposals.scores,
                         labels=proposals.labels, count=proposals.count)
        return bank.push(points, num_points), out


class MPPNetDetector(nn.Module):
    """Offline multi-frame refinement (reference detectors/mppnet.py):
    the dataset supplies a fixed T-frame stack of ego-aligned point clouds
    plus first-stage proposals (reference trains on pre-computed
    CenterPoint boxes loaded via ROI_BOXES_PATH); trajectories come from
    the proposals' velocities, and the head intertwines per-frame proxy
    tokens. Stateless — the E2E variant (MPPNetE2E) threads a memory bank
    instead."""
    det_cfg: VoxelNeXtConfig
    num_frames: int = 4
    samples: int = 32

    @nn.compact
    def __call__(self, frame_points: jax.Array, frame_counts: jax.Array,
                 proposals: Detections, return_preds: bool = False):
        """frame_points [T, P, F] (frame 0 = current); frame_counts [T].

        `return_preds=True` (training) additionally returns the raw head
        outputs and the propagated trajectory rois that mppnet_loss's
        per-frame proposal-target sampling consumes."""
        traj = propagate_trajectories(proposals.boxes, self.num_frames)
        preds = MPPNetHead(num_frames=self.num_frames, samples=self.samples,
                           name="head")(frame_points, frame_counts, traj)
        conf = jax.nn.sigmoid(preds["cls"].astype(jnp.float32))
        refined = canonical_decode(preds["reg"].astype(jnp.float32),
                                   proposals.boxes[:, :7])
        boxes9 = jnp.concatenate([refined, proposals.boxes[:, 7:9]], axis=1)
        dets = Detections(boxes=boxes9, scores=conf * proposals.scores,
                          labels=proposals.labels, count=proposals.count)
        if return_preds:
            return {"detections": dets, "preds": preds,
                    "trajectory_rois": traj,
                    "rois": proposals.boxes[:, :7]}
        return dets


def subsample_rois(key: jax.Array, max_overlaps: jax.Array,
                   roi_per_image: int = 96, fg_ratio: float = 0.5,
                   fg_thresh: float = 0.55, bg_thresh_lo: float = 0.1,
                   hard_bg_ratio: float = 0.8):
    """Fixed-shape fg/bg ROI subsampling (reference ProposalTargetLayer.
    subsample_rois:117-160: up to FG_RATIO*ROI_PER_IMAGE random foregrounds
    with iou >= REG_FG_THRESH; remaining slots filled with background,
    hard bg (iou >= CLS_BG_THRESH_LO) preferred HARD_BG_RATIO of the time).

    TPU-first: random subset selection via top-k over uniform priorities —
    no data-dependent shapes. Returns (sampled_idx [M], fg_mask [M])."""
    r = max_overlaps.shape[0]
    m = min(roi_per_image, r)
    n_fg_t = max(1, int(np.round(fg_ratio * m)))
    kf, kb = jax.random.split(key)
    fg = max_overlaps >= fg_thresh
    fg_pri = jnp.where(fg, jax.random.uniform(kf, (r,)), -jnp.inf)
    fg_val, fg_idx = jax.lax.top_k(fg_pri, n_fg_t)
    hard = (~fg) & (max_overlaps >= bg_thresh_lo)
    rb = jax.random.uniform(kb, (r,))
    bg_pri = jnp.where(~fg, rb + jnp.where(hard, hard_bg_ratio, 0.0),
                       -jnp.inf)
    bg_val, bg_idx = jax.lax.top_k(bg_pri, m)
    # valid fg first (pri 2), then bg in sampled order, never invalids
    cand_idx = jnp.concatenate([fg_idx, bg_idx])
    bg_order = 1.0 - jnp.arange(m, dtype=jnp.float32) / (m + 1)
    cand_pri = jnp.concatenate([
        jnp.where(jnp.isfinite(fg_val), 2.0, -2.0),
        jnp.where(jnp.isfinite(bg_val), bg_order, -1.0)])
    _, sel = jax.lax.top_k(cand_pri, m)
    sampled = cand_idx[sel]
    return sampled, fg[sampled]


def mppnet_proposal_targets(key: jax.Array, trajectory_rois: jax.Array,
                            roi_scores: jax.Array, roi_labels: jax.Array,
                            valid_length: jax.Array, gt_boxes: jax.Array,
                            gt_mask: jax.Array, roi_per_image: int = 96,
                            fg_thresh: float = 0.55,
                            cls_fg_thresh: float = 0.75,
                            cls_bg_thresh: float = 0.25) -> Dict:
    """Per-frame trajectory target sampling (reference
    ProposalTargetLayerMPPNet.sample_rois_for_mppnet: match CURRENT-frame
    trajectory rois to gts, fg/bg-subsample to ROI_PER_IMAGE, and carry the
    full sampled trajectories + per-frame valid_length through; cls labels
    are the reference's 'roi_iou' soft interpolation).

    trajectory_rois [T, R, 7]; roi_scores/labels [R]; valid_length [T, R];
    -> dict with sampled trajectories [T, M, 7], rois [M, 7] (frame 0),
    reg_tgt/cls_tgt/fg_mask/valid, sampled_idx."""
    from ..ops.boxes import iou_aabb_bev
    from .roi_head import canonical_encode
    rois0 = trajectory_rois[0]
    iou = iou_aabb_bev(rois0[:, :7], gt_boxes[:, :7])
    iou = jnp.where(gt_mask[None, :], iou, 0.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    sampled, fg_mask = subsample_rois(key, best_iou, roi_per_image,
                                      fg_thresh=fg_thresh)
    rois_s = rois0[sampled]
    gt_s = gt_boxes[best_gt[sampled]]
    iou_s = best_iou[sampled]
    soft = jnp.clip((iou_s - cls_bg_thresh) / (cls_fg_thresh - cls_bg_thresh),
                    0.0, 1.0)
    reg_tgt = canonical_encode(gt_s[:, :7], rois_s[:, :7])
    valid = jnp.any(gt_mask) & (jnp.sum(rois_s[:, 3:6], axis=1) > 0)
    return {
        "trajectory_rois": trajectory_rois[:, sampled],
        "valid_length": valid_length[:, sampled],
        "rois": rois_s,
        "roi_scores": roi_scores[sampled],
        "roi_labels": roi_labels[sampled],
        "gt_iou_of_rois": iou_s,
        "cls_tgt": soft,
        "reg_tgt": reg_tgt,
        "fg_mask": fg_mask & valid,
        "valid": valid,
        "sampled_idx": sampled,
    }


def mppnet_loss(preds: Dict, rois: jax.Array, gt_boxes, gt_mask,
                key: jax.Array | None = None,
                trajectory_rois: jax.Array | None = None,
                valid_length: jax.Array | None = None):
    """MPPNet training loss. With `key` + `trajectory_rois` it runs the
    reference's per-frame ProposalTargetLayerMPPNet sampling (above);
    otherwise it falls back to the plain proposal-target matcher on the
    current-frame rois."""
    from .roi_head import RoITargets, proposal_targets, roi_head_loss
    if key is not None and trajectory_rois is not None:
        r = trajectory_rois.shape[1]
        if valid_length is None:
            valid_length = jnp.ones(trajectory_rois.shape[:2], bool)
        t = mppnet_proposal_targets(
            key, trajectory_rois,
            roi_scores=jnp.zeros((r,)), roi_labels=jnp.zeros((r,), jnp.int32),
            valid_length=valid_length, gt_boxes=gt_boxes, gt_mask=gt_mask,
            roi_per_image=min(96, r))
        sel = t["sampled_idx"]
        preds = {"cls": preds["cls"][sel], "reg": preds["reg"][sel]}
        tgt = RoITargets(rois=t["rois"], cls_tgt=t["cls_tgt"],
                         reg_tgt=t["reg_tgt"], fg_mask=t["fg_mask"],
                         valid=t["valid"])
        return roi_head_loss(preds, tgt)
    tgt = proposal_targets(rois, gt_boxes, gt_mask)
    return roi_head_loss(preds, tgt)
