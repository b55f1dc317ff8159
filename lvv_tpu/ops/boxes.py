"""Box geometry ops: rotated BEV / 3D IoU, corners, period limiting.

TPU-native replacement for the reference's `iou3d_nms_cuda` extension
(src/lidar-encoder/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu: rotated-box
overlap via exact polygon clipping; iou3d_cpu.cpp CPU mirror) and parts of
pcdet/utils/box_utils.py / common_utils.py:limit_period.

Everything is fixed-shape and vmap-vectorized: the intersection of two
rotated rectangles is computed by Sutherland-Hodgman clipping with a static
vertex capacity (4-gon clipped by 4 half-planes -> <= 8 vertices), instead of
the CUDA kernel's per-thread branchy geometry.

Box parametrization follows pcdet: [x, y, z, dx, dy, dz, heading], z is the
box *center*, heading in radians around +z (counter-clockwise).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAXV = 8  # max vertices of rect-rect intersection


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """reference common_utils.py limit_period."""
    return val - jnp.floor(val / period + offset) * period


def corners_bev(boxes: jax.Array) -> jax.Array:
    """[N, 7] -> [N, 4, 2] BEV corners (counter-clockwise)."""
    x, y = boxes[:, 0], boxes[:, 1]
    dx, dy, ang = boxes[:, 3], boxes[:, 4], boxes[:, 6]
    c, s = jnp.cos(ang), jnp.sin(ang)
    # local corners (+-dx/2, +-dy/2), CCW
    lx = jnp.stack([dx, -dx, -dx, dx], axis=1) * 0.5
    ly = jnp.stack([dy, dy, -dy, -dy], axis=1) * 0.5
    gx = lx * c[:, None] - ly * s[:, None] + x[:, None]
    gy = lx * s[:, None] + ly * c[:, None] + y[:, None]
    return jnp.stack([gx, gy], axis=-1)


def _compact(pts: jax.Array, mask: jax.Array):
    """Bring masked-valid rows of pts [K,2] to the front (stable)."""
    order = jnp.argsort(~mask, stable=True)
    return pts[order], mask[order], jnp.sum(mask.astype(jnp.int32))


def _clip_halfplane(poly: jax.Array, n: jax.Array, p0: jax.Array,
                    p1: jax.Array):
    """Clip polygon (poly [_MAXV,2], n valid) by half-plane left of p0->p1.

    Returns (poly' [_MAXV,2], n'). Fixed shapes; 2 candidate emissions per
    edge then stable compaction.
    """
    idx = jnp.arange(_MAXV)
    valid = idx < n
    cur = poly
    prv = poly[(idx - 1) % jnp.maximum(n, 1)]
    edge = p1 - p0

    def side(q):
        return edge[0] * (q[..., 1] - p0[1]) - edge[1] * (q[..., 0] - p0[0])

    s_cur, s_prv = side(cur), side(prv)
    inside_cur, inside_prv = s_cur >= 0, s_prv >= 0
    denom = s_prv - s_cur
    t = s_prv / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = prv + t[:, None] * (cur - prv)

    # per input edge: emit intersection if crossing, then cur if inside
    emit_inter = valid & (inside_cur != inside_prv)
    emit_cur = valid & inside_cur
    pts = jnp.concatenate([inter, cur], axis=0)           # [2*_MAXV, 2]
    mask = jnp.concatenate([emit_inter, emit_cur])
    # interleave so ordering is (inter_0, cur_0, inter_1, cur_1, ...)
    interleave = jnp.arange(2 * _MAXV).reshape(2, _MAXV).T.reshape(-1)
    pts, mask = pts[interleave], mask[interleave]
    pts, mask, n_new = _compact(pts, mask)
    return pts[:_MAXV], jnp.minimum(n_new, _MAXV)


def _poly_area(poly: jax.Array, n: jax.Array) -> jax.Array:
    """Shoelace area of the first n CCW vertices."""
    idx = jnp.arange(_MAXV)
    valid = idx < n
    nxt = poly[(idx + 1) % jnp.maximum(n, 1)]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _rect_intersection_area(ca: jax.Array, cb: jax.Array) -> jax.Array:
    """Intersection area of two CCW rectangles given as [4,2] corners."""
    poly = jnp.zeros((_MAXV, 2), ca.dtype).at[:4].set(ca)
    n = jnp.int32(4)
    for i in range(4):
        poly, n = _clip_halfplane(poly, n, cb[i], cb[(i + 1) % 4])
    return jnp.where(n >= 3, _poly_area(poly, n), 0.0)


def pairwise_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Exact rotated BEV overlap area, [N, M]
    (reference iou3d_nms_utils.boxes_overlap_bev)."""
    ca, cb = corners_bev(boxes_a), corners_bev(boxes_b)
    f = jax.vmap(lambda a: jax.vmap(lambda b: _rect_intersection_area(a, b))(cb))
    return f(ca)


def iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Rotated BEV IoU [N, M] (reference iou3d_nms_utils.boxes_iou_bev)."""
    inter = pairwise_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)


def iou_3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Rotated 3D IoU [N, M] (reference iou3d_nms_utils.boxes_iou3d_gpu:
    BEV polygon overlap x z-extent overlap / volume union)."""
    inter_bev = pairwise_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] * 0.5
    za2 = boxes_a[:, 2] + boxes_a[:, 5] * 0.5
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] * 0.5
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] * 0.5
    z_ov = jnp.clip(jnp.minimum(za2[:, None], zb2[None, :])
                    - jnp.maximum(za1[:, None], zb1[None, :]), 0.0)
    inter = inter_bev * z_ov
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6)


def iou_aabb_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Axis-aligned BEV IoU (ignores heading) — the cheap metric used by the
    VQA grounding evaluation (reference training/utils/metrics.py:49-126)."""
    ax1 = boxes_a[:, 0] - boxes_a[:, 3] * 0.5
    ax2 = boxes_a[:, 0] + boxes_a[:, 3] * 0.5
    ay1 = boxes_a[:, 1] - boxes_a[:, 4] * 0.5
    ay2 = boxes_a[:, 1] + boxes_a[:, 4] * 0.5
    bx1 = boxes_b[:, 0] - boxes_b[:, 3] * 0.5
    bx2 = boxes_b[:, 0] + boxes_b[:, 3] * 0.5
    by1 = boxes_b[:, 1] - boxes_b[:, 4] * 0.5
    by2 = boxes_b[:, 1] + boxes_b[:, 4] * 0.5
    ix = jnp.clip(jnp.minimum(ax2[:, None], bx2[None, :])
                  - jnp.maximum(ax1[:, None], bx1[None, :]), 0.0)
    iy = jnp.clip(jnp.minimum(ay2[:, None], by2[None, :])
                  - jnp.maximum(ay1[:, None], by1[None, :]), 0.0)
    inter = ix * iy
    area_a = ((ax2 - ax1) * (ay2 - ay1))[:, None]
    area_b = ((bx2 - bx1) * (by2 - by1))[None, :]
    return inter / jnp.clip(area_a + area_b - inter, 1e-6)
