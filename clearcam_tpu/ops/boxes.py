"""Box geometry ops (static-shape, jit-safe)."""
from __future__ import annotations

import jax.numpy as jnp


def xywh_to_xyxy(b):
    xc, yc, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], axis=-1)


def xyxy_to_xywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def iou_matrix(boxes):
    """Pairwise IoU of [..., N, 4] xyxy boxes -> [..., N, N].

    Same math as the reference's compute_iou_matrix (yolov9.py:423-437) which
    feeds the on-device NMS mask.
    """
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    areas = (x2 - x1) * (y2 - y1)
    ix1 = jnp.maximum(x1[..., :, None], x1[..., None, :])
    iy1 = jnp.maximum(y1[..., :, None], y1[..., None, :])
    ix2 = jnp.minimum(x2[..., :, None], x2[..., None, :])
    iy2 = jnp.minimum(y2[..., :, None], y2[..., None, :])
    iw = jnp.maximum(0.0, ix2 - ix1)
    ih = jnp.maximum(0.0, iy2 - iy1)
    inter = iw * ih
    union = areas[..., :, None] + areas[..., None, :] - inter
    return inter / union


def iou_pairwise(a, b):
    """[N,4] x [M,4] xyxy -> [N,M] IoU (reference ocsort association.py:3-19)."""
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    ix1 = jnp.maximum(ax1, bx1)
    iy1 = jnp.maximum(ay1, by1)
    ix2 = jnp.minimum(ax2, bx2)
    iy2 = jnp.minimum(ay2, by2)
    inter = jnp.maximum(0.0, ix2 - ix1) * jnp.maximum(0.0, iy2 - iy1)
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / (area_a + area_b - inter)


def dist2bbox(distance, anchor_points, xywh: bool = True):
    """DFL distances (l,t,r,b) + anchor points -> boxes (yolov9.py:263-271).

    distance: [..., N, 4], anchor_points: [N, 2].
    """
    lt, rb = distance[..., :2], distance[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def clip_boxes(boxes, hw):
    h, w = hw
    return jnp.stack([
        boxes[..., 0].clip(0, w),
        boxes[..., 1].clip(0, h),
        boxes[..., 2].clip(0, w),
        boxes[..., 3].clip(0, h),
    ], axis=-1)


def scale_boxes(boxes, gain, pad_x, pad_y, src_hw):
    """Letterbox-space xyxy -> source-pixel xyxy, clipped (yolov9.py:406-421)."""
    out = jnp.stack([
        (boxes[..., 0] - pad_x) / gain,
        (boxes[..., 1] - pad_y) / gain,
        (boxes[..., 2] - pad_x) / gain,
        (boxes[..., 3] - pad_y) / gain,
    ], axis=-1)
    return clip_boxes(out, src_hw)
