"""Batched on-device NMS.

The reference already runs NMS on the accelerator as a dense triu-IoU mask
(detection/yolov9.py:439-458): top-k by confidence, pairwise IoU, suppress any
box that overlaps a higher-ranked same-class box. We keep that property — it
is exactly the right shape for TPU (one [B,K,K] batched mask, no
data-dependent loops) — and emit fixed-size [B, K, 6] outputs
(x1,y1,x2,y2,score,class) with suppressed rows zeroed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import iou_matrix


def batched_nms(boxes_xyxy, scores, class_ids, max_det: int = 300,
                iou_threshold: float = 0.45, class_aware: bool = True):
    """Dense triu-IoU NMS. Inputs [B,N,4] xyxy, [B,N] scores, [B,N] class ids.

    Scores below the caller's confidence cutoff must already be zeroed; zero
    rows sort last and yield zero output rows (the reference zeroes suppressed
    entries the same way via `boxes * no_overlap_mask`).

    Returns [B, K, 6] rows (x1,y1,x2,y2,score,class); K = min(max_det, N).
    """
    b, n = scores.shape
    k = min(max_det, n)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = jnp.take_along_axis(boxes_xyxy, order[..., None], axis=1)
    top_cls = jnp.take_along_axis(class_ids, order, axis=1)

    ious = iou_matrix(top_boxes)
    # only higher-ranked (earlier) boxes can suppress: strict upper triangle
    tri = jnp.triu(jnp.ones((k, k), bool), 1)
    overlap = (ious > iou_threshold) & tri[None]
    if class_aware:
        overlap &= top_cls[:, :, None] == top_cls[:, None, :]
    keep = ~overlap.any(axis=1)
    keep &= top_scores > 0

    rows = jnp.concatenate(
        [top_boxes, top_scores[..., None], top_cls[..., None].astype(top_boxes.dtype)],
        axis=-1)
    return rows * keep[..., None]


def yolo_postprocess(raw, max_det: int = 300, conf_threshold: float = 0.25,
                     iou_threshold: float = 0.45):
    """Decode a YOLO head output [B, N, 4+nc] (xywh + class scores) into
    NMS'd [B, max_det, 6] rows. Mirrors detection/yolov9.py:439-458.
    """
    xywh = raw[..., :4]                          # [B, N, 4]
    cls_scores = raw[..., 4:]                    # [B, N, nc]
    class_ids = jnp.argmax(cls_scores, axis=-1)
    probs = cls_scores.max(axis=-1)
    probs = jnp.where(probs >= conf_threshold, probs, 0.0)
    xc, yc, w, h = xywh[..., 0], xywh[..., 1], xywh[..., 2], xywh[..., 3]
    boxes = jnp.stack([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], axis=-1)
    return batched_nms(boxes, probs, class_ids, max_det, iou_threshold)
