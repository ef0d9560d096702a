"""YOLO detection fine-tuning loss: task-aligned assignment + CIoU + BCE.

The reference is inference-only (weights fetched from HF, SURVEY §5
"No model checkpoints"); this adds the training capability a framework needs:
the standard anchor-free YOLO objective on our decoded head output
(models/yolov9.forward_raw: [B, N, 4+nc] with xywh boxes in letterbox pixels
and sigmoided class scores).

Assignment is TAL (task-aligned): candidates are anchors whose center falls
inside a GT box; alignment t = score^alpha * IoU^beta; top-k anchors per GT;
anchors claimed by multiple GTs resolve to the highest-IoU GT. Losses:
BCE against t-normalized soft class targets + CIoU on positives. Everything
is static-shape/masked (padded GT rows carry class -1).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import yolov9

ALPHA, BETA = 1.0, 6.0
TOPK = 10
EPS = 1e-9


def _xywh_to_xyxy(b):
    return jnp.concatenate([b[..., :2] - b[..., 2:] / 2,
                            b[..., :2] + b[..., 2:] / 2], -1)


def pairwise_ciou(pred_xyxy, gt_xyxy):
    """[N,4] x [M,4] -> IoU and CIoU [N,M]."""
    px1, py1, px2, py2 = (pred_xyxy[:, None, i] for i in range(4))
    gx1, gy1, gx2, gy2 = (gt_xyxy[None, :, i] for i in range(4))
    iw = jnp.maximum(0.0, jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1))
    ih = jnp.maximum(0.0, jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1))
    inter = iw * ih
    area_p = (px2 - px1) * (py2 - py1)
    area_g = (gx2 - gx1) * (gy2 - gy1)
    union = area_p + area_g - inter + EPS
    iou = inter / union
    # enclosing box diagonal + center distance
    cw = jnp.maximum(px2, gx2) - jnp.minimum(px1, gx1)
    ch = jnp.maximum(py2, gy2) - jnp.minimum(py1, gy1)
    c2 = cw ** 2 + ch ** 2 + EPS
    rho2 = (((px1 + px2) - (gx1 + gx2)) ** 2
            + ((py1 + py2) - (gy1 + gy2)) ** 2) / 4
    # aspect-ratio term
    wp, hp = px2 - px1, (py2 - py1) + EPS
    wg, hg = gx2 - gx1, (gy2 - gy1) + EPS
    v = (4 / np.pi ** 2) * (jnp.arctan(wg / hg) - jnp.arctan(wp / hp)) ** 2
    a = v / (1 - iou + v + EPS)
    return iou, iou - rho2 / c2 - jax.lax.stop_gradient(a) * v


def assign(pred, gt_boxes, gt_cls, anchors):
    """TAL assignment for ONE image.

    pred [N, 4+nc] (xywh + probs), gt [M,4] xyxy, gt_cls [M] (-1 pad),
    anchors [N,2] centers (letterbox px).
    -> (cls_target [N,nc], box_target [N,4] xyxy, fg [N] bool)
    """
    n, m = pred.shape[0], gt_boxes.shape[0]
    nc = pred.shape[1] - 4
    valid = gt_cls >= 0                                        # [M]
    pred_xyxy = _xywh_to_xyxy(pred[:, :4])
    probs = pred[:, 4:]

    iou, _ = pairwise_ciou(pred_xyxy, gt_boxes)                # [N,M]
    cls_idx = jnp.clip(gt_cls, 0, nc - 1)
    score = probs[:, cls_idx]                                  # [N,M]
    align = (score ** ALPHA) * (jnp.maximum(iou, 0.0) ** BETA)

    inside = ((anchors[:, 0:1] > gt_boxes[None, :, 0])
              & (anchors[:, 0:1] < gt_boxes[None, :, 2])
              & (anchors[:, 1:2] > gt_boxes[None, :, 1])
              & (anchors[:, 1:2] < gt_boxes[None, :, 3]))      # [N,M]
    align = jnp.where(inside & valid[None, :], align, 0.0)

    # top-k anchors per GT
    k = min(TOPK, n)
    thresh = jnp.sort(align, axis=0)[-k][None, :]              # kth largest
    mask = (align >= jnp.maximum(thresh, EPS)) & (align > 0)   # [N,M]
    # resolve anchors claimed by several GTs: keep the highest-IoU one
    best_gt = jnp.argmax(jnp.where(mask, iou, -1.0), axis=1)   # [N]
    fg = mask.any(axis=1)
    onehot_gt = jax.nn.one_hot(best_gt, m, dtype=bool)
    mask = mask & onehot_gt

    # soft class targets: t scaled so max per GT equals max IoU per GT
    t_max = align.max(axis=0, keepdims=True)
    iou_max = jnp.where(mask, iou, 0.0).max(axis=0, keepdims=True)
    norm_align = align * iou_max / jnp.maximum(t_max, EPS)
    anchor_score = jnp.where(mask, norm_align, 0.0).max(axis=1)  # [N]

    cls_onehot = jax.nn.one_hot(cls_idx[best_gt], nc)
    cls_target = cls_onehot * anchor_score[:, None]
    box_target = gt_boxes[best_gt]
    return cls_target, box_target, fg


def elementwise_ciou(a_xyxy, b_xyxy):
    """CIoU of matched box pairs [N,4] x [N,4] -> [N]."""
    ax1, ay1, ax2, ay2 = (a_xyxy[:, i] for i in range(4))
    bx1, by1, bx2, by2 = (b_xyxy[:, i] for i in range(4))
    iw = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
    ih = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
    inter = iw * ih
    union = ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1)
             - inter + EPS)
    iou = inter / union
    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw ** 2 + ch ** 2 + EPS
    rho2 = (((ax1 + ax2) - (bx1 + bx2)) ** 2
            + ((ay1 + ay2) - (by1 + by2)) ** 2) / 4
    wa, ha = ax2 - ax1, (ay2 - ay1) + EPS
    wb, hb = bx2 - bx1, (by2 - by1) + EPS
    v = (4 / np.pi ** 2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    a = v / (1 - iou + v + EPS)
    return iou - rho2 / c2 - jax.lax.stop_gradient(a) * v


def detection_loss(params, frames, gt_boxes, gt_cls, *, size="t",
                   box_w=7.5, cls_w=0.5):
    """frames [B,H,W,3] float 0..1 RGB (already letterbox-shaped); GT boxes
    [B,M,4] xyxy in the same pixel space, classes [B,M] (-1 pad).
    -> scalar loss."""
    raw = yolov9.forward_raw(params, frames, size)             # [B,N,4+nc]
    h, w = frames.shape[1:3]
    shapes = [(h // s, w // s) for s in yolov9.STRIDES]
    anchors, strides = yolov9._make_anchors(shapes)
    anchor_px = jnp.asarray(anchors) * jnp.asarray(strides)[:, None]

    def one(pred, gtb, gtc):
        cls_t, box_t, fg = jax.lax.stop_gradient(
            assign(pred, gtb, gtc, anchor_px))
        probs = jnp.clip(pred[:, 4:], EPS, 1 - EPS)
        bce = -(cls_t * jnp.log(probs) + (1 - cls_t) * jnp.log(1 - probs))
        denom = jnp.maximum(cls_t.sum(), 1.0)
        cls_loss = bce.sum() / denom
        pred_xyxy = _xywh_to_xyxy(pred[:, :4])
        ciou = elementwise_ciou(pred_xyxy, box_t)
        weight = cls_t.max(axis=1) * fg
        box_loss = ((1.0 - ciou) * weight).sum() / denom
        return cls_w * cls_loss + box_w * box_loss

    return jax.vmap(one)(raw, gt_boxes, gt_cls).mean()


def make_finetune_step(size: str = "t", lr: float = 1e-3,
                       clip_norm: float = 10.0, remat: bool = False):
    """jitted optimizer step over the detection loss (params as arguments;
    shard with parallel.mesh for multi-chip). Global-norm clipping keeps the
    large cold-start cls loss from destabilizing adamw. remat=True
    rematerializes the forward in the backward pass (jax.checkpoint) —
    trades ~1 extra forward of FLOPs for activation memory, enabling larger
    batch x resolution on one chip."""
    import optax
    opt = optax.chain(optax.clip_by_global_norm(clip_norm), optax.adamw(lr))

    loss_fn = functools.partial(detection_loss, size=size)
    if remat:
        loss_fn = jax.checkpoint(loss_fn)

    @jax.jit
    def step(params, opt_state, frames, gt_boxes, gt_cls):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, frames, gt_boxes, gt_cls)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, opt
