"""RF-DETR support: COCO-91 -> COCO-80 class remap + DETR postprocess.

The reference optionally runs an RF-DETR nano alongside YOLOv9
(test/run_mot.py:3,36-37 imports `detection/rfdetr.py` with a `detr_to_yolo`
remap — that file is absent from the snapshot). We provide the pieces its
behavior implies so a DETR-family checkpoint can drop into the tracking
pipeline: the standard 91->80 COCO category remap and a postprocess that
turns query outputs (logits + cxcywh boxes) into the [x1,y1,x2,y2,score,cls]
rows the tracker consumes. DETR needs no NMS (set queries are disjoint by
training), so postprocess is a pure decode.

A full RF-DETR (LW-DETR) forward pass is round-2 work; any jittable
`query_fn(frames) -> (logits [B,Q,91], boxes [B,Q,4])` plugs in via
DETRDetector.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# COCO paper ids (1..90, with gaps) -> contiguous 80-class YOLO ids.
# Standard mapping: the 80 valid ids in ascending order map to 0..79.
_COCO91_VALID = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90,
]
detr_to_yolo = {c91: i for i, c91 in enumerate(_COCO91_VALID)}

_REMAP = np.full(92, -1, np.int32)
for c91, y in detr_to_yolo.items():
    _REMAP[c91] = y


def remap_class_ids(ids):
    """Vectorized 91->80 remap; unknown ids -> -1."""
    return jnp.asarray(_REMAP)[jnp.asarray(ids, jnp.int32).clip(0, 91)]


def detr_postprocess(logits, boxes_cxcywh, img_hw, conf_threshold: float = 0.5,
                     max_det: int = 300, remap: bool = True,
                     background_last: bool = True):
    """DETR query outputs -> [B, max_det, 6] rows (x1,y1,x2,y2,score,cls).

    logits [B,Q,C] (softmax over classes, last = background when
    background_last), boxes [B,Q,4] normalized cxcywh. Top max_det by score;
    below-threshold rows zeroed (same output convention as yolov9.detect).
    """
    probs = jax.nn.softmax(logits, -1)
    if background_last:
        probs = probs[..., :-1]
    scores = probs.max(-1)
    cls = probs.argmax(-1)
    if remap:
        cls = remap_class_ids(cls)
    scores = jnp.where((scores >= conf_threshold) & (cls >= 0), scores, 0.0)

    h, w = img_hw
    cx, cy, bw, bh = (boxes_cxcywh[..., i] for i in range(4))
    rows = jnp.stack([
        (cx - bw / 2) * w, (cy - bh / 2) * h,
        (cx + bw / 2) * w, (cy + bh / 2) * h,
        scores, cls.astype(boxes_cxcywh.dtype)], -1)
    k = min(max_det, rows.shape[1])
    top_scores, order = jax.lax.top_k(scores, k)
    rows = jnp.take_along_axis(rows, order[..., None], 1)
    return rows * (top_scores > 0)[..., None]


class DETRDetector:
    """Tracker-compatible wrapper (detect_many) around any jittable DETR-style
    query function."""

    def __init__(self, query_fn, img_hw, conf_threshold: float = 0.5):
        self._fn = jax.jit(
            lambda frames: detr_postprocess(*query_fn(frames), img_hw,
                                            conf_threshold))
        self.img_hw = img_hw

    def detect_many(self, frames):
        batch = jnp.asarray(np.stack(frames))
        out = np.asarray(self._fn(batch))
        return [out[i] for i in range(len(frames))]
