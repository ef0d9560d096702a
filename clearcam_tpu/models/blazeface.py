"""BlazeFace (back-model, 256x256, 896 anchors) face detector, TPU-native.

Functional re-implementation of the reference's tinygrad BlazeFace
(models/blazeface.py): 5x5 stem conv, 31 depthwise-separable BlazeBlocks with
stride-2 transitions at indices 7/15/23 (24->24->48->96 channels), a final
stride-2 block to 8x8, per-scale classifier/regressor heads (2 anchors/cell
at 16x16 + 6 anchors/cell at 8x8 = 896), anchor-relative box+6-keypoint
decode, score clipping/sigmoid and a dense triu-IoU NMS — all in one jitted
graph on NHWC activations.

Output rows: [ymin, xmin, ymax, xmax, kp0x, kp0y, ... kp5x, kp5y, score] in
256-px space (before the host maps back to the source image), suppressed rows
zeroed (same convention as the reference postprocess, blazeface.py:225-239).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..nn import functional as F
from ..ops.boxes import iou_matrix

RES = 256
N_ANCHORS = 896
SCORE_CLIP = 100.0
MIN_SCORE = 0.85
IOU_THRESHOLD = 0.3

# (index, stride, cin, cout) transitions; all other blocks are 24/48/96 identity
_STAGES = [(7, 24, 24), (15, 24, 48), (23, 48, 96)]


def _block_dims(i: int) -> tuple[int, int, int]:
    """(stride, cin, cout) of backbone block i (blazeface.py:90-122)."""
    for idx, cin, cout in _STAGES:
        if i == idx:
            return 2, cin, cout
    if i < 7:
        return 1, 24, 24
    if i < 15:
        return 1, 24, 24
    if i < 23:
        return 1, 48, 48
    return 1, 96, 96


def _blaze_block(p, pre, x, stride, cin, cout):
    if stride == 2:
        h = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
        x = F.max_pool2d(x, 2, 2)
        h = F.conv2d_p(p, pre + ".conv0_tiny", h, stride=2, padding=0, groups=cin)
    else:
        h = F.conv2d_p(p, pre + ".conv0_tiny", x, stride=1, padding=1, groups=cin)
    h = F.conv2d_p(p, pre + ".conv1_tiny", h)
    if cout > cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cout - cin)))
    return F.relu(x + h)


def forward(p: dict, x):
    """Normalized [B,256,256,3] input -> (regressors [B,896,16],
    scores [B,896,1])."""
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    x = F.relu(F.conv2d_p(p, "conv_tiny", x, stride=2))
    for i in range(31):
        s, cin, cout = _block_dims(i)
        x = _blaze_block(p, f"backbone_tiny.{i}", x, s, cin, cout)
    # final stride-2 block to 8x8 (FinalBlazeBlock, blazeface.py:44-61)
    h = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    h = F.conv2d_p(p, "final.conv0_tiny", h, stride=2, padding=0, groups=96)
    h = F.relu(F.conv2d_p(p, "final.conv1_tiny", h))

    b = x.shape[0]
    c1 = F.conv2d_p(p, "classifier_8_tiny", x).reshape(b, -1, 1)     # [B,512,1]
    c2 = F.conv2d_p(p, "classifier_16_tiny", h).reshape(b, -1, 1)    # [B,384,1]
    r1 = F.conv2d_p(p, "regressor_8_tiny", x).reshape(b, -1, 16)
    r2 = F.conv2d_p(p, "regressor_16_tiny", h).reshape(b, -1, 16)
    return (jnp.concatenate([r1, r2], 1), jnp.concatenate([c1, c2], 1))


def decode(p: dict, raw_boxes, raw_scores):
    """Anchor decode + threshold + NMS (blazeface.py:194-239).
    -> [B, 896, 17] rows, suppressed/zero-score rows zeroed."""
    anchors = p["anchors"]                                     # [896,4] x,y,w,h
    ax, ay, aw, ah = anchors[:, 0], anchors[:, 1], anchors[:, 2], anchors[:, 3]
    xc = raw_boxes[..., 0] / RES * aw + ax
    yc = raw_boxes[..., 1] / RES * ah + ay
    w = raw_boxes[..., 2] / RES * aw
    h = raw_boxes[..., 3] / RES * ah
    boxes = jnp.stack([yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2], -1)
    kp = raw_boxes[..., 4:].reshape(*raw_boxes.shape[:-1], 6, 2)
    kx = kp[..., 0] / RES * aw[:, None] + ax[:, None]
    ky = kp[..., 1] / RES * ah[:, None] + ay[:, None]
    kps = jnp.stack([kx, ky], -1).reshape(*raw_boxes.shape[:-1], 12)
    scores = jax.nn.sigmoid(raw_scores.clip(-SCORE_CLIP, SCORE_CLIP))[..., 0]
    scores = jnp.where(scores >= MIN_SCORE, scores, 0.0)

    # triu-IoU NMS over (ymin,xmin,ymax,xmax) — axes are consistent for IoU
    order = jnp.argsort(-scores, axis=-1)
    boxes_s = jnp.take_along_axis(boxes, order[..., None], 1)
    kps_s = jnp.take_along_axis(kps, order[..., None], 1)
    scores_s = jnp.take_along_axis(scores, order, 1)
    ious = iou_matrix(boxes_s)
    tri = jnp.triu(jnp.ones((boxes.shape[1], boxes.shape[1]), bool), 1)
    suppressed = ((ious > IOU_THRESHOLD) & tri[None]).any(axis=1)
    keep = (~suppressed) & (scores_s > 0)
    rows = jnp.concatenate([boxes_s, kps_s, scores_s[..., None]], -1)
    return rows * keep[..., None]


def detect(p: dict, img256):
    """Normalized-ready uint8/float RGB [256,256,3] (already letterboxed by
    the host) -> [896,17] rows; box+keypoint columns scaled to 256-px
    coordinates, score column left as a probability."""
    x = img256.astype(jnp.float32) / 127.5 - 1.0
    raw, scores = forward(p, x[None])
    rows = decode(p, raw, scores)[0]
    return jnp.concatenate([rows[:, :16] * RES, rows[:, 16:]], -1)


def convert_state_dict(sd: dict[str, np.ndarray], dtype=np.float32) -> dict:
    out = {}
    for k, arr in sd.items():
        k = k.replace(".list.", ".").replace(".list", "")
        arr = np.asarray(arr, np.float32)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = F.oihw_to_hwio(arr)
        out[k] = jnp.asarray(arr, dtype)
    return out


def default_anchors() -> np.ndarray:
    """The standard BlazeFace back-model anchor grid: 16x16 cells x 2 anchors
    + 8x8 cells x 6 anchors, unit w/h, normalized centers. Published
    checkpoints carry their own `anchors` tensor; this is the fallback."""
    anchors = []
    for y in range(16):
        for x in range(16):
            for _ in range(2):
                anchors.append([(x + 0.5) / 16, (y + 0.5) / 16, 1.0, 1.0])
    for y in range(8):
        for x in range(8):
            for _ in range(6):
                anchors.append([(x + 0.5) / 8, (y + 0.5) / 8, 1.0, 1.0])
    return np.array(anchors, np.float32)


def init_params(seed: int = 0, dtype=np.float32) -> dict:
    rng = np.random.default_rng(seed)
    p: dict[str, jnp.ndarray] = {}

    def conv(pre, cin, cout, k, groups=1):
        fan = cin // groups * k * k
        p[pre + ".weight"] = jnp.asarray(
            rng.normal(0, (2 / fan) ** 0.5, (k, k, cin // groups, cout)), dtype)
        p[pre + ".bias"] = jnp.zeros((cout,), dtype)

    conv("conv_tiny", 3, 24, 5)
    for i in range(31):
        s, cin, cout = _block_dims(i)
        conv(f"backbone_tiny.{i}.conv0_tiny", cin, cin, 3, groups=cin)
        conv(f"backbone_tiny.{i}.conv1_tiny", cin, cout, 1)
    conv("final.conv0_tiny", 96, 96, 3, groups=96)
    conv("final.conv1_tiny", 96, 96, 1)
    conv("classifier_8_tiny", 96, 2, 1)
    conv("classifier_16_tiny", 96, 6, 1)
    conv("regressor_8_tiny", 96, 32, 1)
    conv("regressor_16_tiny", 96, 96, 1)
    p["anchors"] = jnp.asarray(default_anchors(), dtype)
    return p
