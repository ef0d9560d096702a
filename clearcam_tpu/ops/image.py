"""On-device image preprocessing.

The reference letterboxes on device with tinygrad (detection/yolov9.py:390-404:
bilinear resize to r = min(res/h, res/w), then symmetric pad to a stride-32
multiple). We fuse the same math — uint8 frame -> resize -> pad -> BGR->RGB ->
/255 — into the jitted detector graph so the host->HBM transfer is raw uint8
frames and everything else runs on the VPU/MXU.

All shape arithmetic happens at trace time (static shapes; no data-dependent
control flow) so one compiled program exists per (src_h, src_w, res) bucket —
replacing the reference's shape-keyed TinyJit cache (utils/helpers.py:214-221).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import image as jimage


def letterbox_plan(src_hw: tuple[int, int], res: int, stride: int = 32,
                   auto: bool = True, scaleup: bool = True):
    """Static letterbox geometry, mirroring YOLOv9.preprocess (yolov9.py:390-404).

    Returns (new_w, new_h, pad_left, pad_top, out_w, out_h, gain).
    `auto=True` pads only to the next stride multiple (minimum-pad mode).
    """
    h, w = src_hw
    r = min(res / h, res / w)
    if not scaleup:
        r = min(r, 1.0)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw, dh = res - new_w, res - new_h
    if auto:
        dw, dh = dw % stride, dh % stride
    half_w, half_h = dw / 2, dh / 2
    pad_left = int(round(half_w - 0.1))
    pad_top = int(round(half_h - 0.1))
    out_w = new_w + 2 * pad_left
    out_h = new_h + 2 * pad_top
    return new_w, new_h, pad_left, pad_top, out_w, out_h, r


def letterbox(frames, res: int, stride: int = 32, auto: bool = True,
              bgr_to_rgb: bool = True, dtype=jnp.float32):
    """uint8 [B,H,W,3] frames -> letterboxed, normalized [B,H',W',3] in [0,1].

    Matches the reference preprocess: bilinear (half-pixel) resize, zero pad,
    BGR->RGB channel flip, /255 (yolov9.py:375-379,390-404).

    Performance: at an exact integer downscale k (1080p->640 is k=3) the
    half-pixel bilinear kernel degenerates to a single pixel tap (odd k) or a
    2x2 average (even k), so we slice the *raw uint8* frames instead of
    gather-resizing a full-resolution float tensor — the resize was ~1/3 of
    the whole detect step's time at batch 128. Channel flip and /255 are
    linear, so hoisting them after the resize is exact.
    """
    b, h, w, c = frames.shape
    new_w, new_h, pl, pt, out_w, out_h, _ = letterbox_plan((h, w), res, stride, auto)
    kh = h // new_h if new_h and h % new_h == 0 else 0
    kw = w // new_w if new_w and w % new_w == 0 else 0
    if (new_h, new_w) == (h, w):
        x = frames.astype(dtype)
    elif kh == kw and kh > 1 and kh % 2 == 1:
        # odd k: src_x = k*i + (k-1)/2 is integral -> strided slice
        off = (kh - 1) // 2
        x = frames[:, off::kh, off::kw, :].astype(dtype)
    elif kh == kw and kh > 1:
        # even k: src_x = k*i + (k-1)/2 is half-integral -> 2x2 average
        lo, hi = kh // 2 - 1, kh // 2
        x = (frames[:, lo::kh, lo::kw, :].astype(dtype)
             + frames[:, lo::kh, hi::kw, :].astype(dtype)
             + frames[:, hi::kh, lo::kw, :].astype(dtype)
             + frames[:, hi::kh, hi::kw, :].astype(dtype)) * 0.25
    else:
        # antialias=False = plain half-pixel bilinear, the reference's
        # Tensor.interpolate(mode='linear', align_corners=False) semantics
        # (utils/helpers.py:127-131); jax's default antialias=True is a
        # triangle-filtered downsample and does NOT match.
        x = jimage.resize(frames.astype(dtype), (b, new_h, new_w, c),
                          method="linear", antialias=False)
    if bgr_to_rgb:
        x = x[..., ::-1]
    x = x / 255.0
    x = jnp.pad(x, ((0, 0), (pt, out_h - new_h - pt), (pl, out_w - new_w - pl), (0, 0)))
    return x


def scale_boxes_params(src_hw: tuple[int, int], res: int, stride: int = 32,
                       auto: bool = True):
    """(gain, pad_x, pad_y) to map letterboxed-space boxes back to source pixels
    (reference scale_boxes, yolov9.py:406-416)."""
    h, w = src_hw
    _, _, _, _, out_w, out_h, _ = letterbox_plan((h, w), res, stride, auto)
    gain = min(out_h / h, out_w / w)
    pad_x = (out_w - w * gain) / 2
    pad_y = (out_h - h * gain) / 2
    return gain, pad_x, pad_y


def resize_bilinear(img, out_hw):
    """Bilinear half-pixel resize of HWC or BHWC arrays (reference
    utils/helpers.py:127-131 resize)."""
    if img.ndim == 3:
        return jimage.resize(img, (out_hw[0], out_hw[1], img.shape[-1]), method="linear")
    return jimage.resize(img, (img.shape[0], out_hw[0], out_hw[1], img.shape[-1]),
                         method="linear")


def center_pad_to(img, out_hw, value=0.0):
    """Pad an HWC image to out_hw centering the content; returns (img, top, left)."""
    h, w = img.shape[:2]
    th, tw = out_hw
    top = (th - h) // 2
    left = (tw - w) // 2
    out = jnp.full((th, tw, img.shape[2]), value, img.dtype)
    out = out.at[top:top + h, left:left + w].set(img)
    return out, top, left


def normalize(x, mean, std):
    mean = jnp.asarray(mean, x.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, x.dtype).reshape(1, 1, 1, -1)
    return (x - mean) / std
