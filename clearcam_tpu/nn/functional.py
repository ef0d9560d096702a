"""Functional NHWC neural-net primitives for TPU.

Everything operates on plain dicts of jnp arrays ("params") and is safe to
trace under jit/pjit. Layout choices are TPU-first:

  * activations NHWC (channels-last rides the 128-wide lane dimension)
  * conv weights HWIO (XLA's native TPU filter layout)
  * matmuls carry preferred_element_type=float32 so bf16 inputs still
    accumulate in f32 on the MXU

Params use flat string keys mirroring the reference checkpoints' state-dict
names (e.g. "model.0.conv.weight") so published safetensors load without a
rename table; OIHW filters are transposed to HWIO at load time
(see clearcam_tpu.io.safetensors + each model's `convert_state_dict`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = dict


# ---------------------------------------------------------------------------
# convolution / pooling
# ---------------------------------------------------------------------------

def conv2d(x, w, b=None, *, stride=1, padding=0, groups=1, dilation=1):
    """NHWC conv with HWIO weights.

    padding: int or (ph, pw) — symmetric spatial padding (reference semantics,
    detection/yolov9.py:33-38 uses torch-style int padding).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv2d_p(p: Params, prefix: str, x, **kw):
    """Conv from flat params: `{prefix}.weight` (HWIO) and optional `.bias`."""
    return conv2d(x, p[prefix + ".weight"], p.get(prefix + ".bias"), **kw)


def _pool(x, kind, window, stride, padding, pad_value):
    if isinstance(window, int):
        window = (window, window)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    dims = (1, window[0], window[1], 1)
    strides = (1, stride[0], stride[1], 1)
    pads = ((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0))
    if kind == "max":
        return lax.reduce_window(x, pad_value, lax.max, dims, strides, pads)
    return lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)


def max_pool2d(x, window, stride=None, padding=0):
    stride = window if stride is None else stride
    # -inf (not finfo.min) so XLA recognizes the max monoid and autodiff works
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return _pool(x, "max", window, stride, padding, neg)


def avg_pool2d(x, window, stride=None, padding=0, count_include_pad=True):
    """Average pool. count_include_pad=True matches the reference's
    Tensor.avg_pool2d(..., count_include_pad=True) in ADown (yolov9.py:47)."""
    stride = window if stride is None else stride
    s = _pool(x, "avg", window, stride, padding, 0.0)
    if count_include_pad:
        if isinstance(window, int):
            denom = window * window
        else:
            denom = window[0] * window[1]
        return s / denom
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = _pool(ones, "avg", window, stride, padding, 0.0)
    return s / counts


def upsample_nearest(x, scale=2):
    """Nearest-neighbour 2x upsample (reference Upsample, yolov9.py:285-292)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


# ---------------------------------------------------------------------------
# activations / norms / linear
# ---------------------------------------------------------------------------

silu = jax.nn.silu
gelu = jax.nn.gelu
relu = jax.nn.relu


def prelu(x, weight):
    """Channel-wise PReLU over the last (channel) axis."""
    return jnp.where(x > 0, x, weight * x)


def linear(x, w, b=None):
    """x @ w.T + b with torch-style (out, in) weight, f32 MXU accumulation.

    Accepts a QuantLinear (weight-only int8) in place of a dense weight —
    params dicts can hold either and every call site stays unchanged.
    """
    from ..ops.quant_matmul import QuantLinear, QuantLinear4, quant_linear
    if isinstance(w, (QuantLinear, QuantLinear4)):
        return quant_linear(x, w, b)
    y = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def linear_p(p: Params, prefix: str, x):
    return linear(x, p[prefix + ".weight"], p.get(prefix + ".bias"))


def layer_norm(x, weight=None, bias=None, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def layer_norm_p(p: Params, prefix: str, x, eps=1e-5):
    return layer_norm(x, p.get(prefix + ".weight"), p.get(prefix + ".bias"), eps)


def rms_norm(x, weight, eps=1e-5):
    x32 = x.astype(jnp.float32)
    y = x32 * lax.rsqrt((x32 * x32).mean(-1, keepdims=True) + eps)
    return (y * weight).astype(x.dtype)


def batch_norm_inference(x, weight, bias, mean, var, eps=1e-5):
    """Inference-mode batchnorm over the channel (last) axis.

    Kept un-folded so reference checkpoints load 1:1; XLA fuses the affine
    into the preceding conv anyway.
    """
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * weight + bias


def batch_norm_p(p: Params, prefix: str, x, eps=1e-5):
    return batch_norm_inference(
        x, p[prefix + ".weight"], p[prefix + ".bias"],
        p[prefix + ".running_mean"], p[prefix + ".running_var"], eps)


def embedding(table, ids):
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def mha(q, k, v, mask=None, scale=None):
    """Multi-head attention on (B, H, L, D) tensors with f32 softmax."""
    d = q.shape[-1]
    scale = (1.0 / np.sqrt(d)) if scale is None else scale
    scores = jnp.matmul(q, k.swapaxes(-1, -2), preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.matmul(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def split_heads(x, n_heads):
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


# ---------------------------------------------------------------------------
# weight-layout conversion
# ---------------------------------------------------------------------------

def oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch/tinygrad conv filter (O,I,H,W) -> XLA HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
