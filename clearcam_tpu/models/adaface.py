"""AdaFace IR-50 face embedder, TPU-native.

Functional re-implementation of the reference's tinygrad ADAFACE
(models/adaface.py): IR-SE-style 50-layer ResNet on 112x112 faces -> 512-d
L2-normalized identity embeddings. Stem conv64+bn+prelu, 24 BasicBlockIR
residual units (bn -> conv -> bn -> prelu -> strided conv -> bn, with
maxpool-1 or conv+bn shortcut), output bn -> flatten -> 512 linear ->
affine-free batchnorm -> normalize.

Params keyed like the published adaface_ir50_ms1mv2.safetensors (tinygrad
attribute names; `.list.` containers stripped by convert_state_dict).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn import functional as F

# (in, depth, stride) per block (adaface.py:61)
BLOCKS = ([(64, 64, 2)] + [(64, 64, 1)] * 2
          + [(64, 128, 2)] + [(128, 128, 1)] * 3
          + [(128, 256, 2)] + [(256, 256, 1)] * 13
          + [(256, 512, 2)] + [(512, 512, 1)] * 2)


def _block(p, pre, x, cin, depth, stride):
    if depth == cin:
        shortcut = F.max_pool2d(x, 1, stride) if stride > 1 else x
    else:
        shortcut = F.conv2d_p(p, pre + ".shortcut_layer0", x, stride=stride)
        shortcut = F.batch_norm_p(p, pre + ".shortcut_layer1", shortcut)
    h = F.batch_norm_p(p, pre + ".res_layer0", x)
    h = F.conv2d_p(p, pre + ".conv_layer0", h, padding=1)
    h = F.batch_norm_p(p, pre + ".res_layer1", h)
    h = F.prelu(h, p[pre + ".prelu_weight"])
    h = F.conv2d_p(p, pre + ".conv_layer1", h, stride=stride, padding=1)
    h = F.batch_norm_p(p, pre + ".res_layer2", h)
    return h + shortcut


# reduced stack for tests/CI: the four strided transitions only
BLOCKS_MINI = [(64, 64, 2), (64, 128, 2), (128, 256, 2), (256, 512, 2)]


def embed(p: dict, faces, blocks=None):
    """uint8/float RGB [B,112,112,3] -> L2-normalized [B,512].

    Normalization (x/255 - .5)/.5 fused on device (adaface.py:80-96; the
    reference's input is BGR and flips to RGB inline — we take RGB directly).
    """
    if blocks is None:
        n = 1 + max(int(k.split(".")[1]) for k in p if k.startswith("body."))
        blocks = BLOCKS if n == len(BLOCKS) else BLOCKS_MINI
    x = faces.astype(jnp.float32)
    x = (x / 255.0 - 0.5) / 0.5
    x = F.conv2d_p(p, "conv0", x, padding=1)
    x = F.batch_norm_p(p, "bn0", x)
    x = F.prelu(x, p["prelu_weight"])
    for i, (cin, depth, stride) in enumerate(blocks):
        x = _block(p, f"body.{i}", x, cin, depth, stride)
    x = F.batch_norm_p(p, "bn", x)                      # [B,7,7,512]
    b = x.shape[0]
    # flatten matches the reference's NCHW view(b,-1): channel-major
    x = x.transpose(0, 3, 1, 2).reshape(b, -1)
    x = F.linear(x, p["linear.weight"], p["linear.bias"])
    # affine-free 1D batchnorm (running stats only)
    x = (x - p["bn2.running_mean"]) * jnp.reciprocal(
        jnp.sqrt(p["bn2.running_var"] + 1e-5))
    return x / jnp.sqrt((x ** 2).sum(-1, keepdims=True))


def convert_state_dict(sd: dict[str, np.ndarray], dtype=np.float32) -> dict:
    out = {}
    for k, arr in sd.items():
        k = k.replace(".list.", ".").replace(".list", "")
        arr = np.asarray(arr, np.float32)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = F.oihw_to_hwio(arr)
        out[k] = jnp.asarray(arr, dtype)
    return out


def init_params(seed: int = 0, dtype=np.float32, blocks=None) -> dict:
    blocks = BLOCKS if blocks is None else blocks
    rng = np.random.default_rng(seed)
    p: dict[str, jnp.ndarray] = {}

    def conv(pre, cin, cout, k, bias=False):
        fan = cin * k * k
        p[pre + ".weight"] = jnp.asarray(
            rng.normal(0, (2 / fan) ** 0.5, (k, k, cin, cout)), dtype)
        if bias:
            p[pre + ".bias"] = jnp.zeros((cout,), dtype)

    def bn(pre, c):
        p[pre + ".weight"] = jnp.ones((c,), dtype)
        p[pre + ".bias"] = jnp.zeros((c,), dtype)
        p[pre + ".running_mean"] = jnp.zeros((c,), dtype)
        p[pre + ".running_var"] = jnp.ones((c,), dtype)

    conv("conv0", 3, 64, 3)
    bn("bn0", 64)
    p["prelu_weight"] = jnp.full((64,), 0.25, dtype)
    for i, (cin, depth, stride) in enumerate(blocks):
        pre = f"body.{i}"
        bn(pre + ".res_layer0", cin)
        conv(pre + ".conv_layer0", cin, depth, 3)
        bn(pre + ".res_layer1", depth)
        p[pre + ".prelu_weight"] = jnp.full((depth,), 0.25, dtype)
        conv(pre + ".conv_layer1", depth, depth, 3)
        bn(pre + ".res_layer2", depth)
        if depth != cin:
            conv(pre + ".shortcut_layer0", cin, depth, 1)
            bn(pre + ".shortcut_layer1", depth)
    bn("bn", 512)
    p["linear.weight"] = jnp.asarray(
        rng.normal(0, 0.01, (512, 512 * 7 * 7)), dtype)
    p["linear.bias"] = jnp.zeros((512,), dtype)
    p["bn2.running_mean"] = jnp.zeros((512,), dtype)
    p["bn2.running_var"] = jnp.ones((512,), dtype)
    return p
