"""Parity tests for the fused Pallas YOLOv9 stem (ops/stem.py).

The kernel folds both stride-2 3x3 convs' im2col into packed weights over
a 4x4 space-to-depth plane layout; these tests pin it against the plain
conv_silu composition it replaces (reference behavior:
detection/yolov9.py:33-58, Conv blocks 0-1). Runs in Pallas interpret
mode on CPU — the real-TPU timing lives in tools/stem_kernel_probe.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from clearcam_tpu.nn import functional as F
from clearcam_tpu.ops import stem as S


def _ref_stem(x, w1, b1, w2, b2):
    y = F.silu(F.conv2d(x, jnp.asarray(w1, jnp.bfloat16), jnp.asarray(b1),
                        stride=2, padding=1))
    return F.silu(F.conv2d(y, jnp.asarray(w2, jnp.bfloat16), jnp.asarray(b2),
                           stride=2, padding=1))


@pytest.mark.parametrize("res", [16, 32])
def test_stem_matches_conv_composition(res):
    rng = np.random.default_rng(0)
    x = rng.random((2, res, res, 3), np.float32)
    w1 = (rng.standard_normal((3, 3, 3, 16)) * 0.2).astype(np.float32)
    b1 = (rng.standard_normal(16) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, 16, 32)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal(32) * 0.1).astype(np.float32)

    ref = np.asarray(_ref_stem(jnp.asarray(x, jnp.bfloat16),
                               w1, b1, w2, b2), np.float32)
    got = np.asarray(S.stem(jnp.asarray(x), w1, b1, w2, b2, interpret=True),
                     np.float32)
    assert got.shape == ref.shape == (2, res // 4, res // 4, 32)
    # bf16 weights + bf16 intermediate: differences are rounding-only
    assert np.max(np.abs(ref - got)) < 0.05


def test_s4d_planes_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.random((1, 8, 8, 3), np.float32)
    planes = np.asarray(S.s4d_planes(jnp.asarray(x)))
    # planes[b, Y, (ry*4+rx)*3+c, X] == x[b, 4Y+ry, 4X+rx, c]
    for ry in range(4):
        for rx in range(4):
            for c in range(3):
                np.testing.assert_allclose(
                    planes[0, :, (ry * 4 + rx) * 3 + c, :],
                    x[0, ry::4, rx::4, c], rtol=1e-6)
