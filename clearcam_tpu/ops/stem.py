"""Fused YOLOv9 stem (conv1 s2 + silu + conv2 s2 + silu) as one Pallas kernel.

Why: the stem is the detect graph's worst stage — 4.07 ms of the 23.9 ms
batch-128 step (17%) for 4% of the FLOPs, ~2.4x over its HBM roofline
(PERF.md "Where the remaining detect gap is"). cin=3 gives the MXU a 2.6%
best-case fill through XLA's conv, and the conv1->conv2 intermediate
(320x320x16) round-trips HBM.

How (the formulation that kills im2col): lay the input out as 4x4
space-to-depth channel planes [G, 48, G] (one XLA transpose, fusable
into the letterbox producer; G = H/4). Every conv tap of BOTH convs then
reads a whole plane row at offsets {0,-1} in y (previous row) and {0,-1}
in x (one lane roll). The im2col gather therefore FOLDS INTO THE WEIGHTS:

    out1_row(y) = silu(W1p @ [prev_in_row; cur_in_row; shifted] + b1)
    out2_row(y) = silu(W2p @ [prev_out1_row; cur_out1_row; shifted] + b2)

— two MXU matmuls per output row, one VPU lane-roll, zero patch building,
and the conv1 intermediate never leaves VMEM (a [64, G] carry). Row index
y lives on a LEADING (non-tiled) axis — Mosaic requires dynamic indices
on the tiled (last two) dims to be tile-aligned, so the layout keeps them
static. Output parity planes: out1 channel m = (py*2+px)*16 + ch holds
conv1 output pixel (2y''+py, 2x''+px); conv2 consumes them the same way
and emits [G, 32, G] (y, channel, x).

Numerics: bf16 inputs/weights, f32 MXU accumulation, f32 bias+silu, bf16
out — the same contract as nn.functional conv_silu in bf16 mode.

Reference behavior mirrored: detection/yolov9.py:33-58 (Conv blocks 0-1 of
the t/s graphs; stride-2 3x3 + silu). The kernel is a TPU-native
re-design, not a translation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 160          # plane grid side for 640x640 input (640/4)


# ---------------------------------------------------------------------------
# host-side packing (numpy, once per weight set)
# ---------------------------------------------------------------------------

def s4d_planes(x):
    """Letterboxed [B, 4G, 4G, 3] -> row-major space-to-depth planes
    [B, G, 48, G]: planes[b, Y, (ry*4+rx)*3+c, X] = x[b, 4Y+ry, 4X+rx, c]."""
    b, h, w, c = x.shape
    assert h % 4 == 0 and w % 4 == 0 and c == 3
    x = x.reshape(b, h // 4, 4, w // 4, 4, 3)
    return x.transpose(0, 1, 2, 4, 5, 3).reshape(b, h // 4, 48, w // 4)


def pack_w1(w1: np.ndarray) -> np.ndarray:
    """conv1 HWIO [3,3,3,16] -> [64, 192] over
    [prev48; cur48; shifted96] rows of the input planes."""
    assert w1.shape == (3, 3, 3, 16)
    out = np.zeros((64, 192), np.float32)
    for py in range(2):
        for px in range(2):
            m0 = (py * 2 + px) * 16
            for dy in range(3):
                for dx in range(3):
                    e, f = 2 * py + dy - 1, 2 * px + dx - 1
                    q_row = ((e % 4) * 4 + (f % 4)) * 3    # + c
                    k = q_row + (0 if e < 0 else 48)       # prev/cur half
                    if f < 0:
                        k += 96                            # shifted copy
                    for c in range(3):
                        out[m0:m0 + 16, k + c] = w1[dy, dx, c]
    return out


def pack_w2(w2: np.ndarray) -> np.ndarray:
    """conv2 HWIO [3,3,16,32] -> [32, 256] over
    [prev_out1_64; cur_out1_64; shifted128]."""
    assert w2.shape == (3, 3, 16, 32)
    out = np.zeros((32, 256), np.float32)
    for dy in range(3):
        half = 0 if dy == 0 else 64                # dy=0 reads row y-1
        py = 1 if dy != 1 else 0                   # (2y+dy-1) % 2
        for dx in range(3):
            px = 1 if dx != 1 else 0
            shift = 128 if dx == 0 else 0
            k = half + (py * 2 + px) * 16 + shift
            out[:, k:k + 16] = w2[dy, dx].T
    return out


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _silu(x):
    return x * jax.nn.sigmoid(x)


def shift_matrix(g: int) -> np.ndarray:
    """[g, g] subdiagonal permutation: (v @ S)[.., x] = v[.., x-1], 0 at
    x=0. Mosaic rejects pltpu.roll on non-128-multiple lane widths
    (tpu.dynamic_rotate crash at g=160); a permutation matmul shifts
    exactly (one term per output) and rides the MXU instead."""
    s = np.zeros((g, g), np.float32)
    s[np.arange(g - 1), np.arange(1, g)] = 1.0
    return s


def _make_kernel(g: int):
    def kernel(planes_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref, out_ref,
               carry_ref):
        def shift_right(v):                  # exact: permutation matmul
            return jnp.dot(v, s_ref[:],
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        carry_ref[:] = jnp.zeros_like(carry_ref)  # out1 row -1 = padding

        def body(y, _):
            prev = planes_ref[0, jnp.maximum(y - 1, 0)] \
                * jnp.where(y > 0, 1, 0).astype(jnp.bfloat16)
            cur = planes_ref[0, y]
            p = jnp.concatenate([prev, cur], 0)                # [96, g]
            p = jnp.concatenate([p, shift_right(p)], 0)        # [192, g]
            o1 = jnp.dot(w1_ref[:], p, preferred_element_type=jnp.float32)
            o1 = _silu(o1 + b1_ref[:]).astype(jnp.bfloat16)    # [64, g]
            p2 = jnp.concatenate([carry_ref[:], o1], 0)        # [128, g]
            p2 = jnp.concatenate([p2, shift_right(p2)], 0)     # [256, g]
            o2 = jnp.dot(w2_ref[:], p2, preferred_element_type=jnp.float32)
            out_ref[0, y] = _silu(o2 + b2_ref[:]).astype(jnp.bfloat16)
            carry_ref[:] = o1
            return 0

        jax.lax.fori_loop(0, g, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def stem_planes(planes, w1p, b1, w2p, b2, *, interpret: bool = False):
    """[B,g,48,g] bf16 planes + packed weights -> [B,g,32,g] bf16."""
    b, g, _, g2 = planes.shape
    assert g == g2, "square plane grid"
    s = jnp.asarray(shift_matrix(g), jnp.bfloat16)
    return pl.pallas_call(
        _make_kernel(g),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, g, 48, g), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((64, 192), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((32, 256), lambda i: (0, 0)),
            pl.BlockSpec((32, 1), lambda i: (0, 0)),
            pl.BlockSpec((g, g), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, 32, g), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, g, 32, g), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((64, g), jnp.bfloat16)],
        interpret=interpret,
    )(planes, w1p, b1, w2p, b2, s)


def stem(x, w1, b1, w2, b2, *, interpret: bool = False):
    """Fused stem from letterboxed [B,H,W,3] (float 0..1 RGB) to NHWC
    [B,H/4,W/4,32] — drop-in for conv_silu(conv1) . conv_silu(conv2).
    w1/w2 HWIO, b1/b2 vectors. H and W must be equal multiples of 4."""
    planes = s4d_planes(x.astype(jnp.bfloat16))
    w1p = jnp.asarray(pack_w1(np.asarray(w1, np.float32)), jnp.bfloat16)
    w2p = jnp.asarray(pack_w2(np.asarray(w2, np.float32)), jnp.bfloat16)
    # out1 channel m=(py*2+px)*16+ch -> bias repeats per parity position
    b1c = jnp.asarray(np.tile(np.asarray(b1, np.float32), 4).reshape(-1, 1))
    b2c = jnp.asarray(np.asarray(b2, np.float32).reshape(-1, 1))
    out = stem_planes(planes, w1p, b1c, w2p, b2c, interpret=interpret)
    return out.transpose(0, 1, 3, 2)                     # [B,g,32,g] -> NHWC
