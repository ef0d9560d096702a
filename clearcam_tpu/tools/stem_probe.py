"""Isolate the YOLOv9-t stem's device cost (VERDICT r2 item 7).

Before accepting "XLA's practical ceiling" for the ~22% detect MFU, measure
what the shallow stem (conv 3->16 s2 + conv 16->32 s2, silu) actually costs
XLA at the serving batch, and compare against the HBM-bandwidth roofline —
the stem's channel counts (K = 27, N = 16) can fill at most ~2.6% of the
128x128 MXU in any matmul formulation, so it is bandwidth-bound by
construction; the open question is how close to the bandwidth bound XLA
already runs. If XLA is near the roofline, a hand-written Pallas kernel has
no headroom (the fusion saving — not re-reading the 320^2x16 intermediate —
bounds the win at one mid-tensor round trip).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m clearcam_tpu.tools.stem_probe [--batch 128]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import functional as F


def stem(p, x):
    """conv(3->16, 3x3, s2) + silu + conv(16->32, 3x3, s2) + silu — the first
    two layers of the t graph (models/yolov9.py:_graph_small)."""
    y = F.conv2d(x, p["w0"], p["b0"], stride=2, padding=1)
    y = jax.nn.silu(y)
    y = F.conv2d(y, p["w1"], p["b1"], stride=2, padding=1)
    return jax.nn.silu(y)


def timeit(fn, *args, steps=30):
    out = fn(*args)
    np.asarray(out)                      # compile + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--res", type=int, default=640)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args(argv)
    b, r = args.batch, args.res

    rng = np.random.default_rng(0)
    p = {
        "w0": jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.1, jnp.bfloat16),
        "b0": jnp.zeros((16,), jnp.bfloat16),
        "w1": jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1, jnp.bfloat16),
        "b1": jnp.zeros((32,), jnp.bfloat16),
    }
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((b, r, r, 3)), jnp.bfloat16))

    # device-side timing over the axon tunnel REQUIRES a tiny readback:
    # the stem's [128,160,160,32] output is ~210 MB, which at ~20 MB/s
    # tunnel bandwidth costs ~10 s per np.asarray — reduce to a scalar
    # inside the jit so the queue-drain sync transfers 4 bytes (first
    # version of this probe measured 607 ms "stem time" that was pure
    # readback; true device time is ~1 ms)
    fused = jax.jit(lambda p, x: stem(p, x).mean())
    dt = timeit(fused, p, x, steps=args.steps)

    # also time the two convs with a forced materialization between them
    # (what a NON-fused schedule would pay), to see whether XLA's win is
    # already the fusion a Pallas kernel would hand-build
    conv0 = jax.jit(lambda p, x: jax.nn.silu(
        F.conv2d(x, p["w0"], p["b0"], stride=2, padding=1)))
    conv1 = jax.jit(lambda p, y: jax.nn.silu(
        F.conv2d(y, p["w1"], p["b1"], stride=2, padding=1)).mean())
    mid = conv0(p, x)
    np.asarray(conv1(p, mid))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        mid = conv0(p, x)
        out = conv1(p, mid)
    np.asarray(out)
    dt_split = (time.perf_counter() - t0) / args.steps

    # conv1 / conv2 in isolation (where does the 4 ms go?)
    c0_only = jax.jit(lambda p, x: jax.nn.silu(
        F.conv2d(x, p["w0"], p["b0"], stride=2, padding=1)).mean())
    dt_c0 = timeit(c0_only, p, x, steps=args.steps)
    mid_in = jax.device_put(jnp.asarray(
        rng.standard_normal((b, r // 2, r // 2, 16)), jnp.bfloat16))
    c1_only = jax.jit(lambda p, y: jax.nn.silu(
        F.conv2d(y, p["w1"], p["b1"], stride=2, padding=1)).mean())
    dt_c1 = timeit(c1_only, p, mid_in, steps=args.steps)

    # phase-split reformulation: if the preprocess emits a 2x2
    # space-to-depth layout for free (it is a gather anyway), conv1
    # becomes a 2x2 stride-1 conv over 12 channels. Time THAT conv alone
    # (the split itself is outside the timed graph).
    x_s2d = jax.device_put(
        jnp.asarray(rng.standard_normal((b, r // 2, r // 2, 12)),
                    jnp.bfloat16))
    w0_s2d = jnp.zeros((2, 2, 12, 16), jnp.bfloat16)  # taps scattered; same flops
    c0_s2d = jax.jit(lambda w, x: jax.nn.silu(jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)).mean())
    dt_c0_s2d = timeit(c0_s2d, w0_s2d, x_s2d, steps=args.steps)

    # roofline: unavoidable HBM bytes = read x + write out (bf16)
    bytes_min = b * (r * r * 3 + (r // 4) * (r // 4) * 32) * 2
    bytes_mid = b * (r // 2) * (r // 2) * 16 * 2     # the fusable intermediate
    flops = b * ((r // 2) ** 2 * 16 * 27 + (r // 4) ** 2 * 32 * 16 * 9) * 2
    bw = 819e9                                        # v5e HBM ~819 GB/s
    print(json.dumps({
        "batch": b, "stem_ms": round(dt * 1e3, 3),
        "stem_split_ms": round(dt_split * 1e3, 3),
        "conv1_ms": round(dt_c0 * 1e3, 3),
        "conv2_ms": round(dt_c1 * 1e3, 3),
        "conv1_s2d_2x2s1_ms": round(dt_c0_s2d * 1e3, 3),
        "roofline_ms_min_traffic": round(bytes_min / bw * 1e3, 3),
        "roofline_ms_with_mid_roundtrip": round(
            (bytes_min + 2 * bytes_mid) / bw * 1e3, 3),
        "stem_gflop": round(flops / 1e9, 2),
        "mxu_ms_at_2.6pct_util": round(flops / (197e12 * 0.026) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
