"""Measure the Pallas fused-stem kernel (ops/stem.py) vs XLA's stem.

Closes VERDICT r4 item 9: the round-3 probes bounded any hand-written
stem within ~10% of XLA by extrapolation; this measures the one
formulation those probes did NOT cover — im2col folded into packed
weights over a 4x4 space-to-depth layout (zero patch building) — and
records win or loss.

Timing methodology: device-side via in-jit scalar reduction + queue
drain (see tools/stem_probe.py:66-71 — naive readback times the ~20 MB/s
axon tunnel, not the chip).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python -m clearcam_tpu.tools.stem_kernel_probe [--batch 128]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import functional as F
from ..ops import stem as S


def timeit(fn, *args, steps=30):
    out = fn(*args)
    np.asarray(out)
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
    w1 = (rng.standard_normal((3, 3, 3, 16)) * 0.1).astype(np.float32)
    b1 = np.zeros(16, np.float32)
    w2 = (rng.standard_normal((3, 3, 16, 32)) * 0.1).astype(np.float32)
    b2 = np.zeros(32, np.float32)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((b, r, r, 3)), jnp.bfloat16))

    # XLA baseline (identical to stem_probe's fused stem)
    def xla_stem(x, w1, b1, w2, b2):
        y = jax.nn.silu(F.conv2d(x, jnp.asarray(w1, jnp.bfloat16),
                                 jnp.asarray(b1), stride=2, padding=1))
        return jax.nn.silu(F.conv2d(y, jnp.asarray(w2, jnp.bfloat16),
                                    jnp.asarray(b2), stride=2, padding=1))
    # weights ride as jitted ARGUMENTS (repo convention: never close a
    # jitted fn over weight arrays); the wrapper keeps timeit 1-ary
    xla_m = jax.jit(lambda x, *w: xla_stem(x, *w).mean())
    xla = lambda x: xla_m(x, w1, b1, w2, b2)  # noqa: E731
    dt_xla = timeit(xla, x, steps=args.steps)

    # Pallas kernel: planes prebuilt on device (in the real pipeline the
    # 4x4 s2d transpose fuses into the uint8 letterbox producer; measured
    # separately below so both accountings are visible)
    w1p = jnp.asarray(S.pack_w1(w1), jnp.bfloat16)
    w2p = jnp.asarray(S.pack_w2(w2), jnp.bfloat16)
    b1c = jnp.asarray(np.tile(b1, 4).reshape(-1, 1))
    b2c = jnp.asarray(b2.reshape(-1, 1))
    planes = jax.block_until_ready(jax.jit(S.s4d_planes)(x))
    kern_m = jax.jit(lambda p, *w: S.stem_planes(p, *w).mean())
    kern = lambda p: kern_m(p, w1p, b1c, w2p, b2c)
    dt_kern = timeit(kern, planes, steps=args.steps)

    # s2d transpose cost when NOT fused into a producer (upper bound on
    # the layout tax the kernel path pays end-to-end)
    s2d = jax.jit(lambda x: S.s4d_planes(x).mean())
    dt_s2d = timeit(s2d, x, steps=args.steps)

    # numeric check at this batch (device): max|diff| via in-jit reduce
    diff = jax.jit(lambda x, p, *w: jnp.max(jnp.abs(
        xla_stem(x, w[0], w[1], w[2], w[3]).astype(jnp.float32) -
        S.stem_planes(p, w[4], w[5], w[6], w[7])
        .transpose(0, 1, 3, 2).astype(jnp.float32))))(
        x, planes, w1, b1, w2, b2, w1p, b1c, w2p, b2c)
    print(json.dumps({
        "batch": b,
        "xla_stem_ms": round(dt_xla * 1e3, 3),
        "pallas_stem_ms": round(dt_kern * 1e3, 3),
        "s2d_layout_ms_unfused": round(dt_s2d * 1e3, 3),
        "speedup_vs_xla": round(dt_xla / dt_kern, 3),
        "max_abs_diff": float(np.asarray(diff)),
    }))


if __name__ == "__main__":
    main()
