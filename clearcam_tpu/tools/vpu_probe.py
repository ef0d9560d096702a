"""Measure raw VPU FMA throughput (decides whether a VPU-based conv1 can
beat XLA's 2.89 ms — tools/stem_probe.py).

A conv-as-broadcast-FMA formulation needs ~5.66 GMAC for the YOLOv9-t
conv1 at batch 128; at the VPU's measured MAC rate that either beats the
MXU's 2.6%-fill 2.2 ms or it cannot — this probe settles which, for ~30
lines, before any kernel is built.

The kernel runs ITERS scalar-broadcast FMAs over a [ROWS, 128] f32/bf16
VMEM tile with a data dependence chain broken every UNROLL steps (so the
compiler cannot collapse the loop but ILP is available).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python -m clearcam_tpu.tools.vpu_probe
"""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # 64 f32 vregs
ITERS = 32768       # FMA passes over the tile (4.3 GMAC/call — must dwarf
                    # the ~1-2 ms per-dispatch overhead through the tunnel)
UNROLL = 8


def _kernel(x_ref, o_ref, *, dtype):
    x = x_ref[:]

    def body(i, accs):
        # UNROLL independent chains; each step: acc = acc * c + x (one FMA).
        # c is a compile-time splat (Mosaic cannot legalize runtime scalar
        # bf16 arithmetic: arith.mulf on bf16 scalars fails to lower)
        return tuple(a * jnp.asarray(0.875 + 0.01 * j, dtype) + x
                     for j, a in enumerate(accs))

    accs = tuple(jnp.zeros(x.shape, dtype) + j for j in range(UNROLL))
    accs = jax.lax.fori_loop(0, ITERS // UNROLL, body, accs)
    o_ref[:] = functools.reduce(lambda a, b: a + b, accs).astype(o_ref.dtype)


def measure(dtype, steps=30):
    x = jnp.ones((ROWS, 128), dtype)
    fn = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x).astype(jnp.float32).mean())
    np.asarray(fn(x))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(x)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / steps
    macs = ROWS * 128 * ITERS
    return macs / dt


def main():
    res = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        res[f"vpu_{name}_tmacs"] = round(measure(dt) / 1e12, 3)
    # context: conv1 (3->16 s2) at batch 128 needs 5.66 GMAC
    res["conv1_ms_at_measured_bf16_rate"] = round(
        5.66e9 / (res["vpu_bf16_tmacs"] * 1e12) * 1e3, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
