"""CLIP image-tower latency vs batch size — the reference's
test/test_clip_speed.py:8-15 as a CLI (it measured TinyJit s/image for
bs 1..128 after 3 warmups; here the tower is one jitted XLA program and
timing uses queue-drain so the axon tunnel's async dispatch doesn't skew
device time — see CLAUDE.md gotchas).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site \
        python -m clearcam_tpu.tools.clip_bench [--batches 1,8,32,128]

Random weights (throughput depends on shapes, not values); drop the
published OpenCLIP safetensors in weights/ and pass --weights to measure
with real parameters (identical timings).
"""
from __future__ import annotations

import argparse
import functools
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,16,64,128")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--weights", default=None,
                    help="OpenCLIP safetensors (random init when absent)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import clip

    if args.weights:
        from ..io import safetensors as st
        params = clip.convert_state_dict(st.load(args.weights))
    else:
        params = clip.init_params(seed=0)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    fn = jax.jit(functools.partial(clip.encode_image, normalize=True))

    print(f"# backend {jax.default_backend()}, ViT-L/14 image tower, bf16")
    for bs in (int(b) for b in args.batches.split(",")):
        x = jax.device_put(jnp.asarray(np.random.default_rng(0).integers(
            0, 255, (bs, 224, 224, 3), np.uint8)))   # raw bytes like the host
        np.asarray(fn(params, x))          # compile + sync
        t0 = time.perf_counter()
        out = None
        for _ in range(args.steps):
            out = fn(params, x)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({"batch": bs, "s_per_image": round(dt / bs, 5),
                          "images_per_s": round(bs / dt, 1)}))


if __name__ == "__main__":
    main()
