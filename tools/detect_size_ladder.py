"""Detect throughput across the YOLOv9 size family (t/s/m/c/e) — the
reference's model_size setting (clearcam.py:45 maps nano..large -> t..e)
as a measured ladder on the real chip, bench.py methodology (queue-drain,
best-of-reps, bf16, fused uint8 1080p -> letterbox640 -> NMS graph).

    PYTHONPATH=/root/repo:/root/.axon_site python tools/detect_size_ladder.py \
        [--sizes t,s,m,c,e] [--batch 128] [--res 640]
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="t,s,m,c,e")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--res", type=int, default=640)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from clearcam_tpu.models import yolov9

    print(f"# backend {jax.default_backend()}, batch {args.batch}, "
          f"res {args.res}, bf16", flush=True)
    frames = np.random.default_rng(0).integers(
        0, 255, (args.batch, 1080, 1920, 3), np.uint8)
    x = jax.device_put(frames)

    for size in args.sizes.split(","):
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                              yolov9.init_params(size, seed=0))
        det = jax.jit(functools.partial(yolov9.detect, size=size,
                                        res=args.res,
                                        compute_dtype=jnp.bfloat16))
        np.asarray(det(params, x))                     # compile + warm
        best = 0.0
        for _ in range(args.reps):
            t0 = time.time()
            out = None
            for _ in range(args.steps):
                out = det(params, x)
            np.asarray(out)
            best = max(best, args.steps * args.batch / (time.time() - t0))
        n_par = sum(int(np.prod(v.shape)) for v in params.values())
        print(json.dumps({"size": size, "params_m": round(n_par / 1e6, 1),
                          "detect_fps": round(best, 1),
                          "streams_at_30fps": round(best / 30.0, 1)}),
              flush=True)
        del params
        jax.clear_caches()


if __name__ == "__main__":
    main()
