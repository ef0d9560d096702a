"""MFU exploration sweep on the real TPU: batch sizes + stage ablations.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_sweep.py
Prints one line per config: name, fps (frames/s device-side, queue-drain).
"""
import functools
import time

import numpy as np


def timed(det, params, x, batch, n_steps=20, reps=3):
    np.asarray(det(params, x))  # compile + warm
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        out = None
        for _ in range(n_steps):
            out = det(params, x)
        np.asarray(out)
        best = max(best, n_steps * batch / (time.time() - t0))
    return best


def main():
    import jax
    import jax.numpy as jnp
    from clearcam_tpu.models import yolov9
    from clearcam_tpu.ops import image as image_ops
    from clearcam_tpu.ops.nms import yolo_postprocess

    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          yolov9.init_params("t", seed=0))
    rng = np.random.default_rng(0)

    results = {}

    def report(name, fps):
        results[name] = fps
        print(f"{name:40s} {fps:8.0f} fps  ({fps/30:.1f} streams)", flush=True)

    # full pipeline at several batch sizes
    for batch in (32, 64, 128):
        frames = rng.integers(0, 255, (batch, 1080, 1920, 3), np.uint8)
        x = jax.device_put(frames)
        det = jax.jit(functools.partial(yolov9.detect, size="t", res=640,
                                        compute_dtype=jnp.bfloat16))
        report(f"full_b{batch}", timed(det, params, x, batch))

    # ablations at batch 32
    batch = 32
    frames = rng.integers(0, 255, (batch, 1080, 1920, 3), np.uint8)
    x = jax.device_put(frames)

    # letterbox only
    lb = jax.jit(lambda p, f: image_ops.letterbox(f, 640, bgr_to_rgb=True,
                                                  dtype=jnp.bfloat16))
    report("letterbox_only_b32", timed(lb, params, x, batch))

    # forward only (pre-letterboxed input)
    x640 = jax.device_put(
        rng.uniform(0, 1, (batch, 640, 640, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fwd = jax.jit(functools.partial(yolov9.forward_raw, size="t"))
    report("forward_only_b32", timed(fwd, params, x640, batch))

    # forward + postprocess (no letterbox, no box rescale)
    fp = jax.jit(lambda p, f: yolo_postprocess(
        yolov9.forward_raw(p, f, "t"), 300, 0.25, 0.45))
    report("forward_nms_b32", timed(fp, params, x640, batch))

    print({k: round(v) for k, v in results.items()})


if __name__ == "__main__":
    main()
