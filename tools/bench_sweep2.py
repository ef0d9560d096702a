"""Sweep 2: scalar-output ablations (tunnel readback polluted sweep 1) +
larger batches. Every jitted fn reduces to a scalar so the queue-drain sync
moves 4 bytes, not megabytes."""
import functools
import time

import numpy as np


def timed(fn, args, batch, n_steps=20, reps=3):
    np.asarray(fn(*args))
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        out = None
        for _ in range(n_steps):
            out = fn(*args)
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

    def report(name, fps):
        print(f"{name:40s} {fps:8.0f} fps  ({fps/30:.1f} streams)", flush=True)

    # full pipeline, bigger batches (output already small: [B,300,6])
    for batch in (256,):
        frames = rng.integers(0, 255, (batch, 1080, 1920, 3), np.uint8)
        x = jax.device_put(frames)
        det = jax.jit(functools.partial(yolov9.detect, size="t", res=640,
                                        compute_dtype=jnp.bfloat16))
        report(f"full_b{batch}", timed(det, (params, x), batch))
        del x

    B = 128
    frames = rng.integers(0, 255, (B, 1080, 1920, 3), np.uint8)
    x = jax.device_put(frames)
    x640 = jnp.asarray(
        rng.uniform(0, 1, (B, 640, 640, 3)).astype(np.float32)).astype(jnp.bfloat16)
    x640 = jax.device_put(x640)

    lb = jax.jit(lambda f: image_ops.letterbox(
        f, 640, bgr_to_rgb=True, dtype=jnp.bfloat16).sum())
    report(f"letterbox_scalar_b{B}", timed(lb, (x,), B))

    fwd = jax.jit(lambda p, f: yolov9.forward_raw(p, f, "t").sum())
    report(f"forward_scalar_b{B}", timed(fwd, (params, x640), B))

    fp = jax.jit(lambda p, f: yolo_postprocess(
        yolov9.forward_raw(p, f, "t"), 300, 0.25, 0.45).sum())
    report(f"forward_nms_scalar_b{B}", timed(fp, (params, x640), B))

    full_sc = jax.jit(lambda p, f: yolov9.detect(
        p, f, size="t", res=640, compute_dtype=jnp.bfloat16).sum())
    report(f"full_scalar_b{B}", timed(full_sc, (params, x), B))


if __name__ == "__main__":
    main()
