"""NVR server entry point: `python -m clearcam_tpu [--port 8080] [--data DIR]`.

Equivalent of the reference's `python3 clearcam.py` (clearcam.py:1418-1475):
loads persisted settings, builds the detector (and CLIP/face/Qwen when
enabled), starts the HTTP API + web UI on :8080, the storage manager, the
daily-restart scheduler, and runs the NVR loop forever.
"""
from __future__ import annotations

import argparse
import os
import socket
import threading
import time
from datetime import datetime
from pathlib import Path


def lan_ip() -> str:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.connect(("8.8.8.8", 80))
        return s.getsockname()[0]
    except Exception:
        return "127.0.0.1"
    finally:
        s.close()


def restart_all_cams(nvr) -> None:
    """Re-open every stream so recordings roll into a new day folder."""
    for name in list(nvr.cams):
        cam = nvr.cams[name]
        src = cam.src
        nvr.remove_cam(name)
        try:
            nvr.init_cam(name, src)
        except Exception as e:  # noqa: BLE001
            print(f"daily restart {name}: {e}")


def daily_restart(nvr, at=(0, 0)):
    """Re-open every stream at midnight so recordings roll into a new day
    folder (reference schedule_daily_restart, clearcam.py:1162-1176)."""
    while True:
        now = datetime.now()
        target = now.replace(hour=at[0], minute=at[1], second=0, microsecond=0)
        delta = (target - now).total_seconds()
        if delta <= 0:
            delta += 24 * 3600
        time.sleep(delta)
        restart_all_cams(nvr)


def build_meshes(n: int):
    """(detect_mesh, llm_mesh) over the first n devices, or (None, None).

    Two meshes, same chips, different layouts (SURVEY.md §2.3 "new" row):
    detection is activation-dominated so its batch data-parallels over all
    n ("data"=n); the Qwen summary language model is weight/KV-dominated so
    it tensor/expert-parallels over all n ("model"=n). XLA inserts the
    collectives over ICI from the shardings — no hand-written NCCL analogue
    (the reference is single-accelerator, clearcam.py:253,269-270).
    """
    if n <= 1:
        return None, None
    import jax
    from .parallel import mesh as pmesh
    avail = len(jax.devices())
    if avail < n:
        raise SystemExit(
            f"--mesh {n}: only {avail} device(s) visible; for CPU testing "
            f"set XLA_FLAGS=--xla_force_host_platform_device_count={n}")
    return pmesh.make_mesh(n, data=n), pmesh.make_mesh(n, data=1)


def build_detector(settings, weights_dir: Path, mesh=None):
    """YOLOv9 with published weights when present, random otherwise.

    Env knobs (the reference's HALF/DEV/BEAM equivalents, model.py:326-331,
    README.md:81-82): CLEARCAM_DTYPE=bf16|f32 (default bf16).
    """
    import os
    from .runtime.nvr import BatchDetector
    from .models import yolov9
    import jax.numpy as jnp
    path = weights_dir / f"yolov9-{settings.model_size}.safetensors"
    params = None
    if path.exists():
        from .io import safetensors as st
        params = yolov9.convert_state_dict(st.load(path))
        print(f"loaded {path}")
    else:
        print(f"weights not found at {path} — using random init (detections "
              "will be meaningless; drop the published safetensors there)")
    dtype = jnp.float32 if os.environ.get("CLEARCAM_DTYPE") == "f32" \
        else jnp.bfloat16
    return BatchDetector(settings.model_size, int(settings.model_res),
                         params=params, compute_dtype=dtype, mesh=mesh)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--data", type=Path, default=Path("data"))
    ap.add_argument("--weights", type=Path, default=Path("weights"))
    ap.add_argument("--cam_name", default="my_camera")
    ap.add_argument("--api-token", default=os.environ.get("CLEARCAM_API_TOKEN"),
                    help="require this token (x-api-token header or ?token=) "
                         "on every HTTP request")
    ap.add_argument("--no-detector", action="store_true",
                    help="run the server without a TPU detector (UI/API only)")
    ap.add_argument("--mesh", type=int,
                    default=int(os.environ.get("CLEARCAM_MESH", "0") or 0),
                    help="scale over the first N chips: detect batches "
                         "data-parallel over ICI, the Qwen summary engine "
                         "tensor-parallel (0/1 = single device)")
    args = ap.parse_args(argv)

    from .utils.db import KVStore
    from .runtime.settings import GlobalSettings
    from .runtime.nvr import NVR
    from .runtime.storage import StorageManager
    from .server.http import AppContext, serve

    db = KVStore(args.data / "cc_cache.db")
    stored = db.run_get("global_settings", "all")
    settings = stored if isinstance(stored, GlobalSettings) else GlobalSettings()
    if not isinstance(stored, GlobalSettings):
        db.run_put("global_settings", "all", settings)

    detect_mesh, llm_mesh = build_meshes(args.mesh)
    detector = None if args.no_detector else build_detector(
        settings, args.weights, mesh=detect_mesh)

    # always constructed (towers load lazily on init_*) so enabling CLIP or
    # faces later via /edit_settings works without a restart
    object_finder = None
    try:
        from .models.objects import ObjectFinder
        object_finder = ObjectFinder(base_dir=args.data / "cameras",
                                     weights_dir=args.weights)
        if settings.use_clip:
            object_finder.init_clip()
        if settings.use_face:
            object_finder.init_face()
    except Exception as e:  # noqa: BLE001
        print(f"object finder unavailable: {e}")

    def build_qwen(s):
        try:
            from .models.qwen3vl import Qwen3VL
            q = Qwen3VL(size=f"{s.qwen_size}B", res=(544, 960),
                        weights_dir=args.weights)
            print("prewarming Qwen")
            q.prewarm()
            print("DONE")
            return q
        except Exception as e:  # noqa: BLE001
            print(f"qwen unavailable: {e}")
            return None

    qwen = build_qwen(settings) if settings.use_qwen and settings.key else None

    nvr = NVR(db, args.data, settings, detector=detector,
              object_finder=object_finder, qwen=qwen, llm_mesh=llm_mesh)
    storage = StorageManager(args.data / "cameras")
    nvr.storage = storage

    def offload_detect(img_rgb):
        """Serve the iOS /yolo + /diff offload protocol with the NVR's model."""
        if detector is None:
            import numpy as np
            return np.zeros((0, 6), np.float32)
        return detector.detect_many([img_rgb[..., ::-1]])[0]  # expects BGR

    def offload_detect_many(imgs_rgb):
        """Batched offload: concurrent edge clients share ONE device call
        (OffloadBatcher coalesces requests at executor-drain time)."""
        if detector is None:
            import numpy as np
            return [np.zeros((0, 6), np.float32) for _ in imgs_rgb]
        return detector.detect_many([im[..., ::-1] for im in imgs_rgb])

    def on_settings_change(new):
        """Rebuild models live on /edit_settings (reference set_settings,
        clearcam.py:1243-1276): CLIP/face toggles, detector size/res, and the
        Qwen summary model on/off or size change."""
        nonlocal detector
        old = nvr.settings
        nvr.settings = new
        if object_finder is not None:
            (object_finder.init_clip if new.use_clip else object_finder.turn_off_clip)()
            (object_finder.init_face if new.use_face else object_finder.turn_off_face)()
        if detector is not None and (new.model_size != detector.size
                                     or int(new.model_res) != detector.res):
            detector = build_detector(new, args.weights, mesh=detect_mesh)
            nvr.detector = detector
        want_qwen = new.use_qwen and new.key
        if want_qwen and (nvr.qwen is None
                          or new.qwen_size != old.qwen_size):
            nvr.qwen = build_qwen(new)
        elif not want_qwen:
            nvr.qwen = None

    def make_gen():
        """POST /generate backend: text requests share the Qwen summary
        engine's slots (needs CLEARCAM_SUMMARY_SLOTS>0 and use_qwen)."""
        if nvr.qwen is None or nvr.summary_slots <= 0:
            return None
        from .serving import TextServing
        return TextServing(nvr.summary_engine(), nvr.qwen.tok)

    ctx = AppContext(db, args.data, nvr=nvr, object_finder=object_finder,
                     settings=settings, offload_detect=offload_detect,
                     offload_detect_many=offload_detect_many,
                     on_settings_change=on_settings_change,
                     api_token=args.api_token, gen=make_gen)
    storage.max_gb = ctx.max_gb
    storage.start()
    server = serve(ctx, port=args.port)
    if server:
        print(f"Serving at http://{lan_ip()}:{args.port}")
    threading.Thread(target=daily_restart, args=(nvr,), daemon=True).start()

    import signal

    def _graceful(signum, frame):
        print(f"signal {signum}: shutting down")
        nvr.running = False
        # the loop can be parked in a long device call (cold remote compile
        # runs minutes) — if it hasn't wound down in 20 s, exit hard rather
        # than ignore the operator's signal
        t = threading.Timer(20.0, lambda: os._exit(1))
        t.daemon = True
        t.start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)
    try:
        nvr.run()
    except KeyboardInterrupt:
        pass
    finally:
        nvr.stop()
        storage.stop()
        if server:
            server.shutdown()


if __name__ == "__main__":
    main()
