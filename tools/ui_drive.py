"""Dev harness: boot a fully-seeded live NVR server for driving the web UI
in a real browser (no TPU, no ffmpeg — synthetic cameras + a color-keyed
fake detector).

Usage:  python tools/ui_drive.py [--port 8821] [--data DIR]

Seeds two synthetic cameras, event-image galleries with crops for today and
yesterday, one alert, then runs the real NVR loop + HTTP server so every
mainview/cameraview interaction hits live code paths (reference behavior:
mainview.html + clearcam.py routes).
"""
from __future__ import annotations

import argparse
import shutil
import sys
import threading
import time
from datetime import date, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from clearcam_tpu.runtime.nvr import NVR  # noqa: E402
from clearcam_tpu.runtime.settings import GlobalSettings  # noqa: E402
from clearcam_tpu.server.http import AppContext, serve  # noqa: E402
from clearcam_tpu.utils.db import KVStore  # noqa: E402


class ColorKeyDetector:
    """Track the synthetic source's (40,180,240) box by color threshold
    (same fake as tests/test_nvr.py) so events/counters flow without a TPU."""

    def detect_many(self, frames):
        out = []
        for f in frames:
            mask = (np.abs(f.astype(int) - np.array([40, 180, 240])).sum(-1) < 30)
            ys, xs = np.where(mask)
            if len(xs) == 0:
                out.append(np.zeros((0, 6)))
                continue
            out.append(np.array(
                [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1, 0.9, 0.0]],
                np.float64))
        return out


def _jpg(path: Path, seed: int, size=(90, 160)):
    import cv2
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (*size, 3), np.uint8)
    cv2.putText(img, str(seed), (5, 40), cv2.FONT_HERSHEY_SIMPLEX, 1,
                (255, 255, 255), 2)
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img)


def seed(base: Path):
    """Event images (<ts>_notif.jpg) + crops (<ts>_<obj>_<cls>.jpg) for two
    days, plus a streams day dir, matching the layout the NVR writes
    (reference clearcam.py event/crop writers)."""
    today = date.today().isoformat()
    yday = (date.today() - timedelta(days=1)).isoformat()
    for cam in ("cam1", "cam2"):
        for day, base_ts in ((today, 1000), (yday, 2000)):
            for i in range(6):
                ts = base_ts + i * 60
                _jpg(base / "cameras" / cam / "event_images" / day
                     / f"{ts}_notif.jpg", ts)
                _jpg(base / "cameras" / cam / "objects" / day
                     / f"{ts}_{i}_0.jpg", ts, size=(48, 48))
            (base / "cameras" / cam / "streams" / day).mkdir(
                parents=True, exist_ok=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8821)
    ap.add_argument("--data", type=Path, default=Path("/tmp/ui_drive_data"))
    ap.add_argument("--fresh", action="store_true", help="wipe --data first")
    args = ap.parse_args(argv)

    if args.fresh and args.data.exists():
        shutil.rmtree(args.data)
    args.data.mkdir(parents=True, exist_ok=True)
    seed(args.data)

    db = KVStore(args.data / "cc_cache.db")
    db.run_put("links", "cam1", "synthetic://640x360")
    db.run_put("links", "cam2", "synthetic://640x360")
    settings = GlobalSettings()
    db.run_put("global_settings", "all", settings)

    nvr = NVR(db, args.data, settings, detector=ColorKeyDetector())
    ctx = AppContext(db, args.data, nvr=nvr, settings=settings)
    server = serve(ctx, port=args.port)
    print(f"serving http://127.0.0.1:{server.server_address[1]}  "
          f"data={args.data}", flush=True)

    t = threading.Thread(target=lambda: nvr.run(tick_sleep=0.05), daemon=True)
    t.start()
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        nvr.stop()
        server.shutdown()


if __name__ == "__main__":
    main()
