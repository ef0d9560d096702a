"""VOD (uploaded footage) analysis path: mp4 -> cv2 source -> batched detect
-> tracking under the "video" day folder, with analysis progress reporting
(reference clearcam.py:425-438 + /analyse-footage flow)."""
import numpy as np
import pytest

from clearcam_tpu.runtime.nvr import NVR
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.utils.db import KVStore


class LooseColorDetector:
    """Color-keyed detector tolerant of video compression."""

    def detect_many(self, frames):
        out = []
        for f in frames:
            mask = (np.abs(f.astype(int) - np.array([40, 180, 240])).sum(-1) < 120)
            ys, xs = np.where(mask)
            if len(xs) < 50:
                out.append(np.zeros((0, 6)))
                continue
            out.append(np.array(
                [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1, 0.9, 0.0]]))
        return out


def write_test_video(path, n_frames=60, w=320, h=240):
    import cv2
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    assert vw.isOpened()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 40, (h, w, 3), np.uint8)
    for t in range(n_frames):
        f = base.copy()
        x = 10 + t * 3
        f[60:180, x:x + 100] = (40, 180, 240)
        vw.write(f)
    vw.release()


def test_vod_analysis_end_to_end(tmp_path):
    video = tmp_path / "data" / "cameras" / "footage.mp4"
    video.parent.mkdir(parents=True)
    write_test_video(video)

    db = KVStore(tmp_path / "kv.db")
    db.run_put("links", "clipcam", str(video))
    nvr = NVR(db, tmp_path / "data", GlobalSettings(),
              detector=LooseColorDetector())
    nvr.run(max_ticks=80)
    cam = nvr.cams["clipcam"]
    nvr.stop()

    # analysis progress hit 100 once the file was consumed
    prog = db.run_get("analysis_prog", "clipcam")
    assert isinstance(prog, dict) and prog.get("Tracking") == 100
    # tracked object was counted
    assert cam.counter.get_counts()[0].get(0, 0) >= 1
    # crops saved under the "video" day folder
    crops = list((tmp_path / "data" / "cameras" / "clipcam" / "objects"
                  / "video").glob("*.jpg"))
    assert crops
