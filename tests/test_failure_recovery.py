"""Failure detection/recovery semantics (SURVEY §5): detector errors are
isolated per tick, flaky sources don't kill pumps, VOD end stops cleanly."""
import time

import numpy as np
import pytest

from clearcam_tpu.runtime.ingest import FramePump, FrameSlot, SyntheticSource
from clearcam_tpu.runtime.nvr import NVR
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.utils.db import KVStore


class ExplodingDetector:
    def __init__(self, explode_first_n=2):
        self.calls = 0

    def detect_many(self, frames):
        self.calls += 1
        if self.calls <= 2:
            raise RuntimeError("device hiccup")
        return [np.zeros((0, 6)) for _ in frames]


def test_detector_errors_do_not_kill_loop(tmp_path):
    db = KVStore(tmp_path / "kv.db")
    db.run_put("links", "cam1", "synthetic://320x240")
    det = ExplodingDetector()
    nvr = NVR(db, tmp_path / "data", GlobalSettings(), detector=det)
    nvr.run(max_ticks=30, tick_sleep=0.01)
    nvr.stop()
    assert det.calls > 2   # loop survived the failing calls and kept going
    from clearcam_tpu.runtime import metrics
    assert metrics.snapshot()["counters"].get("detect_errors", 0) >= 2


class FlakySource(SyntheticSource):
    """Raises on every 3rd read (simulates pipe hiccups)."""

    def read(self):
        if self.t % 3 == 2:
            self.t += 1
            raise IOError("pipe burp")
        return super().read()


def test_pump_survives_flaky_source():
    slot = FrameSlot()
    src = FlakySource(64, 48, fps=1000)
    pump = FramePump("flaky", src, slot)
    pump.start()
    deadline = time.time() + 10
    frame, num = None, -1
    while time.time() < deadline:
        frame, num = slot.snapshot()
        if num >= 5:
            break
        time.sleep(0.05)
    pump.stop()
    assert num >= 5, "pump did not keep producing through errors"


def test_vod_pump_stops_at_end():
    slot = FrameSlot()
    src = SyntheticSource(32, 24, n_frames=5, fps=1000)
    pump = FramePump("vod", src, slot)
    pump.start()
    pump.join(timeout=10)
    assert pump.ended
    _, num = slot.snapshot()
    assert num == 4
