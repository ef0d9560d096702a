"""Storage manager policy: delete the oldest recording day of the largest
camera plus its sibling event/object/face day dirs (clearcam.py:1327-1381)."""
import time

import pytest

from clearcam_tpu.runtime.storage import (StorageManager, cleanup_once,
                                          dir_size_bytes, over_budget)


def make_day(cams_dir, cam, day, size=0):
    d = cams_dir / cam / "streams" / day
    d.mkdir(parents=True, exist_ok=True)
    (d / "stream_000001.ts").write_bytes(b"x" * size)
    for sib in ("event_images", "objects", "faces"):
        s = cams_dir / cam / sib / day
        s.mkdir(parents=True, exist_ok=True)
        (s / "10_1_0.jpg").write_bytes(b"j")
    return d


def test_cleanup_removes_oldest_day_of_largest_cam(tmp_path):
    cams = tmp_path / "cameras"
    old = make_day(cams, "big", "2026-08-10", size=1000)
    time.sleep(0.05)   # ctime ordering decides "oldest"
    make_day(cams, "big", "2026-08-11", size=1000)
    make_day(cams, "small", "2026-08-01", size=10)

    removed = cleanup_once(cams)
    assert removed == old
    assert not old.exists()
    # siblings of the removed day went with it; newer day untouched
    assert not (cams / "big" / "objects" / "2026-08-10").exists()
    assert (cams / "big" / "streams" / "2026-08-11").exists()
    # the small camera is untouched
    assert (cams / "small" / "streams" / "2026-08-01").exists()


def test_cleanup_drops_empty_camera(tmp_path):
    cams = tmp_path / "cameras"
    (cams / "ghost").mkdir(parents=True)
    removed = cleanup_once(cams)
    assert removed == cams / "ghost"
    assert not removed.exists()


def test_over_budget_and_manager(tmp_path):
    cams = tmp_path / "cameras"
    make_day(cams, "c", "2026-08-10", size=2000)
    assert dir_size_bytes(cams) > 2000
    assert over_budget(cams, max_gb=1e-9)      # tiny budget -> over
    assert not over_budget(cams, max_gb=1e6)
    mgr = StorageManager(cams, max_gb=1e-9, interval_s=1000)
    mgr.check()                                 # enforces once
    assert not (cams / "c" / "streams" / "2026-08-10").exists()
