"""Alert counter + zone unit tests (reference behavior, clearcam.py:47-103,
647-665)."""
import time

import numpy as np
import pytest

from clearcam_tpu.runtime.counters import RollingClassCounter
from clearcam_tpu.runtime.zones import (box_outside_zone, boxes_outside_zone,
                                        points_in_polygon)


def test_counter_window_prune():
    c = RollingClassCounter(window_seconds=10, max=3)
    now = 1000.0
    c.add(0, now - 20)   # outside window
    c.add(0, now - 5)
    c.add(0, now - 1)
    counts, maxed = c.get_counts(now)
    assert counts == {0: 2}
    assert not maxed


def test_counter_max_reached():
    c = RollingClassCounter(window_seconds=60, max=2)
    now = 1000.0
    c.add(1, now - 2)
    c.add(1, now - 1)
    counts, maxed = c.get_counts(now)
    assert maxed and counts[1] == 2


def test_counter_class_filter():
    c = RollingClassCounter(window_seconds=60, classes={0, 2})
    c.add(1, 10.0)
    assert c.get_counts(11.0)[0] == {}


def test_counter_default_window_depends_on_notif():
    c = RollingClassCounter()
    assert c._window() == 60
    c.is_notif = False
    assert c._window() == 1


def test_counter_reset():
    c = RollingClassCounter(window_seconds=60)
    c.add(0, 1.0)
    c.reset_counts()
    assert c.get_counts(2.0)[0] == {}
    assert c.reset


def test_schedule_gate():
    c = RollingClassCounter(window_seconds=60,
                            sched=[[3600, 7200], *[True] * 7])
    lt = time.struct_time((2026, 8, 16, 1, 30, 0, 5, 228, 0))  # 01:30, saturday
    assert c.is_active(localtime=lt)
    lt = time.struct_time((2026, 8, 16, 3, 0, 0, 5, 228, 0))   # 03:00 > end
    assert not c.is_active(localtime=lt)
    # weekday disabled
    c2 = RollingClassCounter(sched=[[0, 86399], *[False] * 7])
    assert not c2.is_active(localtime=lt)
    # alerts globally off
    assert not c.is_active(alerts_enabled=False)


def test_point_in_polygon_square():
    poly = np.array([[0, 0], [10, 0], [10, 10], [0, 10.0]])
    pts = np.array([[5, 5], [15, 5], [-1, -1.0]])
    inside = points_in_polygon(pts, poly)
    assert inside.tolist() == [True, False, False]


def test_box_zone_filtering():
    poly = np.array([[0.0, 0.0], [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])  # normalized
    hw = (100.0, 100.0)
    inside_box = np.array([10.0, 10, 30, 30])
    outside_box = np.array([60.0, 60, 90, 90])
    assert not box_outside_zone(inside_box, poly, hw)
    assert box_outside_zone(outside_box, poly, hw)
    # inversion flag flips the meaning
    assert box_outside_zone(inside_box, poly, hw, invert=True)
    # batched agrees with scalar
    both = np.stack([inside_box, outside_box])
    np.testing.assert_array_equal(boxes_outside_zone(both, poly, hw),
                                  [False, True])


def test_async_file_writer_roundtrip(tmp_path):
    """Crops land on disk after flush; the then-callback fires post-write;
    a saturated queue drops instead of blocking the caller."""
    from clearcam_tpu.runtime.fswriter import AsyncFileWriter

    w = AsyncFileWriter(maxsize=4)
    seen = []
    img = np.full((8, 8, 3), 50, np.uint8)
    assert w.submit(tmp_path / "deep" / "dir" / "a.jpg", img, then=seen.append)
    w.flush()
    assert (tmp_path / "deep" / "dir" / "a.jpg").exists()
    assert seen == [tmp_path / "deep" / "dir" / "a.jpg"]
    # storage-reap resilience: cached dir deleted -> write retries mkdir
    import shutil
    shutil.rmtree(tmp_path / "deep")
    assert w.submit(tmp_path / "deep" / "dir" / "b.jpg", img)
    w.flush()
    assert (tmp_path / "deep" / "dir" / "b.jpg").exists()
    w.stop()


def test_shared_frame_pump_paces_sources():
    """One thread pumps many synthetic sources at their own fps into their
    slots; remove() detaches a camera."""
    import time as _t

    from clearcam_tpu.runtime.ingest import (FrameSlot, SharedFramePump,
                                             SyntheticSource)

    pump = SharedFramePump()
    slots = {i: FrameSlot() for i in range(4)}
    for i in range(4):
        pump.add(f"s{i}", SyntheticSource(64, 48, fps=50), slots[i])
    deadline = _t.time() + 5
    while _t.time() < deadline and any(
            s.snapshot()[0] is None for s in slots.values()):
        _t.sleep(0.02)
    nums = {}
    for i, s in enumerate(slots.values()):
        frame, num = s.snapshot()
        assert frame is not None and frame.shape == (48, 64, 3)
        nums[i] = num
    pump.remove("s0")
    _t.sleep(0.3)
    f0, n0 = slots[0].snapshot()
    _t.sleep(0.3)
    assert slots[0].snapshot()[1] == n0          # detached: no new frames
    assert slots[1].snapshot()[1] > nums[1]      # others keep pumping
    pump.stop()
