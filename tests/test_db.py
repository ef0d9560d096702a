"""KV store semantics + concurrency (reference test style, test/test_db.py:
put/get/delete, replace vs auto-id, id-keyed rows, dict folding, then a
multi-thread hammer asserting type stability)."""
import threading

import numpy as np
import pytest

from clearcam_tpu.utils.db import KVStore


@pytest.fixture
def db(tmp_path):
    return KVStore(tmp_path / "kv.db")


def test_put_get_roundtrip(db):
    db.run_put("links", "cam1", "rtsp://x")
    assert db.run_get("links", "cam1") == "rtsp://x"
    assert db.run_get("links") == {"cam1": "rtsp://x"}


def test_replace_semantics(db):
    db.run_put("settings", "cam", {"a": 1})
    db.run_put("settings", "cam", {"a": 2})
    assert db.run_get("settings", "cam") == {"a": 2}


def test_id_keyed_rows_fold(db):
    db.run_put("alerts", "cam", {"w": 1}, id="u1")
    db.run_put("alerts", "cam", {"w": 2}, id="u2")
    got = db.run_get("alerts", "cam")
    assert got == {"u1": {"w": 1}, "u2": {"w": 2}}
    assert db.run_get("alerts", "cam", id="u1") == {"w": 1}
    # full-table read folds the same way
    assert db.run_get("alerts") == {"cam": {"u1": {"w": 1}, "u2": {"w": 2}}}


def test_auto_id_no_replace(db):
    _, id1 = db.run_put("t", "k", "a", replace=False)
    _, id2 = db.run_put("t", "k", "b", replace=False)
    assert id1 != id2
    got = db.run_get("t", "k")
    assert set(got.values()) == {"a", "b"}


def test_delete(db):
    db.run_put("links", "cam", "url")
    db.run_delete("links", "cam")
    assert db.run_get("links", "cam") == {}
    db.run_put("alerts", "cam", 1, id="x")
    db.run_put("alerts", "cam", 2, id="y")
    db.run_delete("alerts", "cam", id="x")
    assert db.run_get("alerts", "cam") == {"y": 2}


def test_missing_table_returns_empty(db):
    assert db.run_get("nope") == {}
    assert db.run_get("nope", "k") == {}


def test_none_values_skipped_in_full_read(db):
    db.run_put("t", "a", None)
    db.run_put("t", "b", 5)
    assert db.run_get("t") == {"b": 5}


def test_pickles_arbitrary_objects(db):
    from clearcam_tpu.runtime.counters import RollingClassCounter
    c = RollingClassCounter(window_seconds=30, max=2, classes={0, 1}, cam_name="c")
    c.add(0)
    db.run_put("alerts", "c", c, id="u")
    back = db.run_get("alerts", "c", id="u")
    assert back.max == 2 and back.classes == {0, 1}
    assert len(back.data[0]) == 1


def test_thread_hammer(db):
    """100 writes x 3 threads across tables; per-table value types stay
    consistent (reference test_db.py:5-73)."""
    errors = []

    def worker(tid):
        try:
            for i in range(100):
                db.run_put("links", f"cam{tid}", f"url{i}")
                db.run_put("counters", f"cam{tid}", {"n": i})
                got = db.run_get("links", f"cam{tid}")
                assert isinstance(got, str)
                got = db.run_get("counters", f"cam{tid}")
                assert isinstance(got, dict)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
