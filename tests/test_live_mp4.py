"""Air-gapped live video: GET /live.mp4 tails the rolling HLS segments
into a progressive fMP4 stream (round-4 VERDICT #4). Segments are synthetic
TS files (tests/test_remux.py's muxer — no ffmpeg in this sandbox); a writer
thread drops new ones while the client reads, proving fragments stream
incrementally with the join-near-live seed."""
import http.client
import threading
import time

import pytest

from test_remux import make_segment, walk_boxes


@pytest.fixture()
def live_server(tmp_path):
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore

    day = time.strftime("%Y-%m-%d")
    seg_dir = tmp_path / "cameras" / "gate" / "streams" / day
    seg_dir.mkdir(parents=True)
    ctx = AppContext(KVStore(tmp_path / "kv.db"), tmp_path)
    server = serve(ctx, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_address[1], seg_dir
    server.shutdown()


def _read_stream(port, path, min_bytes, timeout=30.0):
    """Read a progressive response until min_bytes or stream end."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path)
    resp = conn.getresponse()
    assert resp.status == 200, resp.status
    assert resp.headers["Content-Type"] == "video/mp4"
    buf = b""
    t0 = time.time()
    while len(buf) < min_bytes and time.time() - t0 < timeout:
        chunk = resp.read(4096)
        if not chunk:
            break
        buf += chunk
    conn.close()
    return buf


def test_live_mp4_streams_incrementally(live_server):
    port, seg_dir = live_server
    # two complete segments pre-exist (third makes both "complete")
    for i in range(3):
        (seg_dir / f"stream_{i:06d}.ts").write_bytes(
            make_segment(n_frames=6, t0=i * 18000)[0])

    stop = threading.Event()

    def writer():
        i = 3
        while not stop.is_set() and i < 12:
            (seg_dir / f"stream_{i:06d}.ts").write_bytes(
                make_segment(n_frames=6, t0=i * 18000)[0])
            i += 1
            time.sleep(0.3)

    w = threading.Thread(target=writer, daemon=True)
    w.start()
    try:
        # read to stream end (the recorder idles out 3 s after the writer
        # stops): init (ftyp+moov) + a fragment per newly-landed segment
        buf = _read_stream(port, "/live.mp4?cam=gate&idle_timeout=3", 10 ** 9)
    finally:
        stop.set()
        w.join()
    assert buf[4:8] == b"ftyp"
    boxes = walk_boxes(buf)
    kinds = [k for k, _ in boxes]
    assert kinds.count(b"moof") >= 2, kinds   # live fragments kept arriving
    assert b"mdat" in kinds


def test_live_mp4_joins_near_live(live_server):
    """A client arriving late must not receive the whole history: only the
    most recent complete segment seeds the stream."""
    port, seg_dir = live_server
    for i in range(10):
        (seg_dir / f"stream_{i:06d}.ts").write_bytes(
            make_segment(n_frames=6, t0=i * 18000)[0])
    buf = _read_stream(port, "/live.mp4?cam=gate&idle_timeout=1", 10 ** 9,
                       timeout=15.0)
    kinds = [k for k, _ in walk_boxes(buf)]
    # 9 complete segments of history, but only ~1 seed fragment streams
    assert 1 <= kinds.count(b"moof") <= 2, kinds


def test_live_mp4_no_recording_404(live_server):
    port, _ = live_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/live.mp4?cam=nosuch&wait=0.3")
    assert conn.getresponse().status == 404
    conn.close()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/live.mp4")
    assert conn.getresponse().status == 400
    conn.close()


def test_live_mp4_day_rollover(live_server):
    """Midnight rollover: the previous day's tail segments are complete the
    moment the new day directory has a segment — they must stream (not be
    silently dropped), and the new day must begin without waiting for a
    second segment."""
    port, seg_dir = live_server
    prev_dir = seg_dir.parent / "2000-01-01"       # sorts before today
    prev_dir.mkdir()
    for i in range(3):
        (prev_dir / f"stream_{i:06d}.ts").write_bytes(
            make_segment(n_frames=6, t0=i * 18000)[0])
    # new day exists with ONE still-mid-write segment: the old fix streamed
    # nothing here (needed two new-day segments) and never revisited the
    # previous day's final segment
    (seg_dir / "stream_000000.ts").write_bytes(
        make_segment(n_frames=6, t0=3 * 18000)[0])

    buf = _read_stream(port, "/live.mp4?cam=gate&idle_timeout=2", 10 ** 9)
    assert buf[4:8] == b"ftyp"
    kinds = [k for k, _ in walk_boxes(buf)]
    # join-near-live seeds everything but the last complete segment as
    # history: at least the previous day's FINAL segment streams now
    assert kinds.count(b"moof") >= 1, kinds
