"""HTTP API surface tests: spin up the real server on an ephemeral port and
drive the endpoints the web/mobile clients use (reference routes,
clearcam.py:680-1156, plus the /yolo + /diff offload protocol)."""
import json
import urllib.request

import numpy as np
import pytest

from clearcam_tpu.runtime.nvr import NVR
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.server.http import AppContext, serve
from clearcam_tpu.utils.db import KVStore


class EchoDetector:
    """Offload stub: one fixed detection regardless of frame."""

    def detect_many(self, frames):
        return [np.array([[1, 2, 3, 4, 0.9, 0.0]], np.float32) for _ in frames]


@pytest.fixture
def ctx(tmp_path):
    db = KVStore(tmp_path / "kv.db")
    nvr = NVR(db, tmp_path / "data", GlobalSettings(), detector=None)
    det = EchoDetector()
    c = AppContext(db, tmp_path / "data", nvr=nvr, settings=nvr.settings,
                   offload_detect=lambda img: det.detect_many([img])[0])
    return c


@pytest.fixture
def base(ctx):
    server = serve(ctx, port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}", ctx
    server.shutdown()


def get(url, raw=False):
    with urllib.request.urlopen(url, timeout=10) as r:
        body = r.read()
        return body if raw else (json.loads(body) if body else None)


def post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers=headers or {})
    return urllib.request.urlopen(req, timeout=10)


def test_camera_crud_and_settings(base):
    url, ctx = base
    # add_camera redirects to /
    req = urllib.request.Request(f"{url}/add_camera?cam_name=c1&src=synthetic://64x48")
    with urllib.request.urlopen(req) as r:
        assert r.url.endswith("/")
    assert "c1" in get(f"{url}/list_cameras")
    # per-camera settings: zone polygon + threshold
    coords = json.dumps([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]])
    get(f"{url}/edit_settings?cam=c1&coords={urllib.parse.quote(coords)}"
        f"&outside=false&threshold=0.4")
    s = get(f"{url}/get_settings?cam=c1")
    assert len(s["coords"]) == 3 and s["threshold"] == 0.4
    # counts endpoints auto-create a counter
    assert get(f"{url}/get_counts?cam=c1") == []
    get(f"{url}/reset_counts?cam=c1")
    # delete
    get(f"{url}/delete_camera?cam_name=c1")
    assert "c1" not in get(f"{url}/list_cameras")


def test_alert_crud(base):
    url, _ = base
    get(f"{url}/edit_alert?cam=c1&max=2&class_ids=0,2&window=30")
    alerts = get(f"{url}/get_alerts?cam=c1")
    assert len(alerts) == 1
    a = alerts[0]
    assert a["max"] == 2 and a["window"] == 30 and set(a["classes"]) == {0, 2}
    # edit flags
    get(f"{url}/edit_alert?cam=c1&id={a['id']}&is_on=false&zone=false")
    a2 = get(f"{url}/get_alerts?cam=c1")[0]
    assert a2["is_on"] is False and a2["zone"] is False
    # CLIP-description alert
    get(f"{url}/edit_alert?cam=c1&max=1&class_ids=0&desc=a%20red%20car&threshold=35")
    descs = [x["desc"] for x in get(f"{url}/get_alerts?cam=c1")]
    assert "a red car" in descs
    thr = [x["threshold"] for x in get(f"{url}/get_alerts?cam=c1") if x["desc"]]
    assert thr[0] == pytest.approx(0.35)
    # delete (id with no flags)
    get(f"{url}/edit_alert?cam=c1&id={a['id']}")
    assert all(x["id"] != a["id"] for x in get(f"{url}/get_alerts?cam=c1"))


def test_global_settings_secret_masking(base):
    url, ctx = base
    body = json.dumps({"use_clip": False, "use_face": False, "model_size": "t",
                       "model_res": 640, "userID": "secret-user",
                       "key": "secret-key", "use_qwen": False,
                       "qwen_size": 2}).encode()
    post(f"{url}/edit_settings", body)
    s = get(f"{url}/get_global_settings")
    assert s["userID"] is True and s["key"] is True      # masked
    assert ctx.settings.userID == "secret-user"          # stored
    # True keeps the stored secret
    body = json.dumps({"userID": True, "key": True, "model_size": "s",
                       "model_res": 640}).encode()
    post(f"{url}/edit_settings", body)
    assert ctx.settings.userID == "secret-user"
    assert ctx.settings.model_size == "s"


def test_max_storage(base):
    url, _ = base
    assert get(f"{url}/get_max_storage")["max_gb"] == 256
    get(f"{url}/set_max_storage?max=64")
    assert get(f"{url}/get_max_storage")["max_gb"] == 64


def test_pages_and_static(base, tmp_path):
    url, ctx = base
    html = get(f"{url}/", raw=True).decode()
    assert "<title>clearcam</title>" in html
    cam_html = get(f"{url}/?cam=mycam&start=12", raw=True).decode()
    assert "mycam" in cam_html and "12.0" in cam_html
    # static file serving with content types
    d = ctx.base_dir / "cameras" / "mycam" / "streams" / "2026-08-16"
    d.mkdir(parents=True)
    (d / "stream.m3u8").write_text("#EXTM3U\n")
    body = get(f"{url}/mycam/streams/2026-08-16/stream.m3u8", raw=True)
    assert body.startswith(b"#EXTM3U")
    with pytest.raises(urllib.error.HTTPError):
        get(f"{url}/mycam/streams/2026-08-16/missing.ts")
    assert get(f"{url}/list_days") == ["2026-08-16"]


def test_event_thumbs_listing(base):
    url, ctx = base
    d = ctx.base_dir / "cameras" / "camx" / "event_images" / "2026-08-16"
    d.mkdir(parents=True)
    import numpy as np, cv2
    for ts in (10, 20):
        cv2.imwrite(str(d / f"{ts}_notif.jpg"), np.zeros((8, 8, 3), np.uint8))
    (ctx.base_dir / "cameras" / "camx" / "streams" / "2026-08-16").mkdir(parents=True)
    resp = json.loads(post(f"{url}/event_thumbs",
                           json.dumps({"cam": "camx"}).encode()).read())
    assert resp["count"] == 2
    assert resp["images"][0]["timestamp"] == 20  # newest first
    # pagination
    resp = json.loads(post(f"{url}/event_thumbs",
                           json.dumps({"cam": "camx", "start": 1,
                                       "count": 1}).encode()).read())
    assert resp["count"] == 1 and resp["images"][0]["timestamp"] == 10


def test_analyse_footage_chunked(base):
    url, ctx = base
    post(f"{url}/analyse-footage?filename=vid.mp4&chunk=0&total=2", b"aaaa")
    assert not (ctx.base_dir / "cameras" / "vid.mp4").exists()
    post(f"{url}/analyse-footage?filename=vid.mp4&chunk=1&total=2", b"bbbb")
    assert (ctx.base_dir / "cameras" / "vid.mp4").read_bytes() == b"aaaabbbb"


def test_offload_yolo_and_diff(base):
    url, _ = base
    frame = np.zeros(640 * 640 * 3, np.uint8)
    r = post(f"{url}/yolo", frame.tobytes())
    sid = r.headers["x-session-id"]
    rows = np.frombuffer(r.read(), np.float32).reshape(-1, 6)
    assert rows[0, 4] == pytest.approx(0.9)
    # sparse diff against the stored session frame
    patch = np.zeros(5, np.uint8)
    patch[:4] = np.frombuffer(np.int32(7).tobytes(), np.uint8)
    patch[4] = 255
    r2 = post(f"{url}/diff", patch.tobytes(), {"x-session-id": sid})
    rows2 = np.frombuffer(r2.read(), np.float32).reshape(-1, 6)
    assert rows2.shape == rows.shape
    # unknown session -> 409 (client falls back to full frame)
    with pytest.raises(urllib.error.HTTPError) as e:
        post(f"{url}/diff", patch.tobytes(), {"x-session-id": "nope"})
    assert e.value.code == 409


def test_detect_fps_setting_roundtrip(base):
    url, ctx = base
    get(f"{url}/edit_settings?cam=c1&threshold=0.4&detect_fps=5")
    s = get(f"{url}/get_settings?cam=c1")
    assert s["detect_fps"] == 5.0 and s["threshold"] == 0.4
    get(f"{url}/edit_settings?cam=c1&detect_fps=0")      # 0/blank clears
    s = get(f"{url}/get_settings?cam=c1")
    assert s["detect_fps"] is None


def test_snapshot_endpoint(base):
    """/snapshot serves the camera's latest frame as JPEG (air-gapped grid
    fallback); 404 before any frame or for unknown cameras."""
    url, ctx = base
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        get(f"{url}/snapshot?cam=nope")
    assert e.value.code == 404

    ctx.nvr.cams["live"] = type("C", (), {})()
    ctx.nvr.cams["live"].last_frame = np.full((8, 8, 3), 128, np.uint8)
    data = get(f"{url}/snapshot?cam=live", raw=True)
    assert data[:2] == b"\xff\xd8"          # JPEG magic
    del ctx.nvr.cams["live"]


def test_offload_batcher_coalesces_concurrent_requests():
    """Requests that arrive while the batch task is queued ride ONE
    detect_many call; every waiter gets its own rows; errors broadcast."""
    import threading
    import time
    from clearcam_tpu.runtime.nvr import DeviceExecutor
    from clearcam_tpu.server.http import OffloadBatcher

    calls = []

    def detect_many(imgs):
        calls.append(len(imgs))
        return [np.full((1, 6), i, np.float32) for i, _ in enumerate(imgs)]

    ex = DeviceExecutor()
    ex.loop_running = True                      # queue mode, manual drain
    batcher = OffloadBatcher(detect_many)
    results = {}

    def client(i):
        results[i] = batcher.infer(np.full((2, 2, 3), i, np.uint8), ex.submit)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    time.sleep(0.3)                             # all enqueue before any drain
    while any(t.is_alive() for t in threads):
        ex.drain_one()
        time.sleep(0.01)
    assert sum(calls) == 6
    assert len(calls) <= 2                      # coalesced (1 leader + stragglers)
    # each waiter got the row matching its own position in the batch
    for i, rows in results.items():
        assert rows.shape == (1, 6)

    # error broadcast: every concurrent waiter sees the exception
    def boom(imgs):
        raise RuntimeError("device gone")

    bad = OffloadBatcher(boom)
    errs = []

    def bad_client():
        try:
            bad.infer(np.zeros((2, 2, 3), np.uint8), ex.submit)
        except RuntimeError as e:
            errs.append(str(e))

    bts = [threading.Thread(target=bad_client) for _ in range(3)]
    for t in bts:
        t.start()
    time.sleep(0.2)
    while any(t.is_alive() for t in bts):
        ex.drain_one()
        time.sleep(0.01)
    assert errs == ["device gone"] * 3


def test_offload_batcher_inline_mode():
    """Without an NVR loop, ctx.submit runs inline: single-request batches."""
    from clearcam_tpu.server.http import OffloadBatcher

    batcher = OffloadBatcher(
        lambda imgs: [np.zeros((0, 6), np.float32) for _ in imgs])
    rows = batcher.infer(np.zeros((2, 2, 3), np.uint8), lambda fn, *a: fn(*a))
    assert rows.shape == (0, 6)


import urllib.parse  # noqa: E402  (used in test_camera_crud_and_settings)
import urllib.error  # noqa: E402


def test_range_requests_and_metrics(base):
    url, ctx = base
    d = ctx.base_dir / "cameras" / "rcam" / "streams" / "2026-08-16"
    d.mkdir(parents=True)
    (d / "clip.mp4").write_bytes(bytes(range(256)) * 4)
    req = urllib.request.Request(f"{url}/rcam/streams/2026-08-16/clip.mp4",
                                 headers={"Range": "bytes=10-19"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 206
        assert r.headers["Content-Range"] == "bytes 10-19/1024"
        assert r.read() == bytes(range(10, 20))
    # suffix range
    req = urllib.request.Request(f"{url}/rcam/streams/2026-08-16/clip.mp4",
                                 headers={"Range": "bytes=-4"})
    with urllib.request.urlopen(req) as r:
        assert r.read() == bytes(range(252, 256))
    # metrics endpoint
    m = get(f"{url}/metrics")
    assert "uptime_s" in m and "timers" in m


def test_path_traversal_blocked(base, tmp_path):
    url, ctx = base
    (ctx.base_dir / "cameras").mkdir(parents=True, exist_ok=True)
    secret = ctx.base_dir / "secret.txt"
    secret.write_text("no")
    for path in ("/..%2Fsecret.txt", "/c/../../secret.txt", "/../secret.txt"):
        with pytest.raises(urllib.error.HTTPError) as e:
            get(url + path, raw=True)
        assert e.value.code in (403, 404)


def test_alert_full_field_edit(base):
    """Editing an existing alert's classes/window/max/schedule in place
    (beyond the reference server, which only toggles booleans —
    clearcam.py:838-845)."""
    url, ctx = base
    sched = urllib.parse.quote(json.dumps([[0, 86400]] + [True] * 7))
    get(f"{url}/edit_alert?cam=c1&max=2&class_ids=0,2&sched={sched}")
    a = get(f"{url}/get_alerts?cam=c1")[0]
    assert a["classes"] == [0, 2] and a["max"] == 2
    new_sched = json.dumps([[3600, 7200], True, False, True, True, True,
                            False, False])
    get(f"{url}/edit_alert?cam=c1&id={a['id']}&class_ids=1,7&max=5"
        f"&window=120&sched={urllib.parse.quote(new_sched)}")
    b = get(f"{url}/get_alerts?cam=c1")[0]
    assert b["id"] == a["id"]
    assert b["classes"] == [1, 7] and b["max"] == 5 and b["window"] == 120
    assert b["sched"][0] == [3600, 7200] and b["sched"][2] is False
    # clearing the window falls back to auto
    get(f"{url}/edit_alert?cam=c1&id={a['id']}&window=")
    assert get(f"{url}/get_alerts?cam=c1")[0]["window"] is None


def _make_day(ctx, cam="dcam", day="2026-08-16", with_video=False):
    base_dir = ctx.base_dir / "cameras" / cam
    (base_dir / "streams" / day).mkdir(parents=True, exist_ok=True)
    (base_dir / "objects" / day).mkdir(parents=True, exist_ok=True)
    (base_dir / "objects" / day / "1.jpg").write_bytes(b"x")
    if with_video:
        import subprocess
        from clearcam_tpu.runtime.ingest import find_ffmpeg
        ff = find_ffmpeg()
        if ff is None:
            pytest.skip("ffmpeg unavailable")
        for i in range(2):
            subprocess.run(
                [ff, "-y", "-loglevel", "quiet", "-f", "lavfi", "-i",
                 f"color=c=red:s=64x64:d=0.4:r=10", "-c:v", "libx264",
                 "-pix_fmt", "yuv420p", "-f", "mpegts",
                 str(base_dir / "streams" / day / f"seg{i}.ts")], check=True)
    else:
        (base_dir / "streams" / day / "seg0.ts").write_bytes(b"notreal")
    return base_dir


def test_delete_day(base):
    url, ctx = base
    d = _make_day(ctx)
    get(f"{url}/delete_day?cam=dcam&day=2026-08-16")
    assert not (d / "streams" / "2026-08-16").exists()
    assert not (d / "objects" / "2026-08-16").exists()
    # invalid day / cam rejected
    for bad in ("/delete_day?cam=dcam&day=..", "/delete_day?cam=..&day=2026-08-16",
                "/delete_day?cam=dcam"):
        with pytest.raises(urllib.error.HTTPError) as e:
            get(url + bad)
        assert e.value.code == 400


def test_download_day(base):
    url, ctx = base
    _make_day(ctx, with_video=True)
    data = get(f"{url}/download_day?cam=dcam&day=2026-08-16", raw=True)
    assert len(data) > 1000 and b"ftyp" in data[:64]   # mp4 container magic
    with pytest.raises(urllib.error.HTTPError) as e:
        get(f"{url}/download_day?cam=dcam&day=1999-01-01", raw=True)
    assert e.value.code == 404


def test_error_with_non_ascii_message_returns_500(base):
    """Exceptions whose message contains non-ASCII (em-dashes in our error
    strings) must surface as a clean 500, not a dropped connection:
    send_error writes the message into a latin-1 header line."""
    url, ctx = base

    def boom(*a, **k):
        raise RuntimeError("broken — см. log")
    ctx.db.run_get, orig = boom, ctx.db.run_get
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            get(f"{url}/get_alerts?cam=c1")
        assert e.value.code == 500
    finally:
        ctx.db.run_get = orig


def test_metrics_prometheus_format(base):
    url, ctx = base
    from clearcam_tpu.runtime import metrics
    metrics.gauge("fps.gate", 29.9)
    metrics.count("frames", 3)
    body = get(f"{url}/metrics?format=prometheus", raw=True).decode()
    assert "clearcam_uptime_seconds" in body
    assert 'clearcam_fps{camera="gate"} 29.9' in body
    assert "clearcam_frames_total 3" in body or "clearcam_frames_total" in body
    # JSON stays default
    assert "uptime_s" in get(f"{url}/metrics")


def test_concurrent_request_hammer(base):
    """20 threads x mixed read/write routes: no 500s, consistent state
    afterwards (the reference's only concurrency test is a db hammer —
    this covers the HTTP layer + registry + alerts too)."""
    import threading

    url, ctx = base
    errors = []

    def worker(i):
        try:
            for j in range(10):
                get(f"{url}/add_camera?cam_name=h{i}&src=rtsp://x{j}",
                    raw=True)   # 302 -> HTML main page
                get(f"{url}/list_cameras")
                get(f"{url}/get_counts?cam=h{i}")
                get(f"{url}/edit_settings?cam=h{i}&threshold=0.{j+1}")
                get(f"{url}/get_settings?cam=h{i}")
                post(f"{url}/federation/register",
                     json.dumps({"host": f"http://10.0.0.{i}:8080",
                                 "cameras": [f"c{j}"]}).encode())
        except Exception as e:  # noqa: BLE001
            errors.append(f"{i}: {e}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    cams = get(f"{url}/list_cameras")
    assert all(f"h{i}" in cams for i in range(20))
    assert len(ctx.federation.peers) == 20


def test_api_token_auth(tmp_path):
    """Optional shared-secret auth (beyond the reference's open API): with a
    token configured every route requires it via header or ?token=."""
    db = KVStore(tmp_path / "kv.db")
    ctx = AppContext(db, tmp_path / "data", settings=GlobalSettings(),
                     api_token="s3cret")
    server = serve(ctx, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            get(f"{url}/list_cameras")
        assert e.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as e:
            get(f"{url}/list_cameras?token=wrong")
        assert e.value.code == 401
        assert get(f"{url}/list_cameras?token=s3cret") == {}
        req = urllib.request.Request(f"{url}/list_cameras",
                                     headers={"x-api-token": "s3cret"})
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200
        # POST routes are covered too
        req = urllib.request.Request(f"{url}/event_thumbs", data=b"{}",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 401
    finally:
        server.shutdown()


def test_healthz(base):
    """Liveness probe: ok/ready with zero cameras on a fresh server."""
    url, ctx = base
    h = get(f"{url}/healthz")
    assert h["ok"] is True and h["ready"] is True
    assert h["cameras"] == 0 and h["uptime_s"] >= 0
    assert isinstance(h["errors"], dict)
    assert h["serving_dead"] is False


def test_healthz_reports_dead_serving_engine(tmp_path):
    """A serving engine whose crash-recovery budget is exhausted flips
    ready -> false (engine._dead, serving/engine._fail_all); the probe must
    NOT materialize a lazily-constructed generator to find out."""
    class DeadEngine:
        _dead = True

    class Gen:
        submit = None          # looks materialized to AppContext.text_gen
        engine = DeadEngine()

    db = KVStore(tmp_path / "kv.db")
    c = AppContext(db, tmp_path / "data", settings=GlobalSettings(), gen=Gen())
    server = serve(c, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        h = get(f"{url}/healthz")
        assert h["serving_dead"] is True and h["ready"] is False
    finally:
        server.shutdown()

    # unmaterialized factory: probe must not call it
    booby = lambda: (_ for _ in ()).throw(AssertionError("materialized!"))  # noqa: E731
    c2 = AppContext(KVStore(tmp_path / "kv2.db"), tmp_path / "data2",
                    settings=GlobalSettings(), gen=booby)
    server2 = serve(c2, port=0)
    url2 = f"http://127.0.0.1:{server2.server_address[1]}"
    try:
        h = get(f"{url2}/healthz")
        assert h["ready"] is True and h["serving_dead"] is False
    finally:
        server2.shutdown()


def test_healthz_auth_exempt(tmp_path):
    """Orchestration probes can't carry secrets: /healthz answers 200 with
    an api_token configured while every other route still 401s."""
    db = KVStore(tmp_path / "kv.db")
    c = AppContext(db, tmp_path / "data", settings=GlobalSettings(),
                   api_token="s3cret")
    server = serve(c, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        assert get(f"{url}/healthz")["ok"] is True
        with pytest.raises(urllib.error.HTTPError) as e:
            get(f"{url}/list_cameras")
        assert e.value.code == 401
    finally:
        server.shutdown()


def test_camera_name_traversal_blocked(base):
    """/delete_camera and /add_camera must reject names that escape the
    cameras dir (round-1 advisor high finding: ?cam_name=../.. hit rmtree)."""
    url, ctx = base
    victim = ctx.base_dir / "precious"
    victim.mkdir(parents=True, exist_ok=True)
    (victim / "keep.txt").write_text("data")
    for evil in ("..%2F..%2Fprecious", "..", ".", "a%2Fb", "%2e%2e%2fprecious"):
        with pytest.raises(urllib.error.HTTPError) as e:
            get(f"{url}/delete_camera?cam_name={evil}")
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            get(f"{url}/add_camera?cam_name={evil}&src=rtsp://x")
        assert e.value.code == 400
    assert (victim / "keep.txt").exists()


def test_offload_sessions_lru_capped():
    """OffloadSessions evicts oldest sessions instead of growing unbounded
    (round-1 advisor low finding)."""
    from clearcam_tpu.server.http import OffloadSessions

    s = OffloadSessions()
    body = bytes(10)
    for i in range(OffloadSessions.MAX_SESSIONS + 20):
        s.full(f"sid{i}", body)
    assert len(s.frames) == OffloadSessions.MAX_SESSIONS
    assert "sid0" not in s.frames          # oldest evicted
    # patch refreshes LRU position
    keep = f"sid{20}"
    assert s.patch(keep, b"") is not None
    s.full("newsid", body)
    assert keep in s.frames


def test_get_preds_overlay_endpoint(base):
    url, ctx = base
    assert get(f"{url}/get_preds?cam=nope") == {"preds": [], "width": 0,
                                                "height": 0}
    # with a live camera holding predictions
    from clearcam_tpu.runtime.nvr import CamState
    cam = CamState(name="ov", src="x")
    cam.last_frame = np.zeros((240, 320, 3), np.uint8)
    cam.last_preds = np.array([[1, 2, 3, 4, 0.9, 0.0, 7.0]])
    ctx.nvr.cams["ov"] = cam
    d = get(f"{url}/get_preds?cam=ov")
    assert d["width"] == 320 and d["height"] == 240
    assert d["preds"][0][6] == 7.0


def test_profile_endpoint(base):
    url, ctx = base
    d = get(f"{url}/profile?seconds=0.2")
    assert "trace_dir" in d or "error" in d
    if "trace_dir" in d:
        from pathlib import Path
        assert Path(d["trace_dir"]).exists()


def test_cameraview_escapes_hostile_cam_name(base):
    url, _ = base
    evil = '";alert(1);//'
    html = get(f"{url}/?cam={urllib.parse.quote(evil)}", raw=True).decode()
    # the quote inside the JS string literal must be backslash-escaped so the
    # name cannot terminate the literal and inject script
    assert 'const CAM="\\";alert(1);//";' in html


def test_event_thumbs_camera_filter(base):
    """Gallery camera filter (reference mainview.html:2983): the `cam` body
    param must isolate one camera's events in both listing and paging."""
    url, ctx = base
    import cv2
    for cam, ts_list in (("gate", (10, 20)), ("yard", (30,))):
        d = ctx.base_dir / "cameras" / cam / "event_images" / "2026-08-16"
        d.mkdir(parents=True)
        (ctx.base_dir / "cameras" / cam / "streams" / "2026-08-16").mkdir(
            parents=True)
        for ts in ts_list:
            cv2.imwrite(str(d / f"{ts}_notif.jpg"),
                        np.zeros((8, 8, 3), np.uint8))
    all_ev = json.loads(post(f"{url}/event_thumbs", b"{}").read())
    assert all_ev["count"] == 3
    gate = json.loads(post(f"{url}/event_thumbs",
                           json.dumps({"cam": "gate"}).encode()).read())
    assert gate["count"] == 2
    assert {i["cam_name"] for i in gate["images"]} == {"gate"}
    yard = json.loads(post(f"{url}/event_thumbs",
                           json.dumps({"cam": "yard"}).encode()).read())
    assert [i["timestamp"] for i in yard["images"]] == [30]


def test_cameraview_event_time_params(base):
    """Event-time playback jump (reference playVideoAtTime,
    mainview.html:3376): /?cam=X&folder=DAY&start=TS must template the day
    and the seek offset into the per-camera page."""
    url, _ = base
    html = get(f"{url}/?cam=gate&folder=2026-08-15&start=4321.5",
               raw=True).decode()
    assert 'let selectedDir="2026-08-15"' in html
    assert "const START_TIME=4321.5" in html
    # negative offsets clamp to 0; garbage is ignored (null -> no seek)
    html = get(f"{url}/?cam=gate&start=-5", raw=True).decode()
    assert "const START_TIME=0" in html
    html = get(f"{url}/?cam=gate&start=abc", raw=True).decode()
    assert "const START_TIME=null" in html


def test_mainview_playback_affordances_present():
    """The gallery must expose the reference's event-time affordances
    (playVideoAtTime :3376, playAllCamerasAtTime :3400, camera filter
    :2983, thumbnail auto-refresh :1698) — static pin; behavior is driven
    through the params tested above."""
    from pathlib import Path
    html = (Path(__file__).resolve().parents[1] / "clearcam_tpu" / "server"
            / "web" / "mainview.html").read_text()
    for needle in ("function playVideoAtTime", "function playAllCamerasAtTime",
                   'id="cameraFilter"', "populateCameraFilter",
                   "dialog[open]"):
        assert needle in html, needle


def test_vendored_hls_js(base, tmp_path, monkeypatch):
    """Air-gapped hls.js: the reference loads it from a CDN
    (mainview.html:2841). When a deployment vendors a local copy
    (CLEARCAM_HLSJS / web/vendor / weights/hls.js), the served pages'
    script tag rewrites to /hls.js and the server serves the file."""
    url, ctx = base
    # without a vendored copy: CDN tag intact, /hls.js is 404
    monkeypatch.delenv("CLEARCAM_HLSJS", raising=False)
    page = get(f"{url}/", raw=True).decode()
    assert "cdn.jsdelivr.net/npm/hls.js" in page
    assert 'src="/hls.js"' not in page
    with pytest.raises(urllib.error.HTTPError):
        get(f"{url}/hls.js")
    # drop a local copy: both pages rewrite, and the file is served
    js = tmp_path / "hls.js"
    js.write_text("window.Hls = function VendoredHls(){};")
    monkeypatch.setenv("CLEARCAM_HLSJS", str(js))
    page = get(f"{url}/", raw=True).decode()
    assert 'src="/hls.js"' in page and "cdn.jsdelivr.net/npm/hls.js" not in page
    get(f"{url}/add_camera?cam_name=hcam&src=synthetic://64x48", raw=True)
    campage = get(f"{url}/?cam=hcam", raw=True).decode()
    assert 'src="/hls.js"' in campage
    assert get(f"{url}/hls.js", raw=True) == js.read_bytes()
