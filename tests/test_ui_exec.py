"""EXECUTE the web UI's JavaScript (no browser needed).

The sandbox has no Chrome/node, so until round 4 the frontend was only
regex-checked (tests/test_ui_static.py). The in-repo JS engine
(clearcam_tpu.jsengine) now parses AND runs the pages:

1. gates: every <script> block and every inline on* handler must PARSE
   (full ES grammar, not brace balance), and every identifier they
   reference must resolve to a declaration, a browser global the fake
   environment provides, or a DOM id (browsers' named element access);
2. drives: mainview/cameraview boot against a canned fetch router and the
   user flows run end-to-end — camera grid, alerts CRUD + in-place edit,
   zone canvas clicks, settings, CLIP/image/similar search, event-time
   playback, multiview, day download/delete, the air-gapped snapshot and
   /day.mp4 fallbacks (reference UI surface: mainview.html:1633-3613);
3. live: the same page JS runs against the REAL clearcam_tpu HTTP server
   (serve() on an ephemeral port) — UI -> handlers -> SQLite and back.
"""
import json
import re
import urllib.parse

import pytest

from clearcam_tpu.jsengine import es
from clearcam_tpu.jsengine.dom import Browser, FakeFile, live_fetch
from clearcam_tpu.jsengine.interp import to_py
from pathlib import Path

WEB = Path(__file__).resolve().parent.parent / "clearcam_tpu" / "server" / "web"
PAGES = sorted(WEB.glob("*.html"))

COCO80 = [f"class{i}" for i in range(80)]
COCO80[0], COCO80[2] = "person", "car"


def template_cameraview(text, cam="gate", selected_dir="2026-08-19",
                        start_time="null", labels=COCO80):
    """Mirror server-side templating (server/http.py _page)."""
    for k, v in {
        "{selected_dir}": json.dumps(selected_dir)[1:-1],
        "{class_labels}": json.dumps(labels),
        "{start_time}": start_time,
        "{cam_name}": json.dumps(cam)[1:-1],
    }.items():
        text = text.replace(k, v)
    return text


def page_text(page: Path) -> str:
    text = page.read_text()
    if "{cam_name}" in text:
        text = template_cameraview(text)
    return text


from clearcam_tpu.jsengine.check import extract_scripts_and_handlers  # noqa: E402


# ---------------------------------------------------------------- gates

@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.name)
def test_scripts_parse(page):
    scripts, handlers = extract_scripts_and_handlers(page_text(page))
    assert scripts, f"{page.name}: no inline scripts found"
    for src in scripts:
        es.parse(src)  # JSSyntaxError (with line) on any typo
    for tag, attr, src in handlers:
        es.parse(src)


@pytest.mark.parametrize("page", PAGES, ids=lambda p: p.name)
def test_identifiers_resolve(page):
    """Every referenced identifier must be a declaration, a browser global,
    or a DOM id (named element access) — catches typo'd function names that
    brace-balance checks ship silently."""
    text = page_text(page)
    scripts, handlers = extract_scripts_and_handlers(text)
    browser_globals = set(Browser("<html></html>", hls=True).genv.vars)
    ids = set(re.findall(r'id="([^"]+)"', text))
    # ids minted inside template literals count (they exist post-render)
    allowed = browser_globals | ids | {"event"}
    declared = set()
    for src in scripts:
        ast = es.parse(src)
        # top-level declarations are shared between blocks and handlers
        for s in ast[1]:
            if s[0] == "func":
                declared.add(s[1])
            elif s[0] == "var":
                for pat, _ in s[2]:
                    es._pattern_names(pat, declared)
    for src in scripts:
        unresolved = es.free_identifiers(es.parse(src)) - allowed - declared
        assert not unresolved, f"{page.name}: unresolved identifiers {sorted(unresolved)}"
    for tag, attr, src in handlers:
        unresolved = es.free_identifiers(es.parse(src)) - allowed - declared
        assert not unresolved, \
            f"{page.name}: <{tag} {attr}> references {sorted(unresolved)}"


# ---------------------------------------------------------------- canned router

class Router:
    """Canned clearcam API responses + request log."""

    def __init__(self):
        self.log = []
        self.cameras = {"gate": None, "drive": {"analyzing": 42.0}}
        self.alerts = [{
            "id": "a1", "is_on": True, "classes": [0, 2], "max": 2,
            "window": 60, "zone": False, "is_notif": True, "desc": "a person",
            "threshold": 0.31,
            "sched": [[0, 86399], True, True, True, True, True, False, False]}]
        self.images = [{"url": "/gate/objects/2026-08-19/5.0.jpg",
                        "cam_name": "gate", "folder": "2026-08-19",
                        "timestamp": 3725, "score": 0.43}]

    def __call__(self, method, url, body):
        self.log.append((method, url, body))
        path = url.split("?")[0]
        table = {
            "/list_cameras": self.cameras,
            "/list_days": ["2026-08-18", "2026-08-19"],
            "/get_alerts": self.alerts,
            "/get_settings": {"coords": [[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]],
                              "outside": True, "threshold": 0.45},
            "/get_global_settings": {"use_clip": True, "use_face": True,
                                     "model_size": "t", "model_res": 640},
            "/get_max_storage": {"max_gb": 128},
            "/federation/cameras": [],
            "/get_counts": {"person": 3, "car": 1},
            "/get_preds": {"width": 1920, "height": 1080,
                           "preds": [[100, 50, 300, 250, 0.9, 0, 7],
                                     [400, 100, 500, 200, 0.8, 2, 8]]},
        }
        if path in table:
            return 200, json.dumps(table[path])
        if path == "/event_thumbs":
            return 200, json.dumps({"images": self.images, "count": len(self.images)})
        return 200, json.dumps(None)

    def urls(self, prefix=""):
        return [u for _, u, _ in self.log if u.startswith(prefix)]


@pytest.fixture
def main():
    r = Router()
    b = Browser((WEB / "mainview.html").read_text(), fetch=r, hls=False)
    r.log.clear()
    return b, r


# ---------------------------------------------------------------- mainview

def test_mainview_boot_renders_grid_gallery_days(main):
    b, r = main
    cams = b.el("cams").js_get("children").items
    assert len(cams) == 2
    assert b.el("counts_gate").text() == "person:3 car:1"
    # VOD camera renders progress, live camera renders snapshot fallback
    assert "analyzing 42%" in b.el("cams").inner_html()
    # air-gapped ladder: no hls.js -> real video via the /live.mp4 fMP4
    # tail first; stills only once the stream errors
    tile = b.document.get_element_by_id("v_gate")
    assert tile.tag == "video"
    assert any("/live.mp4?cam=gate" in src for _, src in b.loads)
    tile.dispatch("error")
    assert b.document.get_element_by_id("v_gate").tag == "img"
    assert any("/snapshot?cam=gate" in src for _, src in b.loads)
    assert len(b.el("gallery").js_get("children").items) == 1
    assert b.el("pageLabel").text() == "page 1"
    assert [o.js_get("value") for o in b.el("daySelect").js_get("options").items] \
        == ["", "2026-08-18", "2026-08-19"]
    assert [o.js_get("value") for o in b.el("cameraFilter").js_get("options").items] \
        == ["", "gate", "drive"]


def test_mainview_hls_mode_attaches_players():
    r = Router()
    b = Browser((WEB / "mainview.html").read_text(), fetch=r, hls=True)
    assert b.hls_loads and b.hls_loads[0].startswith("/gate/streams/")
    assert b.hls_loads[0].endswith("/stream.m3u8")
    video = b.document.get_element_by_id("v_gate")
    assert video.tag == "video"
    b.hls_instances[0].emit("hlsManifestParsed")
    assert video in b.played


def test_mainview_fatal_hls_error_falls_back_to_snapshots():
    """A camera without an HLS playlist (mjpeg:// source, or recording not
    started) must degrade down the air-gapped ladder — live fMP4 tail
    (/live.mp4) first, snapshot polling only when that errors too — never
    a black tile."""
    r = Router()
    b = Browser((WEB / "mainview.html").read_text(), fetch=r, hls=True)
    assert b.document.get_element_by_id("v_gate").tag == "video"
    b.hls_instances[0].emit("hlsError", {"fatal": True})
    tile = b.document.get_element_by_id("v_gate")
    assert tile.tag == "video" and b.hls_instances[0].destroyed
    assert any("/live.mp4?cam=gate" in src for _, src in b.loads)
    tile.dispatch("error")                      # live stream unplayable too
    tile = b.document.get_element_by_id("v_gate")
    assert tile.tag == "img"
    b.fire_timers(kind="interval", max_fires=30)
    assert any("/snapshot?cam=gate" in src for _, src in b.loads)
    # non-fatal errors must NOT tear the player down
    b2 = Browser((WEB / "mainview.html").read_text(), fetch=Router(), hls=True)
    b2.hls_instances[0].emit("hlsError", {"fatal": False})
    assert b2.document.get_element_by_id("v_gate").tag == "video"


def test_cameraview_fatal_hls_error_fallbacks():
    # live view (today): /live.mp4 fMP4 tail with the id preserved; only
    # an error on THAT stream drops to snapshot stills
    b, r = cam_browser(selected_dir=None, hls=True)
    b.hls_instances[-1].emit("hlsError", {"fatal": True})
    v = b.document.get_element_by_id("player")
    assert v.tag == "video"
    assert v.js_get("src").startswith("/live.mp4?cam=gate")
    v.dispatch("error")
    assert b.get("_snapImg").attrs.get("id") == "player"
    # past day: /day.mp4 remux
    b2, r2 = cam_browser(selected_dir="2026-08-10", hls=True)
    b2.hls_instances[-1].emit("hlsError", {"fatal": True})
    v = b2.document.get_element_by_id("player")
    assert v.tag == "video"
    assert v.js_get("src") == "/day.mp4?cam=gate&day=2026-08-10"


def test_mainview_feature_flags_hide_search(main):
    b, r = main
    assert b.el("searchText").js_get("style").js_get("display") == ""
    r2 = Router()
    orig = r2.__call__

    def no_clip(method, url, body):
        if url.startswith("/get_global_settings"):
            return 200, json.dumps({"use_clip": False, "use_face": False})
        return orig(method, url, body)
    b2 = Browser((WEB / "mainview.html").read_text(), fetch=no_clip)
    assert b2.el("searchText").js_get("style").js_get("display") == "none"
    assert b2.el("searchUploadBtn").js_get("style").js_get("display") == "none"


def test_alerts_dialog_renders_and_edits_in_place(main):
    b, r = main
    b.call("openAlerts", "gate")
    assert b.modals[-1] == "dlgAlerts"
    assert b.el("alertsTitle").text() == "Alerts — gate"
    assert len(b.el("alertClasses").js_get("options").items) == 80
    rows = b.el("alertsTable").js_get("querySelector")("tbody").js_get("children").items
    assert len(rows) == 1
    assert rows[0].js_get("children").items[1].text() == "person, car"
    # pencil loads the alert into the form
    pencil = rows[0].js_get("children").items[7].js_get("children").items[0]
    b.click(pencil)
    assert b.el("alertFormTitle").text() == "Edit alert"
    assert b.el("alertMax").js_get("value") == "2"
    on = [o.js_get("classList").js_get("contains")("on")
          for o in b.el("weekdays").js_get("children").items]
    assert on == [True, True, True, True, True, False, False]
    # saving the edit posts every field incl. the id
    r.log.clear()
    b.call("createAlert")
    (edit_url,) = r.urls("/edit_alert")
    q = urllib.parse.parse_qs(urllib.parse.urlparse(edit_url).query)
    assert q["id"] == ["a1"] and q["class_ids"] == ["0,2"] and q["max"] == ["2"]
    assert json.loads(q["sched"][0])[1:] == [True] * 5 + [False] * 2
    assert q["desc"] == ["a person"] and q["threshold"] == ["31"]


def test_alert_checkbox_toggles_via_inline_handler(main):
    b, r = main
    b.call("openAlerts", "gate")
    rows = b.el("alertsTable").js_get("querySelector")("tbody").js_get("children").items
    onbox = rows[0].js_get("children").items[0].js_get("children").items[0]
    onbox.js_set("checked", False)
    r.log.clear()
    onbox.dispatch("change")
    assert any(u.startswith("/edit_alert?cam=gate&id=a1&is_on=false")
               for u in r.urls())


def test_zone_editor_draws_clicks_and_saves(main):
    b, r = main
    b.call("openZone", "gate")
    assert b.el("zoneOutside").js_get("checked") is True
    assert b.el("camThreshold").js_get("value") == "0.45"
    b.fire_timers(kind="timeout")  # 50 ms canvas-sizing timer -> drawZone
    ctx = b.el("zoneCanvas").js_get("getContext")("2d")
    ops = [op for op, _ in ctx.ops]
    assert "moveTo" in ops and ops.count("lineTo") >= 2 and "fill" in ops
    # canvas click (document-level delegate) appends a normalized point
    cv = b.el("zoneCanvas")
    cv.rect = (10.0, 20.0, 200.0, 100.0)
    cv.dispatch("click", clientX=110.0, clientY=70.0)
    assert to_py(b.get("zonePoints"))[-1] == [0.5, 0.5]
    r.log.clear()
    b.call("saveZone")
    (u,) = r.urls("/edit_settings")
    q = urllib.parse.parse_qs(urllib.parse.urlparse(u).query)
    assert len(json.loads(q["coords"][0])) == 4
    assert q["outside"] == ["true"] and q["threshold"] == ["0.45"]


def test_settings_roundtrip_posts_json(main):
    b, r = main
    b.call("openSettings")
    assert b.el("gsMaxGb").js_get("value") == "128"
    assert b.el("gsClip").js_get("checked") is True
    b.el("gsUserID").js_set("value", "u123")
    r.log.clear()
    b.call("saveSettings")
    method, url, body = [e for e in r.log if e[1] == "/edit_settings"][0]
    assert method == "POST"
    payload = json.loads(body)
    assert payload["userID"] == "u123"
    assert payload["key"] is True  # untouched secret -> preserve sentinel
    assert payload["model_res"] == 640


def test_search_flows(main):
    b, r = main
    # text search on Enter
    b.el("searchText").js_set("value", "red car")
    r.log.clear()
    b.el("searchText").dispatch("keydown", key="Enter")
    assert json.loads(r.log[-1][2]) == {"image_text": "red car", "start": 0, "count": 48}
    # upload search goes through FileReader -> data URL
    r.log.clear()
    b.call("searchByUpload", FakeFile("q.jpg", b"\xff\xd8stub", "image/jpeg"))
    body = json.loads(r.log[-1][2])
    assert body["uploaded_image"].startswith("data:image/jpeg;base64,")
    # find-similar uses the opened image's url
    thumb = b.el("gallery").js_get("children").items[0]
    b.click(thumb)
    assert b.modals[-1] == "dlgImage"
    r.log.clear()
    b.call("findSimilar")
    assert json.loads(r.log[-1][2])["similar_img"] == "/gate/objects/2026-08-19/5.0.jpg"


def test_event_time_playback_routes_to_camera_page(main):
    b, r = main
    thumb = b.el("gallery").js_get("children").items[0]
    b.click(thumb)  # sets lastImage
    b.call("playVideoAtTime")
    assert b.navigations[-1] == "/?cam=gate&folder=2026-08-19&start=3725"


def test_play_all_cameras_uses_day_mp4_fallback(main):
    b, r = main
    thumb = b.el("gallery").js_get("children").items[0]
    b.click(thumb)
    b.call("playAllCamerasAtTime")
    mv = b.el("multiview")
    assert mv.js_get("style").js_get("display") == "grid"
    # air-gapped: plain <video> pointed at the server-side remux
    vids = [c for c in mv.js_get("children").items if c.tag == "video"]
    assert vids and vids[0].js_get("src") == "/day.mp4?cam=gate&day=2026-08-19"
    vids[0].dispatch("loadedmetadata")
    assert (vids[0], 3725.0) in b.seeks


def test_add_delete_repoint_camera(main):
    b, r = main
    b.el("newCamName").js_set("value", "porch")
    b.el("newCamSrc").js_set("value", "rtsp://cam/live")
    r.log.clear()
    b.call("addCamera")
    assert any(u.startswith("/add_camera?cam_name=porch&src=rtsp%3A%2F%2Fcam%2Flive")
               for u in r.urls())
    # delete requires confirm; declined -> no request
    b.confirm_response = False
    r.log.clear()
    b.call("deleteCamera", "gate")
    assert not r.urls("/delete_camera")
    b.confirm_response = True
    b.call("deleteCamera", "gate")
    assert r.urls("/delete_camera?cam_name=gate")
    # repoint prompts for the new URL
    b.prompt_response = "rtsp://new/stream"
    r.log.clear()
    b.call("repointCamera", "gate")
    assert any(u.startswith("/edit_settings?cam=gate&url=rtsp%3A%2F%2Fnew%2Fstream")
               for u in r.urls())


def test_vod_upload_chunks_file(main):
    b, r = main
    f = FakeFile("clip.mp4", b"x" * (9 * 1024 * 1024))
    r.log.clear()
    b.call("uploadFootage", f, "clipcam")
    posts = [(u, body) for m, u, body in r.log if m == "POST"]
    assert len(posts) == 3  # 9 MB in 4 MB chunks
    assert all(u.startswith("/analyse-footage?filename=clip.mp4&chunk=") for u, _ in posts)
    assert sum(len(body) for _, body in posts) == 9 * 1024 * 1024
    assert r.urls("/add_camera?cam_name=clipcam")


def test_federation_section_renders_peer_cameras_inert(main):
    """Peer camera/host strings are attacker-influenced (another NVR host);
    the page builds this section with DOM nodes, so markup in names must
    render as text, never as elements."""
    b, r = main
    orig = r.__call__
    evil = "<img src=x onerror=alert(1)>"

    def with_peers(method, url, body):
        if url.startswith("/federation/cameras"):
            return 200, json.dumps([
                {"cam": "lobby", "host": "http://peer:8080",
                 "url": "http://peer:8080/?cam=lobby"},
                {"cam": evil, "host": "not a url",
                 "url": "http://peer2:8080/?cam=x"},
            ])
        return orig(method, url, body)
    b.fetch_handler = with_peers
    b.call("loadFederation")
    box = b.el("federation")
    assert box.js_get("style").js_get("display") == ""
    links = [c for c in b.el("fedcams").js_get("children").items]
    assert [a.attrs.get("href") for a in links] == \
        ["http://peer:8080/?cam=lobby", "http://peer2:8080/?cam=x"]
    # bad host falls back to raw text in the pill; evil cam stays TEXT
    pills = b.el("fedcams").inner_html()
    assert "peer:8080" in pills and "not a url" in pills
    assert "&lt;img" in pills and "<img" not in pills
    # no peers -> section hides again
    b.fetch_handler = orig
    b.call("loadFederation")
    assert box.js_get("style").js_get("display") == "none"


def test_gallery_autorefresh_pauses_while_modal_open(main):
    b, r = main
    r.log.clear()
    b.fire_timers(kind="interval")  # all intervals incl. the 5 s gallery one
    assert r.urls("/event_thumbs") != []
    b.call("openSettings")  # opens a dialog
    r.log.clear()
    b.fire_timers(kind="interval")
    assert r.urls("/event_thumbs") == []  # dontRefresh guard
    b.el("dlgSettings").js_get("close")()
    r.log.clear()
    b.fire_timers(kind="interval")
    assert r.urls("/event_thumbs") != []


# ---------------------------------------------------------------- cameraview

def cam_browser(router=None, selected_dir="2026-08-19", start_time="null",
                now_ms=1755600000000.0, hls=False):
    """selected_dir=None means "today under the page's (fake) clock"."""
    if selected_dir is None:
        import datetime
        selected_dir = datetime.datetime.fromtimestamp(
            now_ms / 1000, datetime.timezone.utc).strftime("%Y-%m-%d")
    r = router or Router()
    text = template_cameraview((WEB / "cameraview.html").read_text(),
                               selected_dir=selected_dir, start_time=start_time)
    b = Browser(text, fetch=r, hls=hls, now_ms=now_ms)
    return b, r


def today_of(b):
    return b.eval("new Date().toISOString().slice(0,10)")


def test_cameraview_live_airgap_snapshot_mode():
    b, r = cam_browser()
    today = today_of(b)
    # page booted with selectedDir=today -> live fMP4 tail; error on the
    # stream -> snapshot polling; 'ended' (recorder idle) -> reconnect
    b2, r2 = cam_browser(selected_dir=today)
    v = b2.document.get_element_by_id("player")
    assert v.tag == "video"
    assert v.js_get("src").startswith("/live.mp4?cam=gate")
    n_loads = len(b2.loads)
    v.dispatch("ended")
    b2.fire_timers(kind="timeout", max_fires=5)
    assert any("/live.mp4?cam=gate" in src
               for _, src in b2.loads[n_loads:])   # reconnected
    v.dispatch("error")
    assert b2.get("_snapImg") is not None and b2.get("_snapImg").tag == "img"
    b2.fire_timers(kind="interval", max_fires=50)
    assert any("/snapshot?cam=gate" in src for _, src in b2.loads)
    # event strip rendered and click seeks the player... (snapshot mode has
    # no video; use a past day for the seek test below)
    assert len(b2.el("events").js_get("children").items) == 1


def test_cameraview_past_day_uses_day_mp4_and_seeks():
    b, r = cam_browser(selected_dir="2026-08-10", start_time="42.5")
    v = b.document.get_element_by_id("player")
    assert v.tag == "video"
    assert v.js_get("src") == "/day.mp4?cam=gate&day=2026-08-10"
    v.dispatch("loadedmetadata")
    assert (v, 42.5) in b.seeks
    # event strip click jumps the video
    ev = b.el("events").js_get("children").items[0]
    b.click(ev)
    assert (v, 3725.0) in b.seeks


def test_cameraview_overlay_draws_preds_today_only():
    b, r = cam_browser(selected_dir=today_of(cam_browser()[0]))
    # live (today): drawPreds paints scaled boxes + labels
    b.call("drawPreds")
    ctx = b.el("overlay").js_get("getContext")("2d")
    rects = [args for op, args in ctx.ops if op == "strokeRect"]
    texts = [args for op, args in ctx.ops if op == "fillText"]
    assert len(rects) == 2 and len(texts) == 2
    assert texts[0][0].startswith("person #7 90%")
    assert texts[1][0].startswith("car #8 80%")
    # past day: overlay cleared, no fetch
    b2, r2 = cam_browser(selected_dir="2026-08-10")
    r2.log.clear()
    b2.call("drawPreds")
    assert not r2.urls("/get_preds")
    ctx2 = b2.el("overlay").js_get("getContext")("2d")
    assert [op for op, _ in ctx2.ops] == ["clearRect"]


def test_cameraview_day_download_delete_and_golive():
    b, r = cam_browser(selected_dir="2026-08-10")
    b.call("downloadDay")
    assert b.navigations[-1] == "/download_day?cam=gate&day=2026-08-10"
    r.log.clear()
    b.call("deleteDay")
    assert b.confirms and r.urls("/delete_day?cam=gate&day=2026-08-10")
    assert r.urls("/list_days")  # reloads the day list
    b.call("goLive")
    assert to_py(b.get("selectedDir")) == today_of(b)


def test_cameraview_hls_mode_plays_playlist():
    b, r = cam_browser(selected_dir="2026-08-10", start_time="7", hls=True)
    assert b.hls_loads == ["/gate/streams/2026-08-10/stream.m3u8"]
    v = b.document.get_element_by_id("player")
    b.hls_instances[-1].emit("hlsManifestParsed")
    assert (v, 7.0) in b.seeks and v in b.played


# ---------------------------------------------------------------- live server

@pytest.fixture
def live():
    from clearcam_tpu.runtime.nvr import NVR
    from clearcam_tpu.runtime.settings import GlobalSettings
    from clearcam_tpu.server.http import AppContext, serve
    from clearcam_tpu.utils.db import KVStore
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        db = KVStore(tmp / "kv.db")
        nvr = NVR(db, tmp / "data", GlobalSettings(), detector=None)
        ctx = AppContext(db, tmp / "data", nvr=nvr, settings=nvr.settings)
        server = serve(ctx, port=0)
        try:
            yield f"http://127.0.0.1:{server.server_address[1]}"
        finally:
            server.shutdown()


def test_mainview_runs_against_real_server(live):
    import urllib.request
    # seed a camera + an alert through the real API
    urllib.request.urlopen(f"{live}/add_camera?cam_name=ui_cam&src=synthetic://64x48",
                           timeout=10).read()
    urllib.request.urlopen(f"{live}/edit_alert?cam=ui_cam&max=3&class_ids=0&window=30",
                           timeout=10).read()
    html = urllib.request.urlopen(f"{live}/", timeout=10).read().decode()
    b = Browser(html, fetch=live_fetch(live), hls=False)
    # the UI rendered the camera it fetched from the real /list_cameras
    names = [el.text() for el in b.document.root.select("#cams .name")]
    assert names == ["ui_cam"]
    # alerts dialog renders the real alert
    b.call("openAlerts", "ui_cam")
    rows = b.el("alertsTable").js_get("querySelector")("tbody").js_get("children").items
    assert len(rows) == 1 and rows[0].js_get("children").items[2].text() == "3"
    # create a second alert THROUGH THE UI form, then verify server-side
    b.el("alertMax").js_set("value", "5")
    opts = b.el("alertClasses").js_get("options").items
    opts[2].js_set("selected", True)  # car
    b.call("resetAlertForm")  # reset clears selection; re-select + set fields
    opts[2].js_set("selected", True)
    b.el("alertMax").js_set("value", "5")
    b.call("createAlert")
    alerts = json.loads(urllib.request.urlopen(
        f"{live}/get_alerts?cam=ui_cam", timeout=10).read())
    assert any(a["max"] == 5 and a["classes"] == [2] for a in alerts)
    # zone editor round-trip: click 3 points in the canvas, save, read back
    b.call("openZone", "ui_cam")
    cv = b.el("zoneCanvas")
    cv.rect = (0.0, 0.0, 100.0, 100.0)
    b.run_script("zonePoints=[]")
    for x, y in [(10, 10), (90, 10), (50, 90)]:
        cv.dispatch("click", clientX=float(x), clientY=float(y))
    b.call("saveZone")
    s = json.loads(urllib.request.urlopen(
        f"{live}/get_settings?cam=ui_cam", timeout=10).read())
    assert s["coords"] == [[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]]


def test_cameraview_runs_against_real_server(live):
    import urllib.request
    urllib.request.urlopen(f"{live}/add_camera?cam_name=ui_cam&src=synthetic://64x48",
                           timeout=10).read()
    html = urllib.request.urlopen(f"{live}/?cam=ui_cam&folder=2026-08-10&start=12",
                                  timeout=10).read().decode()
    b = Browser(html, fetch=live_fetch(live), hls=False)
    assert b.document.root.select("title")[0].text().endswith("ui_cam")
    assert to_py(b.get("CAM")) == "ui_cam"
    assert to_py(b.get("START_TIME")) == 12
    v = b.document.get_element_by_id("player")
    assert v.js_get("src") == "/day.mp4?cam=ui_cam&day=2026-08-10"
    # real class labels got templated in (COCO person)
    labels = to_py(b.get("CLASS_LABELS"))
    assert labels[0] == "person" and len(labels) == 80


# ---------------------------------------------------------------- uicheck tool

def test_uicheck_offline_clean_and_catches_injected_typo(tmp_path, monkeypatch):
    from clearcam_tpu.tools import uicheck
    assert uicheck.check_offline() == []
    # a typo'd identifier inside a handler must be reported
    bad = WEB / "mainview.html"
    text = bad.read_text().replace("searchByText()", "searchByTxet()", 1)
    (tmp_path / "mainview.html").write_text(text)
    monkeypatch.setattr(uicheck, "WEB", tmp_path)
    probs = uicheck.check_offline()
    assert probs and "searchByTxet" in probs[0]


def test_uicheck_live_against_real_server(live):
    import urllib.request
    from clearcam_tpu.tools import uicheck
    urllib.request.urlopen(f"{live}/add_camera?cam_name=ui_cam&src=synthetic://64x48",
                           timeout=10).read()
    assert uicheck.check_live(live) == []
    assert uicheck.main(["--url", live]) == 0
