"""Edge viewer client against a local mock relay: device list, live segment
decrypt, event feed download (the mobile viewer flows)."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from clearcam_tpu.cloud.crypto import encrypt_bytes
from clearcam_tpu.cloud.viewer import ViewerClient

KEY = "shhh"
CLIP = b"\x00\x00\x00\x18ftypmp42-fake-movie-bytes"


class MockRelay(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):  # noqa: N802
        p = urlparse(self.path)
        q = parse_qs(p.query)
        token_ok = q.get("session_token", [""])[0] == "tok"

        def send(body, code=200, raw=False):
            data = body if raw else json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        if p.path == "/ping":
            return send({"ok": True})
        if p.path == "/validate_user":
            return send({"ok": True}) if token_ok else send({}, 403)
        if p.path == "/get_live_devicesv2":
            return send([{"name": "porch", "alerts_on": 1}])
        if p.path == "/get_stream_download_link":
            host = self.headers["Host"]
            return send({"download_link": f"http://{host}/blob/segment.mp4.aes"})
        if p.path == "/events":
            host = self.headers["Host"]
            newest = float(q.get("newest_creation_time", ["0"])[0])
            events = [{"name": "porch", "creation_time": 100,
                       "url": f"http://{host}/blob/event.mp4.aes"}]
            return send([e for e in events if e["creation_time"] > newest])
        if p.path.startswith("/blob/"):
            return send(encrypt_bytes(CLIP, KEY), raw=True)
        send({}, 404)


@pytest.fixture
def relay():
    server = ThreadingHTTPServer(("127.0.0.1", 0), MockRelay)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_viewer_flows(relay, tmp_path):
    c = ViewerClient("tok", base_url=relay)
    assert c.ping() and c.validate_user()
    devices = c.list_devices()
    assert devices[0]["name"] == "porch"
    # live segment: link -> download -> decrypt
    seg = c.fetch_live_segment("porch", KEY)
    assert seg == CLIP
    # event feed with incremental cursor
    events = c.list_events()
    assert len(events) == 1
    assert c.list_events(newest_creation_time=100) == []
    out = tmp_path / "event.mp4"
    clip = c.download_event(events[0], KEY, dst=out)
    assert clip == CLIP and out.read_bytes() == CLIP
    # wrong key -> magic check failure
    with pytest.raises(ValueError):
        c.download_event(events[0], "badkey")


def test_viewer_bad_token(relay):
    c = ViewerClient("wrong", base_url=relay)
    assert not c.validate_user()
