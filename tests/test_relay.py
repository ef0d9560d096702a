"""Cloud relay client flows against a local mock server: multipart
notifications, presigned-URL upload with retry, stream-upload-link poll with
the remote alerts toggle (helpers.py:18-307, clearcam.py:556-572)."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from clearcam_tpu.cloud import relay


class MockOrg(BaseHTTPRequestHandler):
    received: dict = {}
    fail_puts = 0

    def log_message(self, *a):
        pass

    def _send(self, body, code=200):
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if self.path == "/send":
            MockOrg.received["notif"] = body.decode(errors="replace")
            return self._send({"ok": True})
        self._send({}, 404)

    def do_PUT(self):  # noqa: N802
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if MockOrg.fail_puts > 0:
            MockOrg.fail_puts -= 1
            return self._send({}, 500)
        MockOrg.received["put"] = body
        self._send({"ok": True})

    def do_GET(self):  # noqa: N802
        p = urlparse(self.path)
        q = parse_qs(p.query)
        host = self.headers["Host"]
        if p.path == "/upload":
            MockOrg.received["upload_req"] = q
            return self._send({"url": f"http://{host}/presigned/blob?sig=x"})
        if p.path == "/get_stream_upload_link":
            return self._send({"upload_link": f"http://{host}/presigned/live",
                               "alerts_on": 0})
        self._send({}, 404)


@pytest.fixture
def org(monkeypatch):
    MockOrg.received = {}
    MockOrg.fail_puts = 0
    server = ThreadingHTTPServer(("127.0.0.1", 0), MockOrg)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    monkeypatch.setattr(relay, "NOTIF_URL", base + "/send")
    monkeypatch.setattr(relay, "API", base)
    yield base
    server.shutdown()


def test_send_notif_multipart(org):
    assert relay.send_notif("tok123", "Event Detected (cam)", "body text")
    raw = MockOrg.received["notif"]
    assert "tok123" in raw and "Event Detected (cam)" in raw
    assert 'name="session_token"' in raw and 'name="body_text"' in raw


def test_upload_file_presigned_flow(tmp_path, org):
    f = tmp_path / "clip.mp4.aes"
    f.write_bytes(b"encrypted-bytes")
    assert relay.upload_file(f, "tok123")
    assert MockOrg.received["upload_req"]["session_token"] == ["tok123"]
    assert MockOrg.received["upload_req"]["filename"] == ["clip.mp4.aes"]
    assert MockOrg.received["put"] == b"encrypted-bytes"
    assert not f.exists()              # deleted after upload


def test_upload_retries_then_succeeds(tmp_path, org):
    MockOrg.fail_puts = 2
    f = tmp_path / "c.aes"
    f.write_bytes(b"x")
    assert relay.upload_file(f, "tok", retries=5)
    assert MockOrg.received["put"] == b"x"


def test_check_upload_link_and_remote_alert_toggle(org):
    link, alerts_on = relay.check_upload_link("porch", "tok")
    assert link.endswith("/presigned/live")
    assert alerts_on is False          # relay said alerts_on=0
