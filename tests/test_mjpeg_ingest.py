"""ffmpeg-free HTTP camera ingest: MJPEG multipart streams and still-JPEG
snapshot polling (runtime/ingest.{MJPEGSource,SnapshotSource}).

The reference reaches HTTP cameras only through ffmpeg (clearcam.py:300-371)
— this is the ingest story for minimal/air-gapped deploys. A local HTTP
server plays camera: it serves a multipart/x-mixed-replace JPEG stream
(with and without Content-Length part headers, like real cameras vary) and
a /snapshot.jpg endpoint.
"""
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from clearcam_tpu.runtime.ingest import (  # noqa: E402
    FrameSlot, FramePump, MJPEGSource, SnapshotSource, open_source,
)


def make_jpeg(i: int, w=64, h=48) -> bytes:
    img = np.full((h, w, 3), i * 20 % 256, np.uint8)
    img[:8, :8] = (i * 37) % 256  # varies per frame
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


class CamHandler(BaseHTTPRequestHandler):
    frames_served = 12

    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path.startswith("/mjpeg"):
            with_len = "nolen" not in self.path
            # cameras commonly send Content-Length BEFORE Content-Type;
            # this variant also embeds a decoy EOI (COM segment holding
            # FF D9 bytes — an EXIF-thumbnail stand-in) that an SOI/EOI
            # scan would truncate at (round-4 advisor)
            cl_first = "clfirst" in self.path
            self.send_response(200)
            self.send_header("Content-Type",
                             'multipart/x-mixed-replace; boundary="frame"')
            self.end_headers()
            try:
                for i in range(self.frames_served):
                    jpg = make_jpeg(i)
                    if cl_first:
                        jpg = jpg[:2] + b"\xff\xfe\x00\x04\xff\xd9" + jpg[2:]
                    self.wfile.write(b"--frame\r\n")
                    if cl_first:
                        self.wfile.write(
                            f"Content-Length: {len(jpg)}\r\n".encode())
                        self.wfile.write(b"Content-Type: image/jpeg\r\n")
                    else:
                        self.wfile.write(b"Content-Type: image/jpeg\r\n")
                        if with_len:
                            self.wfile.write(
                                f"Content-Length: {len(jpg)}\r\n".encode())
                    self.wfile.write(b"\r\n")
                    self.wfile.write(jpg + b"\r\n")
            except BrokenPipeError:
                pass
        elif self.path.startswith("/snapshot"):
            jpg = make_jpeg(int(time.time() * 1000) % 97)
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(jpg)))
            self.end_headers()
            self.wfile.write(jpg)
        else:
            self.send_error(404)


@pytest.fixture(scope="module")
def cam_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), CamHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.mark.parametrize(
    "path", ["/mjpeg", "/mjpeg_nolen", "/mjpeg_clfirst"],
    ids=["content-length", "soi-eoi-scan", "cl-first+embedded-eoi"])
def test_mjpeg_source_reads_frames(cam_server, path):
    src = MJPEGSource(f"http://{cam_server}{path}")
    try:
        frames = [src.read() for _ in range(5)]
    finally:
        src.close()
    assert all(f is not None and f.shape == (48, 64, 3) for f in frames)
    # content actually advances frame to frame
    assert frames[0][0, 0, 0] != frames[1][0, 0, 0]


def test_mjpeg_source_exhausts_gracefully(cam_server):
    src = MJPEGSource(f"http://{cam_server}/mjpeg")
    try:
        got = 0
        for _ in range(CamHandler.frames_served + 3):
            if src.read() is not None:
                got += 1
        assert got == CamHandler.frames_served
    finally:
        src.close()


def test_snapshot_source_polls_at_rate(cam_server):
    src = SnapshotSource(f"http://{cam_server}/snapshot.jpg", fps=50.0)
    t0 = time.time()
    frames = [src.read() for _ in range(4)]
    took = time.time() - t0
    assert all(f is not None and f.shape == (48, 64, 3) for f in frames)
    assert took >= 2 / 50.0  # paced, not a busy loop


def test_open_source_routing(cam_server, tmp_path):
    s = open_source(f"mjpeg://{cam_server}/mjpeg", tmp_path)
    assert isinstance(s, MJPEGSource)
    s.close()
    s = open_source(f"snapshot://{cam_server}/snapshot.jpg?fps=5", tmp_path)
    assert isinstance(s, SnapshotSource) and s.interval == pytest.approx(0.2)
    # content-type sniffing picks the right reader when ffmpeg is absent
    import clearcam_tpu.runtime.ingest as ingest
    orig = ingest.find_ffmpeg
    ingest.find_ffmpeg = lambda: None
    try:
        s = open_source(f"http://{cam_server}/mjpeg", tmp_path)
        assert isinstance(s, MJPEGSource)
        assert s.read() is not None  # the sniffed response keeps streaming
        s.close()
        s = open_source(f"http://{cam_server}/snapshot.jpg", tmp_path)
        assert isinstance(s, SnapshotSource)
    finally:
        ingest.find_ffmpeg = orig


def test_mjpeg_through_frame_pump(cam_server):
    """The per-camera pump fills the newest-frame-wins slot from MJPEG."""
    slot = FrameSlot()
    src = MJPEGSource(f"http://{cam_server}/mjpeg")
    pump = FramePump("cam", src, slot)
    pump.start()
    deadline = time.time() + 10
    frame, num = None, 0
    while time.time() < deadline:
        frame, num = slot.snapshot()
        if frame is not None and num >= 3:
            break
        time.sleep(0.02)
    pump.stop()
    pump.join(timeout=5)
    assert frame is not None and frame.shape == (48, 64, 3) and num >= 3


def test_snapshot_url_fps_anywhere_in_query(tmp_path):
    """fps may ride among the camera's own query params and malformed
    values fall back to the default instead of killing init_cam."""
    from clearcam_tpu.runtime.ingest import SnapshotSource, open_source

    s = open_source("snapshot://cam.local/img.cgi?user=a&fps=5&pw=b", tmp_path)
    assert isinstance(s, SnapshotSource)
    assert abs(s.interval - 0.2) < 1e-9
    assert "fps=" not in s.url and "user=a" in s.url and "pw=b" in s.url

    s = open_source("snapshot://cam.local/img.cgi?fps=.", tmp_path)
    assert abs(s.interval - 0.5) < 1e-9            # default 2.0 fps

    s = open_source("snapshot://cam.local/img.cgi", tmp_path)
    assert abs(s.interval - 0.5) < 1e-9


def test_frame_pump_survives_midfile_decode_glitch():
    """One corrupt frame mid-VOD must not abandon the rest of the file;
    sustained failure (>=5 consecutive) still ends the pump."""
    import time as _time

    from clearcam_tpu.runtime.ingest import FramePump, FrameSlot, FrameSource

    class GlitchyVOD(FrameSource):
        finite = True
        fps = 100.0

        def __init__(self):
            self.t = 0

        def read(self):
            self.t += 1
            if self.t == 3:
                return None                        # transient decode glitch
            if self.t > 10:
                return None                        # real EOF (sustained)
            import numpy as _np
            return _np.zeros((4, 4, 3), _np.uint8)

        def progress(self):
            return None                            # unknown frame count

    src = GlitchyVOD()
    pump = FramePump("vod", src, FrameSlot())
    pump.start()
    t0 = _time.time()
    while not pump.ended and _time.time() - t0 < 10:
        _time.sleep(0.02)
    assert pump.ended, "EOF never detected with unknown frame count"
    assert src.t > 10, f"pump gave up at frame {src.t} on one glitch"
