"""Live ffmpeg ingest end-to-end: a real HLS stream served over local HTTP
drives the reference's two-process recipe (HLS copy recorder + rawvideo
pipe) into the NATIVE batcher (C++ reader threads, with ingest-time
decimation) and out through detect -> track -> counters.

This is the only test that exercises FfmpegSource + NativeIngest with real
ffmpeg processes; everything else uses synthetic sources."""
import functools
import http.server
import os
import subprocess
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from clearcam_tpu.runtime.ingest import find_ffmpeg
from clearcam_tpu.runtime import native_loader

pytestmark = pytest.mark.skipif(
    find_ffmpeg() is None or native_loader.load_lib("ccingest") is None,
    reason="needs ffmpeg + native build")


@pytest.fixture
def hls_stream(tmp_path):
    """Looping live HLS stream of a moving colored box on local HTTP."""
    ff = find_ffmpeg()
    clip = tmp_path / "clip.mp4"
    # 480x360 (divisible by 3 for the decimation path), moving color block
    subprocess.run(
        [ff, "-y", "-loglevel", "quiet", "-f", "lavfi",
         "-i", "color=c=0x1a1a1a:s=480x360:d=4:r=10",
         "-vf", ("drawbox=x='40+mod(t*60,300)':y=120:w=80:h=120:"
                 "color=0xF0B428:t=fill"),          # BGR(40,180,240) in RGB hex
         "-c:v", "libx264", "-pix_fmt", "yuv420p", str(clip)], check=True)
    hls_dir = tmp_path / "hls"
    hls_dir.mkdir()
    streamer = subprocess.Popen(
        [ff, "-loglevel", "quiet", "-re", "-stream_loop", "-1", "-i",
         str(clip), "-c", "copy", "-f", "hls", "-hls_time", "1",
         "-hls_list_size", "4", "-hls_flags", "delete_segments",
         str(hls_dir / "live.m3u8")],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(hls_dir))
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/live.m3u8"
    deadline = time.time() + 20
    while time.time() < deadline and not (hls_dir / "live.m3u8").exists():
        time.sleep(0.2)
    assert (hls_dir / "live.m3u8").exists(), "streamer produced no playlist"
    yield url
    streamer.kill()
    httpd.shutdown()


def test_ffmpeg_native_ingest_e2e(hls_stream, tmp_path, monkeypatch):
    from clearcam_tpu.runtime.nvr import NVR
    from clearcam_tpu.runtime.settings import GlobalSettings
    from clearcam_tpu.utils.db import KVStore
    from tests.test_nvr import ColorKeyDetector

    monkeypatch.setenv("CLEARCAM_INGEST_WARMUP", "3")
    monkeypatch.setenv("CLEARCAM_INGEST_DOWNSAMPLE", "3")
    db = KVStore(tmp_path / "kv.db")
    db.run_put("links", "live", hls_stream)
    n = NVR(db, tmp_path / "data", GlobalSettings(),
            detector=ColorKeyDetector(), use_native_ingest=True)
    assert n.native_ingest is not None
    try:
        links = db.run_get("links", None)
        for name, src in links.items():
            n.init_cam(name, src)
        cam = n.cams["live"]
        assert cam.native_key is not None, "native ingest path not taken"
        deadline = time.time() + 60
        tracked = False
        while time.time() < deadline:
            n.tick()
            counts, _ = cam.counter.get_counts()
            if counts.get(0, 0) >= 1:
                tracked = True
                break
            time.sleep(0.05)
        assert tracked, "no tracked object from the live HLS stream"
        # frames arrive decimated 480x360 -> 160x120
        assert cam.last_frame.shape == (120, 160, 3), cam.last_frame.shape
        # the HLS copy recorder wrote real segments
        days = list((tmp_path / "data/cameras/live/streams").glob("*/*.ts"))
        assert days, "recorder produced no segments"
    finally:
        n.stop()
