"""Full-process boot smoke: `python -m clearcam_tpu` wires the NVR loop,
HTTP server, storage manager and offload batcher together (reference
clearcam.py:1418-1475 startup). Runs with --no-detector so no TPU/compiles
are involved; a synthetic camera link exercises the tick loop."""
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_main_boots_and_serves(tmp_path):
    from clearcam_tpu.runtime.settings import GlobalSettings
    from clearcam_tpu.utils.db import KVStore

    db = KVStore(tmp_path / "cc_cache.db")
    db.run_put("links", "cam1", "synthetic://320x180")
    db.run_put("global_settings", "all", GlobalSettings())

    port = _free_port()
    env = dict(os.environ, PYTHONPATH=os.getcwd(),
               JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "clearcam_tpu", "--port", str(port),
         "--data", str(tmp_path), "--no-detector"],
        env=env, cwd=str(tmp_path), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 60
        last = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    f"server exited rc={proc.returncode}:\n"
                    + proc.stdout.read())
            try:
                last = urllib.request.urlopen(f"{base}/list_cameras",
                                              timeout=2).read()
                break
            except Exception:
                time.sleep(0.5)
        assert last is not None, "server never came up"
        assert b"cam1" in last

        # main page + settings + offload round-trip (batcher with no
        # detector returns empty rows)
        assert urllib.request.urlopen(base, timeout=5).status == 200
        assert b"model_size" in urllib.request.urlopen(
            f"{base}/get_global_settings", timeout=5).read()
        frame = np.zeros(640 * 640 * 3, np.uint8).tobytes()
        req = urllib.request.Request(f"{base}/yolo", data=frame, method="POST")
        resp = urllib.request.urlopen(req, timeout=10)
        assert resp.status == 200
        assert resp.read() == b""          # no detector -> zero rows
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=10)
