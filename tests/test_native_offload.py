"""C++ edge offload client (native/offload/offload.cc) against the real
server's /yolo + /diff endpoints.

Completes the native story for the reference's remote-inference offload
(Yolo.m:269-302,363-403): round 2 implemented the SERVER side and verified
the protocol with Python clients; ccoffload is the C++ client half —
full-frame posts, session-sticky sparse diffs within the 10% budget, and
the 409 full-frame recovery the phone performs when the server loses the
session."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

from clearcam_tpu.runtime.nvr import NVR
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.server.http import AppContext, serve
from clearcam_tpu.utils.db import KVStore

ROOT = Path(__file__).resolve().parents[1]
BIN = ROOT / "native" / "build" / "ccoffload"


@pytest.fixture(scope="module")
def offload_bin():
    if not BIN.exists():
        rc = subprocess.run(["make", "-C", str(ROOT / "native")],
                            capture_output=True)
        if rc.returncode or not BIN.exists():
            pytest.skip("native toolchain unavailable")
    return str(BIN)


class MeanDetector:
    """One box whose score encodes the frame mean — proves the server
    reconstructed the DIFFED frame correctly, not just any frame."""

    def __init__(self):
        self.means = []

    def detect_many(self, frames):
        out = []
        for f in frames:
            m = float(np.asarray(f, np.float32).mean())
            self.means.append(m)
            out.append(np.array([[1, 2, 3, 4, m, 0.0]], np.float32))
        return out


@pytest.fixture
def base(tmp_path):
    db = KVStore(tmp_path / "kv.db")
    nvr = NVR(db, tmp_path / "data", GlobalSettings(), detector=None)
    det = MeanDetector()
    ctx = AppContext(db, tmp_path / "data", nvr=nvr, settings=nvr.settings,
                     offload_detect=lambda img: det.detect_many([img])[0])
    server = serve(ctx, port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}", det
    server.shutdown()


def run_client(bin_, url, *extra):
    # the offload protocol is fixed 640x640x3 (server OffloadSessions.res,
    # mirroring Yolo.m's 640 input)
    r = subprocess.run([bin_, "--server", url, "--res", "640",
                        "--synthetic", "6", *extra],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    return [line.split() for line in r.stdout.strip().splitlines()]


def test_full_then_sparse_diffs(offload_bin, base):
    url, det = base
    lines = run_client(offload_bin, url)
    assert len(lines) == 6
    modes = [l[1] for l in lines]
    assert modes[0] == "full"           # no prior state
    assert modes[1:] == ["diff"] * 5    # marching square fits the 10% budget
    assert all(l[2] == "1" for l in lines)  # every frame got a detection
    # score == frame mean: the server-side frame reconstructed from sparse
    # patches matches what the client rendered. The square translates
    # without resizing, so every frame's mean is identical — any patch
    # mis-application would shift it.
    scores = [float(l[7]) for l in lines]
    assert max(scores) - min(scores) < 1e-3
    assert len(set(round(m, 3) for m in det.means)) == 1
    assert scores[0] > 96.0 / 255.0 * 255.0 - 100  # sanity: a real mean


def test_diff_without_session_recovers_via_409(offload_bin, base):
    url, det = base
    lines = run_client(offload_bin, url, "--diff-first")
    assert lines[0][1] == "diff409full"  # 409 -> full resend, then detection
    assert lines[0][2] == "1"
    assert [l[1] for l in lines[1:]] == ["diff"] * 5
