"""Mesh in the PRODUCT, not just the library (VERDICT r3 item 1): the
`--mesh N` flag path — BatchDetector sharding its frame batches over a
("data",) mesh with identical detections to single-device, the VLM summary
engine running tensor-parallel with identical tokens, and the real
`python -m clearcam_tpu --mesh 8` process booting and detecting on the
8-virtual-device CPU mesh. The reference is single-accelerator
(clearcam.py:253,269-270); multi-chip scale-out is this framework's
SURVEY.md §2.3 "new" row.
"""
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np

from clearcam_tpu.models import yolov9
from clearcam_tpu.parallel import mesh as pmesh
from clearcam_tpu.runtime.nvr import BatchDetector


def test_batch_detector_mesh_matches_single_device():
    """detect_many through a dp-8 mesh == single device, including the
    odd-count padding path (5 frames pad to a dp-divisible bucket of 8)."""
    params = yolov9.init_params("t", seed=0)
    frames = [np.random.default_rng(i).integers(0, 255, (96, 128, 3), np.uint8)
              for i in range(5)]
    solo = BatchDetector("t", res=64, params=params)
    mesh = pmesh.make_mesh(8, data=8)
    sharded = BatchDetector("t", res=64, params=params, mesh=mesh)
    assert sharded._bucket(5) == 8 and sharded._bucket(9) == 16
    a = solo.detect_many(frames)
    b = sharded.detect_many(frames)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-3)


def test_vlm_engine_tp_matches_solo():
    """The NVR summary engine with a tp mesh (NVR(llm_mesh=...) wiring,
    runtime/nvr.py summary_engine) decodes the same tokens as the solo
    Qwen3VL path — GSPMD resharding of the replicated vision tower's slot
    writes into the split KV cache included."""
    from clearcam_tpu.serving.vlm import VLMServingEngine
    from test_qwen3vl import make_vlm

    vlm = make_vlm()   # n_kv_heads=2: divisible by the model axis below
    f1 = np.full((64, 64, 3), 128, np.uint8)
    solo = vlm.generate(prompt="what is this", image=f1, reset=True,
                        temperature=0.0, max_new=4)

    mesh = pmesh.make_mesh(2, data=1)
    eng = VLMServingEngine(make_vlm(), n_slots=2, mesh=mesh)
    r = eng.submit([f1], "what is this", max_new=4, temperature=0.0)
    eng.run_until_idle()
    assert eng.text(r) == solo


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_main_boots_with_mesh(tmp_path):
    """Live server: `python -m clearcam_tpu --mesh 8` with a real (random
    init) detector on the 8-virtual-CPU mesh — synthetic camera frames flow
    through the dp-sharded detect path (metrics `frames` advances, zero
    detect/tracker errors)."""
    from clearcam_tpu.runtime.settings import GlobalSettings
    from clearcam_tpu.utils.db import KVStore

    db = KVStore(tmp_path / "cc_cache.db")
    db.run_put("links", "cam1", "synthetic://320x180")
    # small res: one quick CPU compile for the (8,180,320,3) bucket
    db.run_put("global_settings", "all",
               GlobalSettings(model_size="t", model_res=192))

    port = _free_port()
    env = dict(os.environ, PYTHONPATH=os.getcwd(), JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"),
               CLEARCAM_DTYPE="f32")
    proc = subprocess.Popen(
        [sys.executable, "-m", "clearcam_tpu", "--port", str(port),
         "--data", str(tmp_path), "--mesh", "8"],
        env=env, cwd=str(tmp_path), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    try:
        base = f"http://127.0.0.1:{port}"
        deadline = time.time() + 240
        snap = None
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(f"server exited rc={proc.returncode}:\n"
                                     + proc.stdout.read())
            try:
                snap = json.loads(urllib.request.urlopen(
                    f"{base}/metrics", timeout=2).read())
                if snap["counters"].get("frames", 0) >= 3:
                    break
            except Exception:
                pass
            time.sleep(1.0)
        assert snap is not None, "server never served /metrics"
        assert snap["counters"].get("frames", 0) >= 3, snap
        assert not snap["counters"].get("detect_errors"), snap
        assert not snap["counters"].get("tracker_errors"), snap
    finally:
        proc.send_signal(2)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
