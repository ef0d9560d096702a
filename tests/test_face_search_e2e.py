"""Face search end-to-end over HTTP: crop ingestion extracts + embeds a face
(stubbed detector geometry, tiny AdaFace), /event_thumbs is_face search finds
it via the face index."""
import json
import urllib.request

import numpy as np
import pytest

from clearcam_tpu.models import adaface
from clearcam_tpu.models.faces import FacePipeline
from clearcam_tpu.models.objects import ObjectFinder
from clearcam_tpu.runtime.nvr import NVR
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.server.http import AppContext, serve
from clearcam_tpu.utils.db import KVStore


def smooth_embed(face_rgb):
    """Deterministic, compression-robust stand-in embedder: 8x8 mean-pooled
    luminance, L2-normalized (the e2e exercises the ingest/index/HTTP
    plumbing; AdaFace numerics are covered by torch-parity tests)."""
    f = np.asarray(face_rgb, np.float32).mean(-1)
    pooled = f.reshape(8, 14, 8, 14).mean((1, 3)).reshape(-1)
    pooled = pooled - pooled.mean()
    return pooled / (np.linalg.norm(pooled) + 1e-9)


def tiny_face_pipeline():
    pipe = FacePipeline.__new__(FacePipeline)
    pipe.embed = smooth_embed
    # stub detection: a fixed centered face box + eyes (alignment still runs)
    pipe.detect_256 = lambda padded: (np.array([200.0, 200.0, 440.0, 440.0]),
                                      np.array([260.0, 280.0]),
                                      np.array([380.0, 280.0]))
    return pipe


@pytest.fixture
def stack(tmp_path):
    import cv2
    db = KVStore(tmp_path / "kv.db")
    finder = ObjectFinder(base_dir=tmp_path / "data" / "cameras",
                          weights_dir=tmp_path)
    finder.face_enabled = True
    finder._face = tiny_face_pipeline()
    nvr = NVR(db, tmp_path / "data", GlobalSettings(use_face=True),
              detector=None, object_finder=finder)
    ctx = AppContext(db, tmp_path / "data", nvr=nvr, object_finder=finder,
                     settings=nvr.settings)
    server = serve(ctx, port=0)
    yield f"http://127.0.0.1:{server.server_address[1]}", ctx, finder, tmp_path
    server.shutdown()


def test_face_ingest_and_search(stack):
    import cv2
    url, ctx, finder, tmp_path = stack
    # a distinctive "person" crop (class 0 => face extraction runs)
    day = tmp_path / "data" / "cameras" / "cam1" / "objects" / "2026-08-16"
    day.mkdir(parents=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (400, 400, 3), np.uint8)
    path = day / "10_1_0.jpg"
    cv2.imwrite(str(path), img[..., ::-1])
    finder.ingest_crop(path, img)

    # face crop + embeddings.pkl landed under faces/
    faces_day = tmp_path / "data" / "cameras" / "cam1" / "faces" / "2026-08-16"
    assert (faces_day / "10_1_0.jpg").exists()
    assert (faces_day / "embeddings.pkl").exists()

    # search by uploading the saved face image bytes over HTTP (decodes to
    # the exact stored pixels -> self-match scores 1.0)
    import base64
    b64 = base64.b64encode((faces_day / "10_1_0.jpg").read_bytes()).decode()
    req = urllib.request.Request(
        f"{url}/event_thumbs",
        data=json.dumps({"is_face": True,
                         "uploaded_image": "data:image/jpeg;base64," + b64
                         }).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        out = json.loads(r.read())
    assert out["count"] >= 1
    assert out["images"][0]["url"].endswith("10_1_0.jpg")
    assert out["images"][0]["score"] > 0.95


def test_face_search_disabled_without_setting(stack):
    url, ctx, *_ = stack
    ctx.settings.use_face = False
    req = urllib.request.Request(
        f"{url}/event_thumbs",
        data=json.dumps({"is_face": True, "image_text": "x"}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        out = json.loads(r.read())
    assert out == {"images": [], "count": 0}
