"""CLIP-description alerts: crop embedding vs alert text embedding fires a
notification + clip upload when similarity crosses the threshold
(clearcam.py:1278-1307)."""
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from clearcam_tpu.models import clip
from clearcam_tpu.models.objects import ObjectFinder
from clearcam_tpu.runtime.counters import RollingClassCounter
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.utils.db import KVStore
from clearcam_tpu.utils.tokenizer import CLIPTokenizer


class NvrStub:
    def __init__(self, db, base_dir):
        self.db = db
        self.base_dir = base_dir
        self.settings = GlobalSettings(userID="uid", key="k", use_clip=True)


@pytest.fixture
def env(tmp_path, monkeypatch):
    db = KVStore(tmp_path / "kv.db")
    finder = ObjectFinder(base_dir=tmp_path / "data" / "cameras",
                          weights_dir=tmp_path)
    finder.init_clip(params=clip.init_params(seed=0, img_blocks=2, txt_blocks=2))
    finder._tok = CLIPTokenizer(merges=[("h", "i</w>")])   # tiny vocab works

    sent, uploaded = [], []
    import clearcam_tpu.cloud.relay as relay
    monkeypatch.setattr(relay, "send_notif", lambda *a, **k: sent.append(a))
    monkeypatch.setattr(relay, "export_and_upload",
                        lambda **kw: uploaded.append(kw))
    nvr = NvrStub(db, tmp_path / "data")
    return db, finder, nvr, sent, uploaded, tmp_path


def make_crop(tmp_path):
    import cv2
    day = tmp_path / "data" / "cameras" / "cam1" / "objects" / "2026-08-16"
    day.mkdir(parents=True, exist_ok=True)
    img = np.random.default_rng(0).integers(0, 255, (160, 160, 3), np.uint8)
    path = day / "42_3_0.jpg"
    cv2.imwrite(str(path), img[..., ::-1])
    return path, img


def test_desc_alert_fires(env):
    db, finder, nvr, sent, uploaded, tmp_path = env
    alert = RollingClassCounter(max=1, classes={0}, cam_name="cam1",
                                desc="hi", threshold=-1.0)  # always crosses
    alert.last_det = 0
    db.run_put("alerts", "cam1", alert, id="a1")
    path, img = make_crop(tmp_path)

    finder.ingest_crop(path, img, nvr=nvr)

    assert sent and "cam1" in sent[0][1] and "hi" in sent[0][1]
    # wait for the upload thread the flow spawns
    deadline = time.time() + 5
    while not uploaded and time.time() < deadline:
        time.sleep(0.02)
    assert uploaded and uploaded[0]["cam_name"] == "cam1"
    assert uploaded[0]["start"] == 42
    # desc embedding + last_det persisted back to the KV store
    stored = db.run_get("alerts", "cam1", id="a1")
    assert stored.desc_emb is not None
    assert stored.last_det > 0


def test_desc_alert_respects_threshold_and_cooldown(env):
    db, finder, nvr, sent, uploaded, tmp_path = env
    # threshold 2.0 can never be crossed by a cosine similarity
    never = RollingClassCounter(max=1, classes={0}, cam_name="cam1",
                                desc="hi", threshold=2.0)
    never.last_det = 0
    db.run_put("alerts", "cam1", never, id="n1")
    # recently-fired alert is in cooldown (60s, clearcam.py:1293)
    recent = RollingClassCounter(max=1, classes={0}, cam_name="cam1",
                                 desc="hi", threshold=-1.0)
    recent.last_det = time.time()
    db.run_put("alerts", "cam1", recent, id="r1")

    path, img = make_crop(tmp_path)
    finder.ingest_crop(path, img, nvr=nvr)
    assert sent == []
