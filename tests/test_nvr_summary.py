"""Cooperative Qwen summaries: alert fires -> summary advances a few tokens
per tick (detect loop never blocks) -> notification sent with decoded text."""
import time

import numpy as np
import pytest

from clearcam_tpu.models import llm
from clearcam_tpu.models.qwen3vl import Qwen3VL, VisionTower
from clearcam_tpu.runtime.nvr import NVR
from clearcam_tpu.runtime.settings import GlobalSettings
from clearcam_tpu.utils.db import KVStore
from clearcam_tpu.utils.llm_tokenizer import LLMTokenizer
from clearcam_tpu.utils.tokenizer import byte_encoder

from test_nvr import ColorKeyDetector


def tiny_vlm():
    kv, vp = VisionTower.init_random(lang_dim=32)
    vision = VisionTower(kv, vp)
    cfg = llm.TransformerConfig(
        num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=260, head_dim=8, rope_theta=1e4, rope_dim=8,
        v_head_dim=8, max_context=512)
    lang = llm.Transformer(llm.init_params(cfg, seed=0), cfg, seed=0)
    be = byte_encoder()
    normal = {be[b]: b for b in range(256)}
    specials = {"<|im_start|>": 256, "<|im_end|>": 257,
                "<|vision_start|>": 258, "<|vision_end|>": 259}
    tok = LLMTokenizer(normal, specials, preset="qwen2", bos_id=None, eos_id=257)
    return Qwen3VL(res=(64, 64), lang=lang, tok=tok, vision=vision)


def test_summary_does_not_block_ticks(tmp_path):
    db = KVStore(tmp_path / "kv.db")
    db.run_put("links", "cam1", "synthetic://640x360")
    notifications = []
    nvr = NVR(db, tmp_path / "data",
              GlobalSettings(userID="uid", key="k", use_qwen=True),
              detector=ColorKeyDetector(), qwen=tiny_vlm(),
              notifier=lambda *a: notifications.append(a),
              uploader=lambda **kw: True)
    # run enough ticks for the track to mature (>1s) and the alert to fire
    nvr.run(max_ticks=80, tick_sleep=0.02)
    assert getattr(nvr, "_pending_summary", None) is not None or any(
        "AI Summary" in n[1] for n in notifications), \
        f"summary never started; notifications={notifications}"
    # keep ticking until the cooperative generation completes
    deadline = time.time() + 120
    while getattr(nvr, "_pending_summary", None) is not None \
            and time.time() < deadline:
        nvr.tick()
    nvr.stop()
    kinds = [n[1] for n in notifications]
    assert any(k.startswith("Event Detected") for k in kinds)
    assert any(k.startswith("AI Summary") for k in kinds), kinds
