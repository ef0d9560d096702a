"""Qwen3-VL: vision tower geometry + VLM image->prompt->text flow on a tiny
synthetic model (no weights needed)."""
import numpy as np
import pytest

from clearcam_tpu.models import llm
from clearcam_tpu.models.qwen3vl import (Qwen3VL, VisionTower,
                                         bilinear_pos_weights, position_ids,
                                         window_order)
from clearcam_tpu.utils.llm_tokenizer import LLMTokenizer
from clearcam_tpu.utils.tokenizer import byte_encoder


def test_window_order_2x2():
    # 4x4 grid, merge 2: first window = patches (0,1,4,5)
    order = window_order(4, 4, 2)
    assert order[:4].tolist() == [0, 1, 4, 5]
    assert sorted(order.tolist()) == list(range(16))


def test_position_ids_follow_windows():
    pid = position_ids(4, 4, 2)
    assert pid[:4].tolist() == [[0, 0], [0, 1], [1, 0], [1, 1]]


def test_bilinear_weights_sum_to_one():
    idx, wgt = bilinear_pos_weights(6, 8, 16, 2)
    assert idx.shape == (4, 48) and wgt.shape == (4, 48)
    np.testing.assert_allclose(wgt.sum(0), 1.0, rtol=1e-6)
    assert idx.max() < 16 * 16


def make_vlm():
    kv, vp = VisionTower.init_random(lang_dim=32)
    vision = VisionTower(kv, vp)
    cfg = llm.TransformerConfig(
        num_blocks=2, dim=32, hidden_dim=64, n_heads=4, n_kv_heads=2,
        norm_eps=1e-5, vocab_size=260, head_dim=8, rope_theta=10000.0,
        rope_dim=8, v_head_dim=8, max_context=512)
    params = llm.init_params(cfg, seed=0)
    lang = llm.Transformer(params, cfg, seed=0)
    be = byte_encoder()
    normal = {be[b]: b for b in range(256)}
    specials = {"<|im_start|>": 256, "<|im_end|>": 257,
                "<|vision_start|>": 258, "<|vision_end|>": 259}
    tok = LLMTokenizer(normal, specials, preset="qwen2", bos_id=None, eos_id=257)
    return Qwen3VL(res=(64, 64), lang=lang, tok=tok, vision=vision)


def test_vision_tower_shapes():
    kv, vp = VisionTower.init_random(lang_dim=32)
    tower = VisionTower(kv, vp)
    img = np.random.default_rng(0).uniform(0, 255, (64, 64, 3)).astype(np.float32)
    import jax.numpy as jnp
    embeds, deep = tower(jnp.asarray(img))
    # 64/16=4 -> 16 patches -> 4 merged tokens
    assert embeds.shape == (4, 32)
    assert len(deep) == 1 and deep[0].shape == (4, 32)


def test_vlm_image_then_prompt():
    vlm = make_vlm()
    frame = np.zeros((48, 80, 3), np.uint8)   # letterboxed to 64x64
    text = vlm.generate(prompt="what is this", image=frame, reset=True,
                        temperature=0.0, max_new=4)
    assert isinstance(text, str)
    pos_one = vlm.start_pos
    # second image without reset continues the stream
    vlm.generate(image=frame)
    assert vlm.start_pos > pos_one
    # reset rewinds the context
    vlm.generate(image=frame, reset=True)
    assert vlm.start_pos == vlm.toks_per_img + len(vlm._prefix) + len(vlm._suffix)


def test_vlm_deterministic_at_temp0():
    vlm = make_vlm()
    frame = np.full((64, 64, 3), 128, np.uint8)
    a = vlm.generate(prompt="x", image=frame, reset=True, temperature=0.0,
                     max_new=3)
    b = vlm.generate(prompt="x", image=frame, reset=True, temperature=0.0,
                     max_new=3)
    assert a == b
