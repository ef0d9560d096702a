"""Qwen3-VL through the continuous-batching engine: image segments via the
slot-lifted vision prefill, concurrent summaries token-exact vs the solo
Qwen3VL.generate path (reference serializes these: clearcam.py:494-496)."""
import numpy as np

from clearcam_tpu.serving.vlm import VLMServingEngine

from test_qwen3vl import make_vlm


def _solo(vlm, images, prompt, n):
    out = vlm.generate(prompt=prompt, image=images[0], reset=True,
                       temperature=0.0, max_new=n) if len(images) == 1 \
        else None
    if out is None:
        vlm.generate(image=images[0], reset=True)
        for img in images[1:-1]:
            vlm.generate(image=img)
        out = vlm.generate(prompt=prompt, image=images[-1],
                           temperature=0.0, max_new=n)
    return out


def test_concurrent_summaries_match_solo():
    vlm = make_vlm()
    f1 = np.full((64, 64, 3), 128, np.uint8)
    f2 = np.zeros((48, 80, 3), np.uint8)          # letterboxed path
    solo1 = _solo(vlm, [f1], "what is this", 4)
    solo2 = _solo(vlm, [f2], "describe", 4)

    eng = VLMServingEngine(vlm, n_slots=2)
    r1 = eng.submit([f1], "what is this", max_new=4, temperature=0.0)
    eng.step()                                     # r1's image mid-flight
    r2 = eng.submit([f2], "describe", max_new=4, temperature=0.0)
    eng.run_until_idle()
    assert eng.text(r1) == solo1
    assert eng.text(r2) == solo2


def test_multi_image_request():
    """Two frames streamed into one slot (the NVR feeds prev+last frame,
    runtime/nvr.py _summary_steps) then the prompt — equals the solo
    multi-feed flow."""
    vlm = make_vlm()
    f1 = np.full((64, 64, 3), 40, np.uint8)
    f2 = np.full((64, 64, 3), 200, np.uint8)
    solo = _solo(vlm, [f1, f2], "what changed", 4)

    eng = VLMServingEngine(vlm, n_slots=2)
    r = eng.submit([f1, f2], "what changed", max_new=4, temperature=0.0)
    eng.run_until_idle()
    assert eng.text(r) == solo


def test_slot_reuse_after_vlm_request():
    """A retired VLM request's cache leftovers (image K/V) must not leak
    into the slot's next occupant."""
    vlm = make_vlm()
    f1 = np.full((64, 64, 3), 90, np.uint8)
    solo_a = _solo(vlm, [f1], "first", 3)
    solo_b = _solo(vlm, [f1], "second", 3)

    eng = VLMServingEngine(vlm, n_slots=1)
    ra = eng.submit([f1], "first", max_new=3, temperature=0.0)
    rb = eng.submit([f1], "second", max_new=3, temperature=0.0)
    eng.run_until_idle()
    assert eng.text(ra) == solo_a
    assert eng.text(rb) == solo_b
