"""Face pipeline: BlazeFace graph/decode, AdaFace embedder, alignment
geometry (with a stubbed detector so alignment is testable without real
weights)."""
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.models import adaface, blazeface
from clearcam_tpu.models.faces import FacePipeline, TARGET_LEFT_EYE, TARGET_RIGHT_EYE


def test_blazeface_forward_shapes():
    p = blazeface.init_params()
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    raw, scores = blazeface.forward(p, x)
    assert raw.shape == (1, 896, 16)
    assert scores.shape == (1, 896, 1)


def test_blazeface_decode_masks_low_scores():
    p = blazeface.init_params()
    raw = jnp.zeros((1, 896, 16))
    # one anchor confident, rest ~0.5 (below the 0.85 floor)
    scores = jnp.full((1, 896, 1), -3.0)
    scores = scores.at[0, 3, 0].set(10.0)
    rows = np.asarray(blazeface.decode(p, raw, scores))[0]
    live = rows[rows[:, 16] > 0]
    assert live.shape[0] == 1
    assert live[0, 16] > 0.99


def test_adaface_shapes_and_norm():
    p = adaface.init_params(blocks=adaface.BLOCKS_MINI)
    faces = jnp.zeros((2, 112, 112, 3), jnp.uint8)
    emb = np.asarray(adaface.embed(p, faces))
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)


def test_face_align_embed_e2e_golden():
    """Full align->embed numeric regression net (round-4 VERDICT #3): replay
    the recorded pipeline (tests/make_face_golden.py — stubbed detection,
    real warp geometry, full 24-block IR-50 embed on seeded weights) and
    demand bit-tight agreement with the committed fixture."""
    import make_face_golden as g

    fix = Path(__file__).parent / "fixtures" / "face_e2e_golden.npz"
    crop, emb = g.run_pipeline()
    with np.load(fix) as z:
        np.testing.assert_array_equal(crop, z["crop"])     # warp is integer-exact
        np.testing.assert_allclose(emb, z["embedding"], rtol=0, atol=2e-6)


def test_alignment_puts_eyes_on_canonical_positions(tmp_path):
    """Stub detect_256 with a known face box + eye points; the produced
    112x112 crop must place those eyes at (38,51)/(73,51)."""
    pipe = FacePipeline.__new__(FacePipeline)  # skip weight loading

    img = np.zeros((640, 640, 3), np.uint8)
    le_src, re_src = np.array([280.0, 300.0]), np.array([360.0, 320.0])
    # draw unique markers at the eye positions
    img[int(le_src[1]) - 2:int(le_src[1]) + 3,
        int(le_src[0]) - 2:int(le_src[0]) + 3] = (255, 0, 0)
    img[int(re_src[1]) - 2:int(re_src[1]) + 3,
        int(re_src[0]) - 2:int(re_src[0]) + 3] = (0, 255, 0)

    def fake_detect(padded):
        return (np.array([250.0, 250.0, 400.0, 390.0]), le_src.copy(), re_src.copy())

    pipe.detect_256 = fake_detect
    face = pipe.extract_face(img)
    assert face is not None and face.shape == (112, 112, 3)
    # the markers should land at the canonical eye positions (+-2px warp blur)
    ly, lx = np.unravel_index(face[..., 0].argmax(), face[..., 0].shape)
    ry, rx = np.unravel_index(face[..., 1].argmax(), face[..., 1].shape)
    assert abs(lx - TARGET_LEFT_EYE[0]) <= 2 and abs(ly - TARGET_LEFT_EYE[1]) <= 2
    assert abs(rx - TARGET_RIGHT_EYE[0]) <= 2 and abs(ry - TARGET_RIGHT_EYE[1]) <= 2


def test_small_face_rejected():
    pipe = FacePipeline.__new__(FacePipeline)
    pipe.detect_256 = lambda padded: (np.array([10.0, 10, 40, 40]),
                                      np.array([15.0, 20]), np.array([35.0, 20]))
    assert pipe.extract_face(np.zeros((640, 640, 3), np.uint8)) is None
