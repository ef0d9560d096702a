"""Generate the align->embed e2e golden fixture for the face pipeline.

Replays the full alignment path (pad-to-640, detect [stubbed with a fixed
box + eye keypoints so no trained detector is needed], rotate/scale so the
eyes land on the canonical (38,51)/(73,51) positions, 112x112 crop —
reference objects.py:263-354) followed by the full 24-block IR-50 AdaFace
embed on seeded random weights, and records the crop + embedding.

Run once (CPU):  python tests/make_face_golden.py
Writes tests/fixtures/face_e2e_golden.npz; tests/test_faces.py replays the
same pipeline and asserts bit-tight agreement — a numeric regression net
over warp geometry, interpolation, layout, and the embed graph.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")     # fixture must be CPU-exact

FIX = Path(__file__).resolve().parent / "fixtures" / "face_e2e_golden.npz"

BOX = np.array([95.0, 88.0, 228.0, 215.0])        # y1,x1,y2,x2 in padded-640
LEFT_EYE = np.array([126.0, 132.0])               # x,y
RIGHT_EYE = np.array([178.0, 128.0])              # slightly rotated face


def run_pipeline():
    from clearcam_tpu.models import adaface
    from clearcam_tpu.models.faces import FacePipeline
    from clearcam_tpu.tools.parity import synthetic_face

    pipe = FacePipeline.__new__(FacePipeline)     # skip weight loading
    pipe.detect_256 = lambda padded: (BOX.copy(), LEFT_EYE.copy(),
                                      RIGHT_EYE.copy())
    img = synthetic_face()                        # deterministic 300x300 RGB
    crop = pipe.extract_face(img)
    assert crop is not None and crop.shape == (112, 112, 3)

    import jax.numpy as jnp
    p = adaface.init_params(seed=12)              # full 24-block IR-50
    emb = np.asarray(adaface.embed(p, jnp.asarray(crop[None])))[0]
    return crop, emb


if __name__ == "__main__":
    crop, emb = run_pipeline()
    np.savez_compressed(FIX, crop=crop, embedding=emb.astype(np.float32))
    print(f"wrote {FIX}: crop {crop.shape} emb norm "
          f"{np.linalg.norm(emb):.6f}")
