"""Exported-program bundles: serialize the fused detect graph, replay it
without model code, outputs match the live graph."""
import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.models import yolov9
from clearcam_tpu.tools.export import Replayer, export_detector


def test_export_and_replay_roundtrip(tmp_path):
    params = yolov9.init_params("t", seed=0)
    bundle = tmp_path / "det.ccprog"
    meta = export_detector(bundle, size="t", res=320, frame_hw=(240, 320),
                           batch=1, params=params)
    assert meta["input_shape"] == [1, 240, 320, 3]

    rep = Replayer(bundle)
    frames = np.random.default_rng(0).integers(0, 255, (1, 240, 320, 3),
                                               np.uint8)
    out = rep(frames)
    live = np.asarray(yolov9.detect(params, jnp.asarray(frames),
                                    size="t", res=320))
    np.testing.assert_allclose(out, live, rtol=1e-5, atol=1e-5)
