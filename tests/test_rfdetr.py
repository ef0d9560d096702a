"""RF-DETR support pieces: 91->80 remap and DETR postprocess semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from clearcam_tpu.models.rfdetr import (DETRDetector, detr_postprocess,
                                        detr_to_yolo, remap_class_ids)


def test_remap_known_ids():
    assert detr_to_yolo[1] == 0        # person
    assert detr_to_yolo[3] == 2        # car
    assert detr_to_yolo[90] == 79      # toothbrush
    assert 12 not in detr_to_yolo      # gap id (street sign) absent
    assert len(detr_to_yolo) == 80


def test_remap_vectorized_marks_gaps():
    out = np.asarray(remap_class_ids([1, 12, 3, 91]))
    assert out.tolist() == [0, -1, 2, -1]


def test_postprocess_decodes_and_thresholds():
    q = 5
    logits = np.full((1, q, 92), -10.0, np.float32)
    boxes = np.zeros((1, q, 4), np.float32)
    # query 0: confident person at center
    logits[0, 0, 1] = 10.0
    boxes[0, 0] = [0.5, 0.5, 0.2, 0.4]
    # query 1: confident background -> dropped
    logits[0, 1, 91] = 10.0
    # query 2: gap class id 12 -> dropped
    logits[0, 2, 12] = 10.0
    out = np.asarray(detr_postprocess(jnp.asarray(logits), jnp.asarray(boxes),
                                      (100, 200), conf_threshold=0.5))
    live = out[0][out[0][:, 4] > 0]
    assert live.shape[0] == 1
    x1, y1, x2, y2, score, cls = live[0]
    np.testing.assert_allclose([x1, y1, x2, y2], [80.0, 30.0, 120.0, 70.0],
                               rtol=1e-5)
    assert cls == 0 and score > 0.9


def test_detr_detector_plugs_into_tracker():
    from clearcam_tpu.track.ocsort import OCSort

    def fake_query(frames):
        b = frames.shape[0]
        logits = jnp.full((b, 3, 92), -10.0)
        logits = logits.at[:, 0, 1].set(10.0)
        boxes = jnp.zeros((b, 3, 4)).at[:, 0].set(
            jnp.asarray([0.5, 0.5, 0.3, 0.3]))
        return logits, boxes

    det = DETRDetector(fake_query, (240, 320))
    trk = OCSort()
    for _ in range(5):
        rows = det.detect_many([np.zeros((240, 320, 3), np.uint8)])[0]
        tracks = trk.update(rows, 0.25)
    assert tracks and int(tracks[0].class_id) == 0
