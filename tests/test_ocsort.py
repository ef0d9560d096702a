"""OC-SORT parity: replay golden fixtures recorded from the reference tracker
(see make_tracker_fixture.py) and assert bit-level agreement of the emitted
tracks (tlwh, score, class, id, age, speed) — the same regression style as
the reference's test_ocsort.py (rtol 1e-5 on recorded tracks)."""
from pathlib import Path

import numpy as np
import pytest

from clearcam_tpu.track.ocsort import OCSort, Track, greedy_assignment, iou_batch

FIXTURE = Path(__file__).parent / "fixtures" / "ocsort_golden.npz"


@pytest.mark.parametrize("name", ["a", "b", "byte"])
def test_golden_parity(name):
    data = np.load(FIXTURE)
    n = int(data[f"{name}_nframes"])
    use_byte = bool(data[f"{name}_use_byte"])
    trk = OCSort(max_age=30, use_byte=use_byte)
    for i in range(n):
        dets = data[f"{name}_in_{i}"]
        golden = data[f"{name}_out_{i}"]
        out = trk.update(dets, 0.25)
        got = np.array([
            [*t.tlwh, t.score, t.class_id, t.track_id, t.tracklet_len, t.speed]
            for t in out], np.float64).reshape(-1, 9)
        assert got.shape == golden.shape, f"frame {i}: {got.shape} vs {golden.shape}"
        if golden.size:
            np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-8,
                                       err_msg=f"frame {i}")


def test_empty_frames():
    trk = OCSort()
    for _ in range(5):
        assert trk.update(np.zeros((0, 6)), 0.25) == []


def test_track_identity_through_occlusion():
    """A steadily moving object keeps its id across a 5-frame dropout
    (freeze/unfreeze path)."""
    trk = OCSort(max_age=30)
    ids = []
    for t in range(40):
        if 15 <= t < 20:
            dets = np.zeros((0, 6))
        else:
            x = 100.0 + 8 * t
            dets = np.array([[x, 100, x + 80, 260, 0.9, 0.0]])
        out = trk.update(dets, 0.25)
        if out:
            ids.append(out[0].track_id)
    assert len(set(ids)) == 1


def test_greedy_assignment_prefers_low_cost():
    cost = np.array([[0.5, 0.1], [0.2, 0.9]])
    m = greedy_assignment(cost)
    assert {tuple(r) for r in m} == {(0, 1), (1, 0)}


def test_iou_batch_basic():
    a = np.array([[0, 0, 10, 10.0]])
    b = np.array([[0, 0, 10, 10.0], [5, 5, 15, 15.0]])
    iou = iou_batch(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(25 / 175)


def test_track_tlbr():
    t = Track(tlwh=np.array([10.0, 20, 30, 40]), score=0.9, class_id=0, track_id=1)
    np.testing.assert_allclose(t.tlbr, [10, 20, 40, 60])
