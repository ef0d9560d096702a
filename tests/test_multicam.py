"""MultiCamOCSort parity: the cross-camera batched tracker must produce
exactly what one per-camera OCSort produces — same ids, boxes, scores,
speeds — across spawns, occlusions (missed frames -> freeze/unfreeze
replay), class flips, and deaths."""
import os

import numpy as np
import pytest

from clearcam_tpu.track.multicam import MultiCamOCSort
from clearcam_tpu.track.ocsort import OCSort


def make_streams(n_cams=6, n_obj=7, ticks=80, seed=3):
    """Bouncing boxes with dropouts (occlusion), low-score dips (BYTE food),
    and per-object classes."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(200, 1500, (n_cams, n_obj, 2))
    vel = rng.normal(0, 6, (n_cams, n_obj, 2))
    wh = rng.uniform(60, 180, (n_cams, n_obj, 2))
    cls = rng.integers(0, 3, (n_cams, n_obj)).astype(float)
    frames = []
    for t in range(ticks):
        pos += vel
        # bounce
        for d, lim in ((0, 1920), (1, 1080)):
            hit = (pos[..., d] < 50) | (pos[..., d] > lim - 50)
            vel[..., d][hit] *= -1
        pos[..., 0] = np.clip(pos[..., 0], 50, 1870)
        pos[..., 1] = np.clip(pos[..., 1], 50, 1030)
        per_cam = []
        for c in range(n_cams):
            rows = []
            for o in range(n_obj):
                # random dropouts create gaps -> unfreeze replay
                if rng.uniform() < 0.12:
                    continue
                score = 0.8 if rng.uniform() > 0.15 else 0.15  # BYTE band
                x, y = pos[c, o]
                w, h = wh[c, o]
                rows.append([x - w / 2, y - h / 2, x + w / 2, y + h / 2,
                             score, cls[c, o]])
            per_cam.append(np.array(rows, np.float64).reshape(-1, 6))
        frames.append(per_cam)
    return frames


def tracks_equal(a, b):
    assert len(a) == len(b)
    for ta, tb in zip(a, b):
        np.testing.assert_allclose(ta.tlwh, tb.tlwh, rtol=1e-9, atol=1e-9)
        assert ta.track_id == tb.track_id
        assert ta.class_id == tb.class_id
        assert ta.score == tb.score
        np.testing.assert_allclose(ta.speed, tb.speed, rtol=1e-9, atol=1e-9)
        assert ta.tracklet_len == tb.tracklet_len


@pytest.mark.parametrize("use_byte", [False, True])
@pytest.mark.parametrize("seed", [3, 11, 29])
def test_multicam_matches_per_camera_ocsort(use_byte, seed):
    n_cams = 6
    frames = make_streams(n_cams=n_cams, seed=seed)
    ref = [OCSort(max_age=8, use_byte=use_byte) for _ in range(n_cams)]
    multi = MultiCamOCSort(max_age=8, use_byte=use_byte)
    for per_cam in frames:
        out_multi = multi.update_all({c: per_cam[c] for c in range(n_cams)},
                                     0.3)
        for c in range(n_cams):
            out_ref = ref[c].update(per_cam[c], 0.3)
            tracks_equal(out_multi[c], out_ref)


def test_multicam_late_join_and_absent_cameras():
    """A camera joining late gets a fresh min_hits grace; cameras absent from
    a tick are not advanced."""
    frames = make_streams(n_cams=2, ticks=30, seed=9)
    ref0, ref1 = OCSort(max_age=8), OCSort(max_age=8)
    multi = MultiCamOCSort(max_age=8)
    for t, per_cam in enumerate(frames):
        feed = {0: per_cam[0]}
        if t >= 10:
            feed[1] = per_cam[1]
        out = multi.update_all(feed, 0.3)
        tracks_equal(out[0], ref0.update(per_cam[0], 0.3))
        if t >= 10:
            tracks_equal(out[1], ref1.update(per_cam[1], 0.3))


@pytest.mark.parametrize("name", ["a", "b", "byte"])
def test_multicam_golden_fixture_parity(name):
    """The reference-recorded golden fixtures (bit-parity vs the reference
    tracker) also hold through MultiCamOCSort — run THREE copies of the
    fixture as three concurrent cameras to exercise the cross-camera
    batching, all must match the recording."""
    from pathlib import Path
    data = np.load(Path(__file__).parent / "fixtures" / "ocsort_golden.npz")
    n = int(data[f"{name}_nframes"])
    use_byte = bool(data[f"{name}_use_byte"])
    trk = MultiCamOCSort(max_age=30, use_byte=use_byte)
    for i in range(n):
        dets = data[f"{name}_in_{i}"]
        golden = data[f"{name}_out_{i}"]
        outs = trk.update_all({c: dets for c in range(3)}, 0.25)
        for c in range(3):
            got = np.array([
                [*t.tlwh, t.score, t.class_id, t.track_id, t.tracklet_len,
                 t.speed] for t in outs[c]], np.float64).reshape(-1, 9)
            assert got.shape == golden.shape, f"cam {c} frame {i}"
            if golden.size:
                np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-8,
                                           err_msg=f"cam {c} frame {i}")


def test_multicam_per_camera_thresholds():
    """det_thresh as a dict applies each camera's own threshold (the NVR's
    per-camera zone settings, clearcam.py:585)."""
    multi = MultiCamOCSort(max_age=8)
    refs = {c: OCSort(max_age=8) for c in ("strict", "loose")}
    rows = np.array([[100, 100, 200, 200, 0.45, 0.0]])   # mid-confidence
    for _ in range(6):
        out = multi.update_all({"strict": rows, "loose": rows},
                               {"strict": 0.6, "loose": 0.3})
        tracks_equal(out["strict"], refs["strict"].update(rows, 0.6))
        tracks_equal(out["loose"], refs["loose"].update(rows, 0.3))
    assert multi.next_id.get(multi._cam_ids["loose"], 0) >= 1
    assert multi.next_id.get(multi._cam_ids["strict"], 0) == 0


def test_multicam_empty_frames_and_death():
    multi = MultiCamOCSort(max_age=2)
    ref = OCSort(max_age=2)
    det = np.array([[100, 100, 200, 200, 0.9, 0.0]])
    empty = np.zeros((0, 6))
    seq = [det] * 5 + [empty] * 700 + [det] * 3
    for rows in seq:
        out = multi.update_all({0: rows}, 0.3)
        tracks_equal(out[0], ref.update(rows, 0.3))
    assert len(multi) == len(ref)


@pytest.mark.skipif(not os.environ.get("CLEARCAM_WIDE_FUZZ"),
                    reason="wide parity fuzz (~3 min): CLEARCAM_WIDE_FUZZ=1 "
                           "(42 configs passed 2026-08-17)")
def test_multicam_wide_fuzz():
    """7 seeds x {1,3,12} cameras x byte on/off, 60 ticks each — exact
    output parity of the batched tracker vs the per-camera oracle."""
    for seed in (0, 1, 2, 7, 13, 42, 99):
        for n_cams in (1, 3, 12):
            for use_byte in (False, True):
                frames = make_streams(n_cams=n_cams, ticks=60, seed=seed)
                ref = [OCSort(max_age=8, use_byte=use_byte)
                       for _ in range(n_cams)]
                multi = MultiCamOCSort(max_age=8, use_byte=use_byte)
                for t in range(60):
                    dets = {c: frames[t][c] for c in range(n_cams)}
                    got = multi.update_all(dets, 0.25)
                    for c in range(n_cams):
                        want = ref[c].update(dets[c], 0.25)
                        assert len(want) == len(got[c])
                        for w, g in zip(want, got[c]):
                            assert (w.track_id == g.track_id
                                    and w.class_id == g.class_id)
                            np.testing.assert_allclose(w.tlwh, g.tlwh,
                                                       rtol=1e-9, atol=1e-9)
