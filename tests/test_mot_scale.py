"""NVR-scale tracker e2e invariant — the in-repo MOT16 stand-in.

The reference's regression is `run_mot.py:24-26`: replay MOT16-03 through
detect+track and assert exactly 156 unique persons. That video cannot be
downloaded here (the real check lives in tests/test_weight_parity.py,
weight-gated), so this is the equivalent invariant the repo CAN run: a
scripted 128-camera, 300-frame scene (tests/make_scene.py — crossings,
births/deaths, short occlusions that must survive via freeze/replay, long
occlusions that must die and re-id, BYTE-band score dips, non-person
classes) with the per-camera unique-person counts pinned EXACTLY, counted
through the same filter chain run_mot uses (tools/mot.py:accumulate_people
== run_mot.py:20-25 semantics). Doubles as a MultiCamOCSort stress
regression: the batched tracker must match the per-camera OCSort oracle
track-for-track at this scale.

Invariant provenance: counts were produced by the per-camera OCSort oracle
(bit-parity with the reference tracker per tests/test_ocsort.py's golden
fixtures) on 2026-08-18 and are deterministic in (seed, scene script,
tracker math). Any change to association/kalman/lifecycle code that flips
one id on one camera fails this test.
"""
import numpy as np

from clearcam_tpu.tools.mot import accumulate_people
from clearcam_tpu.track.multicam import MultiCamOCSort
from clearcam_tpu.track.ocsort import OCSort

from make_scene import make_camera_script, make_scene
from test_multicam import tracks_equal

N_CAMS, TICKS = 128, 300

# pinned per-camera unique-person counts (seed=7). 7 + cam%3 is the
# event-structure floor (3..5 wandering persons + crossing pair + occluder
# re-id = 2); cameras above their floor had deterministic id switches
# during crossings/occlusions — part of the invariant, exactly like
# MOT16-03's 156 encodes the reference tracker's own switches.
EXPECTED = [7, 9, 9, 8, 8, 9, 7, 8, 10, 8, 8, 9, 8, 8, 9, 7, 9, 9, 7, 8,
            10, 7, 8, 9, 8, 9, 9, 7, 9, 9, 7, 9, 10, 7, 8, 10, 8, 9, 10,
            8, 9, 9, 7, 9, 9, 7, 9, 10, 7, 8, 9, 7, 8, 10, 7, 8, 9, 8, 9,
            10, 7, 8, 9, 7, 8, 9, 8, 8, 9, 7, 8, 9, 7, 8, 9, 8, 8, 10, 7,
            9, 9, 7, 8, 10, 7, 9, 10, 7, 8, 9, 7, 8, 10, 7, 9, 9, 7, 8, 9,
            7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8, 10, 7, 8, 10, 7, 8, 9, 8, 8,
            9, 8, 9, 9, 8, 8, 9, 7, 9]
EXPECTED_TOTAL = 1064


def test_nvr_scale_unique_person_invariant():
    """128 cameras x 300 frames through the batched tracker: every
    camera's unique-person count must be EXACT, with per-camera OCSort
    parity spot-checked track-for-track on the first 8 cameras."""
    frames = make_scene(n_cams=N_CAMS, ticks=TICKS, seed=7)
    trk = MultiCamOCSort(max_age=100)            # the NVR's config
    oracle = [OCSort(max_age=100) for _ in range(8)]
    people = [set() for _ in range(N_CAMS)]
    for per_cam in frames:
        out = trk.update_all(per_cam, 0.25)
        for c in range(N_CAMS):
            accumulate_people(people[c], out[c])
        for c in range(8):
            tracks_equal(out[c], oracle[c].update(per_cam[c], 0.25))
    counts = [len(p) for p in people]
    assert counts == EXPECTED, [
        (c, g, e) for c, (g, e) in enumerate(zip(counts, EXPECTED)) if g != e]
    assert sum(counts) == EXPECTED_TOTAL
    # floor structure: no camera can ever count below its scripted persons
    assert all(c >= 7 + i % 3 for i, c in enumerate(EXPECTED))


def test_occlusion_id_semantics():
    """The scripted occluder alone: a gap shorter than max_age must KEEP
    its id across freeze->unfreeze replay; a gap longer than max_age must
    produce a NEW id (reference lifecycle, ocsort.py update loop)."""
    objs = [o for o in make_camera_script(0, TICKS, seed=7)
            if o.windows is not None]
    assert len(objs) == 1
    occ = objs[0]
    trk = MultiCamOCSort(max_age=100)
    ids_by_window: list[set] = [set(), set(), set()]
    for t in range(TICKS):
        if occ.born <= t:
            occ.step()
        rows = [occ.row(t)] if occ.visible(t) else []
        out = trk.update_all({0: np.asarray(rows, np.float64).reshape(-1, 6)},
                             0.25)
        for w, (a, b) in enumerate(occ.windows):
            if a <= t < b:
                ids_by_window[w].update(int(tr.track_id) for tr in out[0])
    assert ids_by_window[0] == ids_by_window[1] == {1}   # replay kept id 1
    assert ids_by_window[2] == {2}                       # death -> new id
