"""Generate golden OC-SORT fixtures by replaying synthetic detection streams
through the reference tracker (/root/reference/ocsort_tracker — pure numpy).

Run once in the build environment where the reference snapshot is mounted:
    python tests/make_tracker_fixture.py
Writes tests/fixtures/ocsort_golden.npz. Tests only read the fixture; they do
not require /root/reference. This recreates the stripped tracks.pkl fixture
strategy of the reference test suite (test/test_ocsort.py).
"""
import sys
from pathlib import Path

import numpy as np

REF = "/root/reference"


def synth_stream(seed: int, n_frames: int = 120, n_obj: int = 6,
                 img=(1080.0, 1920.0)):
    """Random-walk boxes with noise, dropouts (occlusion), low-score frames
    (BYTE path), class flips, and late births."""
    rng = np.random.default_rng(seed)
    H, W = img
    pos = rng.uniform([0, 0], [W - 200, H - 200], (n_obj, 2))
    vel = rng.normal(0, 6, (n_obj, 2))
    size = rng.uniform(60, 180, (n_obj, 2))
    birth = rng.integers(0, 40, n_obj)
    death = rng.integers(80, n_frames + 40, n_obj)
    cls = rng.integers(0, 8, n_obj)
    frames = []
    for t in range(n_frames):
        pos = pos + vel + rng.normal(0, 1.5, (n_obj, 2))
        dets = []
        for i in range(n_obj):
            if not (birth[i] <= t < death[i]):
                continue
            # occlusion gaps to exercise freeze/unfreeze
            if (t + i * 7) % 23 in (0, 1, 2) and t > 10:
                continue
            x, y = pos[i]
            w, h = size[i] * (1 + 0.05 * np.sin(t / 9 + i))
            score = float(np.clip(rng.normal(0.75, 0.15), 0.05, 0.99))
            if (t + i) % 17 == 0:
                score = float(rng.uniform(0.12, 0.22))  # low-score (BYTE band)
            dets.append([x, y, x + w, y + h, score, float(cls[i])])
        frames.append(np.array(dets, np.float64).reshape(-1, 6))
    return frames


def run_reference(frames, det_thresh=0.25, max_age=30, use_byte=False):
    sys.path.insert(0, REF)
    from ocsort_tracker import ocsort as ref_ocsort
    trk = ref_ocsort.OCSort(max_age=max_age, use_byte=use_byte)
    outs = []
    for dets in frames:
        res = trk.update(dets if len(dets) else np.empty((0, 6)), det_thresh)
        rows = np.array([
            [*t.tlwh, t.score, t.class_id, t.track_id, t.tracklet_len, t.speed]
            for t in res], np.float64).reshape(-1, 9)
        outs.append(rows)
    return outs


def main():
    out = {}
    for name, seed, byte in [("a", 0, False), ("b", 1, False), ("byte", 2, True)]:
        frames = synth_stream(seed)
        golden = run_reference(frames, use_byte=byte)
        out[f"{name}_nframes"] = np.array(len(frames))
        for i, (f, g) in enumerate(zip(frames, golden)):
            out[f"{name}_in_{i}"] = f
            out[f"{name}_out_{i}"] = g
        out[f"{name}_use_byte"] = np.array(byte)
    fix = Path(__file__).parent / "fixtures"
    fix.mkdir(exist_ok=True)
    np.savez_compressed(fix / "ocsort_golden.npz", **out)
    print("wrote", fix / "ocsort_golden.npz")


if __name__ == "__main__":
    main()
