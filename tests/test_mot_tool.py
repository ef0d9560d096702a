"""MOT tool e2e: synthetic multi-object clip -> tracker -> exact unique-person
count (the run_mot.py invariant style, test/run_mot.py:25)."""
import numpy as np
import pytest


COLORS = [(40, 180, 240), (240, 40, 180), (180, 240, 40)]


class MultiColorDetector:
    """One class-0 detection per known color blob."""

    def detect_many(self, frames):
        out = []
        for f in frames:
            rows = []
            for c in COLORS:
                mask = (np.abs(f.astype(int) - np.array(c)).sum(-1) < 120)
                ys, xs = np.where(mask)
                if len(xs) >= 50:
                    rows.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1,
                                 0.9, 0.0])
            out.append(np.array(rows, np.float64).reshape(-1, 6))
        return out


def write_clip(path, n_frames=80, w=480, h=240):
    import cv2
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    rng = np.random.default_rng(1)
    base = rng.integers(0, 40, (h, w, 3), np.uint8)
    for t in range(n_frames):
        f = base.copy()
        # person 0: present the whole time, moving right
        x = 5 + t * 4
        f[30:120, x % (w - 70):x % (w - 70) + 60] = COLORS[0]
        # person 1: enters at frame 25
        if t >= 25:
            y = 10 + (t - 25) * 2          # stays in frame (no wrap -> one id)
            f[y:y + 80, 300:360] = COLORS[1]
        # person 2: only frames 40-70
        if 40 <= t < 70:
            f[140:220, 60 + (t - 40) * 5:120 + (t - 40) * 5] = COLORS[2]
        vw.write(f)
    vw.release()


def test_unique_person_invariant(tmp_path):
    from clearcam_tpu.tools.mot import run_mot
    clip = tmp_path / "clip.mp4"
    write_clip(clip)
    count, frames = run_mot(str(clip), detector=MultiColorDetector())
    assert count == 3
    assert any(len(f) >= 2 for f in frames)  # overlapping presence tracked


def test_rfdetr_detector_runs_clip(tmp_path):
    """The RF-DETR forward plugs into the MOT pipeline end-to-end (reference
    run_mot.py:36-51 exercises both detectors on the same clip)."""
    from clearcam_tpu.models.rfdetr import RFDETR
    from clearcam_tpu.tools.mot import run_mot
    from tests.test_rfdetr import TINY

    clip = tmp_path / "clip.mp4"
    write_clip(clip, n_frames=6)
    count, frames = run_mot(str(clip), detector=RFDETR(TINY),
                            max_frames=6)
    assert isinstance(count, int) and len(frames) == 6


def test_annotated_output(tmp_path):
    import cv2
    from clearcam_tpu.tools.mot import run_mot
    clip = tmp_path / "clip.mp4"
    out = tmp_path / "out.mp4"
    write_clip(clip, n_frames=30)
    run_mot(str(clip), detector=MultiColorDetector(), out_path=str(out))
    cap = cv2.VideoCapture(str(out))
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 30
    cap.release()
