"""Deterministic synthetic NVR-scale scene generator.

The reference pins its tracker e2e on MOT16-03 (156 unique persons,
/root/reference/test/run_mot.py:24-26) — that video is not downloadable
here, so this is the in-repo equivalent at NVR scale: a scripted
128-camera, 300-frame scene whose unique-id counts are an exact invariant
(tests/test_mot_scale.py pins them per camera).

Every camera gets an independent seeded script containing the events that
stress a tracker:

  * **births/deaths** — wanderers spawn staggered through the clip and
    leave permanently partway through,
  * **crossings** — a pair born on opposite edges walks through the same
    point mid-clip (association under full overlap),
  * **long occlusions** — one scripted object with a short gap
    (delta_t < gap < max_age: freeze -> unfreeze replay, SAME id survives)
    and a long gap (> max_age: the track dies and the reappearance takes a
    NEW id — the count invariant encodes exactly this),
  * **BYTE food** — periodic low-score dips into the 0.1..det_thresh band,
  * **non-person classes** — cars (class 2) that the person count must
    exclude.
"""
from __future__ import annotations

import numpy as np

W, H = 1920.0, 1080.0


def _clip_box(cx, cy, w, h):
    x1 = np.clip(cx - w / 2, 0, W - 1)
    y1 = np.clip(cy - h / 2, 0, H - 1)
    return [x1, y1, np.clip(cx + w / 2, 1, W), np.clip(cy + h / 2, 1, H)]


class _Obj:
    """One scripted object: linear bounce motion + visibility windows."""

    def __init__(self, rng, born, dies, cls, windows=None, speed_lo=4.0):
        self.born, self.dies, self.cls = born, dies, cls
        self.windows = windows            # None = always visible while alive
        self.cx = rng.uniform(150, W - 150)
        self.cy = rng.uniform(120, H - 120)
        sgn = rng.choice([-1.0, 1.0], 2)
        self.vx, self.vy = sgn * rng.uniform(speed_lo, 9.0, 2)
        self.w = rng.uniform(70, 170)
        self.h = rng.uniform(70, 170)
        self.dip_phase = int(rng.integers(0, 17))

    def step(self):
        self.cx += self.vx
        self.cy += self.vy
        if not 60 < self.cx < W - 60:
            self.vx *= -1
        if not 60 < self.cy < H - 60:
            self.vy *= -1
        self.cx = np.clip(self.cx, 55, W - 55)
        self.cy = np.clip(self.cy, 55, H - 55)

    def visible(self, t):
        if not self.born <= t < self.dies:
            return False
        if self.windows is None:
            return True
        return any(a <= t < b for a, b in self.windows)

    def row(self, t):
        score = 0.15 if (t + self.dip_phase) % 17 == 0 else 0.8
        return [*_clip_box(self.cx, self.cy, self.w, self.h),
                score, float(self.cls)]


def make_camera_script(cam: int, ticks: int = 300, seed: int = 7):
    """-> list[_Obj] for one camera (deterministic in (cam, seed))."""
    rng = np.random.default_rng(seed * 100003 + cam)
    objs = []
    # wanderers: staggered births, some die mid-clip (deaths)
    n_wander = 4 + cam % 3
    for i in range(n_wander):
        born = 12 * i
        dies = ticks if i % 2 == 0 else born + 130
        cls = 2 if i == n_wander - 1 else 0      # one car per camera
        objs.append(_Obj(rng, born, dies, cls))
    # crossing pair: opposite edges, meet mid-clip at the same y
    y = rng.uniform(300, H - 300)
    a = _Obj(rng, 5, ticks, 0)
    b = _Obj(rng, 5, ticks, 0)
    a.cx, a.cy, a.vx, a.vy = 160.0, y, 8.0, 0.5
    b.cx, b.cy, b.vx, b.vy = W - 160.0, y, -8.0, -0.5
    objs += [a, b]
    # occluder: short gap (replay, same id) then long gap (> max_age=100
    # -> death; reappearance = NEW id). Windows chosen for max_age=100:
    # tsu exceeds 100 at t=241, well before the t=260 reappearance.
    occ = _Obj(rng, 0, ticks, 0, windows=[(0, 80), (90, 140), (260, ticks)],
               speed_lo=6.0)
    objs.append(occ)
    return objs


def make_scene(n_cams: int = 128, ticks: int = 300, seed: int = 7):
    """-> frames: frames[t][cam] = [N,6] float64 (xyxy, score, cls)."""
    scripts = [make_camera_script(c, ticks, seed) for c in range(n_cams)]
    frames = []
    for t in range(ticks):
        per_cam = {}
        for c, objs in enumerate(scripts):
            rows = []
            for o in objs:
                if o.born <= t:
                    o.step()
                if o.visible(t):
                    rows.append(o.row(t))
            per_cam[c] = np.asarray(rows, np.float64).reshape(-1, 6)
        frames.append(per_cam)
    return frames
