"""Cross-camera batched OC-SORT.

`OCSort` (ocsort.py) is the per-camera reference implementation — bit-parity
with the golden fixtures. At NVR scale (32-128 cameras) running one Python
update per camera per tick is overhead-bound: the numpy calls are tiny and
per-call cost dominates (profiled ~1.1 ms/camera ≈ 24 streams @30fps on one
core).

`MultiCamOCSort` holds EVERY camera's tracks in one SoA store and runs the
per-frame math globally, mirroring how the detector batches frames across
cameras (runtime/nvr.py BatchDetector):

  * one batched Kalman predict over all tracks of all cameras
  * one vectorized k-previous-observation lookup (ring buffer, no dicts)
  * IoU + velocity-direction costs as a single padded [C, Nmax, Mmax] tensor
  * per-camera matching on slices (greedy solve only when the adjacency
    shortcut fails — reference association.py:85-94 semantics)
  * one batched Kalman update for every match across all cameras
  * batched spawns; per-camera id counters so outputs match per-camera OCSort

Output parity: update_all(dets_per_cam) produces exactly what one OCSort per
camera would (same ids, boxes, scores — tested in tests/test_multicam.py).
"""
from __future__ import annotations

import numpy as np

from .kalman import BatchKalman, bbox_to_z, z_to_bbox
from .ocsort import Track, associate, greedy_assignment, iou_batch

# ring-age sentinel: must never equal a lookup target (targets reach
# age-delta_t, which can be slightly negative for young tracks)
_NEVER = -1e9


def _iou3(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[C,N,5] x [C,M,5] -> [C,N,M] IoU; cell-for-cell the math of
    ocsort.iou_batch (padded cells may be nan — sliced away by the caller)."""
    a = a[:, :, None, :]
    b = b[:, None, :, :]
    x1 = np.maximum(a[..., 0], b[..., 0])
    y1 = np.maximum(a[..., 1], b[..., 1])
    x2 = np.minimum(a[..., 2], b[..., 2])
    y2 = np.minimum(a[..., 3], b[..., 3])
    inter = np.maximum(0.0, x2 - x1) * np.maximum(0.0, y2 - y1)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter)


def _angle_cost3(dets, prev, vel, vdc_weight):
    """Batched ocsort._angle_cost: [C,N,5],[C,M,5],[C,M,2] -> [C,N,M]."""
    dcx = (dets[..., 0] + dets[..., 2])[:, None, :] / 2.0 \
        - (prev[..., 0] + prev[..., 2])[:, :, None] / 2.0      # [C,M,N]
    dcy = (dets[..., 1] + dets[..., 3])[:, None, :] / 2.0 \
        - (prev[..., 1] + prev[..., 3])[:, :, None] / 2.0
    norm = np.sqrt(dcx ** 2 + dcy ** 2) + 1e-6
    dir_x, dir_y = dcx / norm, dcy / norm
    cos = vel[..., 1][:, :, None] * dir_x + vel[..., 0][:, :, None] * dir_y
    angle = np.arccos(np.clip(cos, -1.0, 1.0))
    score = (np.pi / 2.0 - np.abs(angle)) / np.pi
    valid = (prev[..., 4] >= 0).astype(np.float64)[:, :, None]
    cost = (valid * score * vdc_weight).transpose(0, 2, 1)
    return cost * dets[..., 4][:, :, None]


class MultiCamOCSort:
    def __init__(self, det_thresh: float = 0.25, max_age: int = 30,
                 min_hits: int = 3, iou_threshold: float = 0.3,
                 delta_t: int = 3, inertia: float = 0.2, use_byte: bool = False):
        self.max_age = max_age
        self.min_hits = min_hits
        self.iou_threshold = iou_threshold
        self.delta_t = delta_t
        self.inertia = inertia
        self.use_byte = use_byte
        self.frame_count: dict = {}         # per-camera frame counters
        self.next_id: dict = {}             # per-camera id counters
        self._cam_ids: dict = {}            # camera key (any hashable) -> int

        self.kf = BatchKalman()
        z = lambda *s: np.zeros(s)
        self.cam = np.zeros(0, int)
        self.ids = z(0)
        self.age = z(0)
        self.tsu = z(0)
        self.hits = z(0)
        self.hit_streak = z(0)
        self.last_obs = np.full((0, 5), -1.0)
        self.velocity = z(0, 2)
        self.avg_vel = z(0, 2)
        self.speed = z(0)
        self.class_id = z(0)
        self.score = z(0)
        # observation ring buffer replacing per-track {age: box} dicts:
        # W = delta_t + 1 slots cover every age the lookup can request
        self.W = delta_t + 1
        self.ring_box = np.zeros((0, self.W, 5))
        self.ring_age = np.full((0, self.W), _NEVER)
        self.class_votes: list[dict] = []

    def __len__(self):
        return len(self.ids)

    # -- vectorized observation history --------------------------------------

    def _k_previous_obs_all(self) -> np.ndarray:
        """[M,5] delta_t-back observation per track (ocsort.py:11-19):
        prefer age-delta_t, then nearer, else the latest observation, else
        -1s. One vectorized lookup replacing M dict scans."""
        m = len(self)
        if m == 0:
            return np.zeros((0, 5))
        dts = np.arange(self.delta_t, 0, -1)                  # [3,2,1]
        target = self.age[:, None] - dts[None, :]             # [M,K]
        slots = (target % self.W).astype(int)
        valid = np.take_along_axis(self.ring_age, slots, 1) == target
        first = np.argmax(valid, 1)                           # first hit in dt order
        any_valid = valid.any(1)
        sel = np.take_along_axis(
            self.ring_box, slots[np.arange(m), first][:, None, None]
            .repeat(5, 2), 1)[:, 0]
        has_obs = self.last_obs[:, :4].sum(1) >= 0
        out = np.where(any_valid[:, None], sel,
                       np.where(has_obs[:, None], self.last_obs,
                                np.full((1, 5), -1.0)))
        return out

    # -- slot management ------------------------------------------------------

    def _spawn_many(self, cam: int, dets: np.ndarray, cls, scores):
        k = len(dets)
        if k == 0:
            return
        self.kf.add_many(bbox_to_z(dets[:, :4]))
        nid = self.next_id.setdefault(cam, 0)
        self.cam = np.concatenate([self.cam, np.full(k, cam, int)])
        self.ids = np.concatenate([self.ids, np.arange(nid, nid + k)])
        self.next_id[cam] = nid + k
        zk = np.zeros(k)
        self.age = np.concatenate([self.age, zk])
        self.tsu = np.concatenate([self.tsu, zk])
        self.hits = np.concatenate([self.hits, zk])
        self.hit_streak = np.concatenate([self.hit_streak, zk])
        self.last_obs = np.concatenate([self.last_obs, np.full((k, 5), -1.0)])
        self.velocity = np.concatenate([self.velocity, np.zeros((k, 2))])
        self.avg_vel = np.concatenate([self.avg_vel, np.zeros((k, 2))])
        self.speed = np.concatenate([self.speed, zk])
        self.class_id = np.concatenate([self.class_id, np.asarray(cls, float)])
        self.score = np.concatenate([self.score, np.asarray(scores, float)])
        self.ring_box = np.concatenate([self.ring_box,
                                        np.zeros((k, self.W, 5))])
        self.ring_age = np.concatenate([self.ring_age,
                                        np.full((k, self.W), _NEVER)])
        for c in np.asarray(cls, float):
            self.class_votes.append({c: 1.0})

    def _kill_many(self, idxs: np.ndarray):
        if len(idxs) == 0:
            return
        keep = np.ones(len(self), bool)
        keep[idxs] = False
        for name in ("cam", "ids", "age", "tsu", "hits", "hit_streak",
                     "last_obs", "velocity", "avg_vel", "speed", "class_id",
                     "score", "ring_box", "ring_age"):
            setattr(self, name, getattr(self, name)[keep])
        for name in ("x", "P", "saved_x", "saved_P", "has_saved", "observed"):
            setattr(self.kf, name, getattr(self.kf, name)[keep])
        self.class_votes = [v for v, k in zip(self.class_votes, keep) if k]

    # -- observe --------------------------------------------------------------

    def _observe_many(self, obs: list):
        """obs: [(global_track_idx, det5, score, cls)] across all cameras.
        Bookkeeping per match (dict votes, rare unfreeze) stays scalar; the
        measurement conversion, velocity math and KF update are batched."""
        if not obs:
            return
        idxs = np.fromiter((t for t, *_ in obs), int, len(obs))
        det5s = np.stack([d for _, d, _, _ in obs])
        zs = bbox_to_z(det5s[:, :4])

        # velocity/average speed for tracks that had a previous observation
        prev = self._k_previous_obs_all()[idxs]
        no_prev_hist = prev[:, :4].sum(1) < 0
        prev[no_prev_hist] = self.last_obs[idxs][no_prev_hist]
        had_obs = self.last_obs[idxs].sum(1) >= 0
        dy = (det5s[:, 1] + det5s[:, 3]) / 2.0 - (prev[:, 1] + prev[:, 3]) / 2.0
        dx = (det5s[:, 0] + det5s[:, 2]) / 2.0 - (prev[:, 0] + prev[:, 2]) / 2.0
        norm = np.sqrt(dx * dx + dy * dy) + 1e-6
        upd = np.where(had_obs)[0]
        gi = idxs[upd]
        self.velocity[gi, 0] = (dy / norm)[upd]
        self.velocity[gi, 1] = (dx / norm)[upd]
        self.avg_vel[gi] += np.stack([dy, dx], 1)[upd] / self.age[gi][:, None]
        self.speed[gi] = np.abs(self.avg_vel[gi]).sum(1)

        for j, (i, det5, score, cls) in enumerate(obs):
            votes = self.class_votes[i]
            votes[cls] = votes.get(cls, 0.0) + score
            self.class_id[i] = max(votes, key=votes.get)
            if not self.kf.observed[i] and self.kf.has_saved[i]:
                z_prev = bbox_to_z(self.last_obs[i][:4])
                self.kf.unfreeze_replay(i, z_prev, zs[j], int(self.tsu[i]))

        self.last_obs[idxs] = det5s
        slot = (self.age[idxs] % self.W).astype(int)
        self.ring_box[idxs, slot] = det5s
        self.ring_age[idxs, slot] = self.age[idxs]
        self.tsu[idxs] = 0
        self.hits[idxs] += 1
        self.hit_streak[idxs] += 1
        self.kf.update_batch(idxs, zs)

    # -- per-tick step ----------------------------------------------------------

    def reset_cam(self, key) -> None:
        """Drop a camera's tracks and counters — equivalent to giving it a
        fresh per-camera OCSort (camera re-add / VOD re-analysis)."""
        cid = self._cam_ids.get(key)
        if cid is None:
            return
        if len(self):
            self._kill_many(np.where(self.cam == cid)[0])
        self.next_id.pop(cid, None)
        self.frame_count.pop(cid, None)

    def update_all(self, dets_per_cam: dict, det_thresh=0.25) -> dict:
        """{cam_key: [N,6+] rows} -> {cam_key: list[Track]}. One call per NVR
        tick; cameras absent from the dict are not advanced (no frame this
        tick). det_thresh: float, or {cam_key: float} for per-camera
        thresholds (per-camera zone settings, clearcam.py:585)."""
        keys = list(dets_per_cam.keys())
        cams = [self._cam_ids.setdefault(k, len(self._cam_ids)) for k in keys]
        thr = {c: (det_thresh[k] if isinstance(det_thresh, dict)
                   else det_thresh) for c, k in zip(cams, keys)}
        dets_per_cam = {c: dets_per_cam[k] for c, k in zip(cams, keys)}
        for cam in cams:
            self.frame_count[cam] = self.frame_count.get(cam, 0) + 1
        active = np.isin(self.cam, cams) if len(self) else np.zeros(0, bool)

        # 1. global predict on active cameras' tracks
        act_idx = np.where(active)[0]
        if len(act_idx):
            sub = BatchKalman.__new__(BatchKalman)  # predict on a view
            for name in ("x", "P"):
                setattr(sub, name, getattr(self.kf, name)[act_idx])
            sub.predict_all()
            self.kf.x[act_idx] = sub.x
            self.kf.P[act_idx] = sub.P
            self.age[act_idx] += 1
            hs = self.hit_streak[act_idx]
            hs[self.tsu[act_idx] > 0] = 0
            self.hit_streak[act_idx] = hs
            self.tsu[act_idx] += 1

        trk_boxes_all = np.zeros((len(self), 5))
        if len(self):
            trk_boxes_all[:, :4] = z_to_bbox(self.kf.x)
        prev_obs_all = self._k_previous_obs_all()

        # one grouped index pass instead of per-camera np.where scans
        cam_idx: dict = {}
        if len(self):
            order = np.argsort(self.cam, kind="stable")
            sorted_cams = self.cam[order]
            bounds = np.flatnonzero(np.diff(sorted_cams)) + 1
            for grp in np.split(order, bounds):
                if len(grp):
                    cam_idx[int(self.cam[grp[0]])] = grp

        # preprocess every camera's rows, then compute ALL association costs
        # in one padded [C, Nmax, Mmax] tensor (the per-camera iou/angle calls
        # were the dominant cost at 128 cameras)
        percam = []
        empty_idx = np.zeros(0, int)
        for cam in cams:
            rows = dets_per_cam[cam]
            rows = np.asarray(rows, np.float64).reshape(-1, rows.shape[-1]) \
                if len(rows) else np.zeros((0, 6))
            scores = rows[:, 4]
            dets_all = np.concatenate([rows[:, :4], scores[:, None]], 1)
            cls_all = rows[:, 5]
            high = scores > thr[cam]
            second = (scores > 0.1) & (scores < thr[cam])
            percam.append((cam, dets_all[high], cls_all[high],
                           dets_all[second], cls_all[second],
                           cam_idx.get(cam, empty_idx)))

        nmax = max((len(d) for _, d, *_ in percam), default=0)
        mmax = max((len(t) for *_, t in percam), default=0)
        iou3 = angle3 = None
        if nmax and mmax:
            c_n = len(percam)
            det_pad = np.zeros((c_n, nmax, 5))
            trk_pad = np.zeros((c_n, mmax, 5))
            vel_pad = np.zeros((c_n, mmax, 2))
            prev_pad = np.full((c_n, mmax, 5), -1.0)  # col4=-1 -> angle invalid
            for ci, (_, dets, _, _, _, tidx) in enumerate(percam):
                det_pad[ci, :len(dets)] = dets
                trk_pad[ci, :len(tidx)] = trk_boxes_all[tidx]
                vel_pad[ci, :len(tidx)] = self.velocity[tidx]
                prev_pad[ci, :len(tidx)] = prev_obs_all[tidx]
            with np.errstate(divide="ignore", invalid="ignore"):
                iou3 = _iou3(det_pad, trk_pad)
                angle3 = _angle_cost3(det_pad, prev_pad, vel_pad, self.inertia)

        out: dict = {}
        all_obs: list = []
        all_frozen: list = []
        spawns: list = []
        for ci, (cam, dets, cls_high, dets_second, cls_second,
                 tidx) in enumerate(percam):
            trk_boxes = trk_boxes_all[tidx]
            n, m = len(dets), len(tidx)
            costs = (iou3[ci, :n, :m], angle3[ci, :n, :m]) \
                if iou3 is not None and n and m else None
            matched, um_dets, um_trks = associate(
                dets, trk_boxes, self.iou_threshold, self.velocity[tidx],
                prev_obs_all[tidx], self.inertia, costs=costs)
            all_obs += [(tidx[t], dets[d], dets[d, 4], cls_high[d])
                        for d, t in matched]

            if self.use_byte and len(dets_second) and len(um_trks):
                iou = iou_batch(dets_second, trk_boxes[um_trks])
                if iou.max() > self.iou_threshold:
                    rematch = greedy_assignment(-iou)
                    drop = []
                    for r, c in rematch:
                        if iou[r, c] < self.iou_threshold:
                            continue
                        t = um_trks[c]
                        all_obs.append((tidx[t], dets_second[r],
                                        dets_second[r, 4], cls_second[r]))
                        drop.append(t)
                    um_trks = np.setdiff1d(um_trks, np.array(drop))

            if len(um_dets) and len(um_trks):
                iou = iou_batch(dets[um_dets], self.last_obs[tidx[um_trks]])
                if iou.max() > self.iou_threshold:
                    rematch = greedy_assignment(-iou)
                    drop_d, drop_t = [], []
                    for r, c in rematch:
                        if iou[r, c] < self.iou_threshold:
                            continue
                        d, t = um_dets[r], um_trks[c]
                        all_obs.append((tidx[t], dets[d], dets[d, 4],
                                        cls_high[d]))
                        drop_d.append(d)
                        drop_t.append(t)
                    um_dets = np.setdiff1d(um_dets, np.array(drop_d))
                    um_trks = np.setdiff1d(um_trks, np.array(drop_t))

            all_frozen.append(tidx[np.asarray(um_trks, int)])
            um_dets = np.asarray(um_dets, int)
            spawns.append((cam, dets[um_dets], cls_high[um_dets],
                           dets[um_dets, 4]))

        # 2. batched freeze / observe / spawn across every camera
        self.kf.freeze(np.concatenate(all_frozen).astype(int)
                       if all_frozen else np.zeros(0, int))
        self._observe_many(all_obs)
        for cam, d, c, s in spawns:
            self._spawn_many(cam, d, c, s)

        # 3. emit per camera (reference order: newest slot first) + reap.
        # Emission candidates are vectorized: only tracks observed this tick
        # (tsu==0) that pass the streak/grace gate produce Track objects.
        emit = (self.tsu < 1) & (self.hit_streak >= self.min_hits)
        for cam in cams:
            if self.frame_count[cam] <= self.min_hits:
                emit |= (self.tsu < 1) & (self.cam == cam)
        cand = np.flatnonzero(emit)
        cand = cand[np.isin(self.cam[cand], cams)]
        cand = cand[::-1]                        # newest slot first
        boxes = np.where(self.last_obs[cand].sum(1)[:, None] >= 0,
                         self.last_obs[cand, :4],
                         z_to_bbox(self.kf.x[cand])) if len(cand) \
            else np.zeros((0, 4))
        # one vectorized pass builds every output field; the per-track loop
        # only wraps rows into Track objects (at 128 cams the old per-track
        # np.array/float() conversions dominated the tick)
        tlwh = np.empty((len(cand), 4))
        tlwh[:, :2] = boxes[:, :2]
        tlwh[:, 2:] = boxes[:, 2:] - boxes[:, :2]
        scalars = np.stack([self.score[cand], self.class_id[cand],
                            self.ids[cand] + 1, self.age[cand],
                            self.speed[cand]], 1).tolist() if len(cand) else []
        by_cam: dict = {cam: [] for cam in cams}
        for j, ci in enumerate(self.cam[cand].tolist()):
            s = scalars[j]
            by_cam[ci].append(Track(tlwh=tlwh[j], score=s[0], class_id=s[1],
                                    track_id=s[2], tracklet_len=s[3],
                                    speed=s[4]))
        out.update(by_cam)
        dead = (self.tsu > self.max_age) & ((self.speed > 2) | (self.tsu > 600))
        self._kill_many(np.where(dead)[0])
        return {k: out[c] for k, c in zip(keys, cams)}
