"""Independent scalar float64 oracle for the OC-SORT backend.

Same SORT mechanics as sort_oracle.py (7-dim real-dt Kalman, greedy
global-argmax matching, time-based staleness, windowed speed) with the
three observation-centric mechanisms of roadvision_tpu/track/ocsort.py
(Cao et al., CVPR 2023, adapted to real timestamps and fixed virtual
step counts):

  OCM: association score = 2 + IoU - vdc_weight * angle/pi on pairs with
       predicted-IoU >= iou_threshold (angle between the track's observed
       direction prev_obs->last_obs and the direction last_obs->det;
       needs hits >= 2 and non-degenerate vectors);
  OCR: second greedy stage — leftover dets vs leftover tracks on
       last-OBSERVATION IoU, accept at ocr_iou;
  ORU: a match on a track with hit_streak == 0 (unmatched the previous
       step) restarts the KF from the posterior snapshot at the last
       observation and re-runs oru_steps virtual predict/update cycles
       along the z-space line to the current observation
       (dt = gap/oru_steps per cycle, NOT re-clamped).
"""
import math

import numpy as np

from .sort_oracle import H, R, _Track, bbox_to_z, iou, x_to_bbox


def _fq_raw(dt):
    """F/Q for an explicit (possibly sub-millisecond) dt — the virtual
    ORU steps divide an already-clamped gap, with no per-step clamp."""
    F = np.eye(7)
    F[0, 4] = F[1, 5] = F[2, 6] = dt
    Q = np.zeros((7, 7))
    Q[0, 0] = Q[1, 1] = Q[2, 2] = 0.04 * dt * dt
    Q[4, 4] = Q[5, 5] = Q[6, 6] = dt
    return F, Q


class _OcTrack(_Track):
    def __init__(self, tid, bbox, ts, speed_window):
        super().__init__(tid, bbox, ts, speed_window)
        self.last_obs = np.asarray(bbox, float).copy()
        self.last_obs_ts = ts
        self.prev_obs = np.asarray(bbox, float).copy()
        self.prev_obs_ts = ts
        self.obs_x = self.x.copy()
        self.obs_P = self.P.copy()

    def _kf_step_raw(self, x, P, dt, z):
        F, Q = _fq_raw(dt)
        x = F @ x
        P = F @ P @ F.T + Q
        y = z - H @ x
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        x = x + K @ y
        IKH = np.eye(7) - K @ H
        P = IKH @ P @ IKH.T + K @ R @ K.T
        return x, P

    def oc_update(self, bbox, ts, oru_steps):
        """Measurement update with ORU + observation bookkeeping."""
        reactivated = oru_steps > 0 and self.hit_streak == 0
        if reactivated:
            gap = max(1e-3, ts - self.last_obs_ts)
            dt_k = gap / oru_steps
            z_last = bbox_to_z(self.last_obs)
            z_new = bbox_to_z(bbox)
            x, P = self.obs_x.copy(), self.obs_P.copy()
            for k in range(oru_steps):
                frac = (k + 1.0) / oru_steps
                zk = z_last + frac * (z_new - z_last)
                x, P = self._kf_step_raw(x, P, dt_k, zk)
            self.x, self.P = x, P
        else:
            self.kf_update(bbox)
        self.prev_obs = self.last_obs
        self.prev_obs_ts = self.last_obs_ts
        self.last_obs = np.asarray(bbox, float).copy()
        self.last_obs_ts = ts
        self.obs_x = self.x.copy()
        self.obs_P = self.P.copy()


class OcSortOracle:
    def __init__(self, max_staleness=1.0, speed_window=0.75,
                 iou_threshold=0.3, vdc_weight=0.2, ocr_iou=None,
                 use_ocr=True, oru_steps=4, new_track_thresh=0.6):
        self.max_staleness = max_staleness
        self.speed_window = speed_window
        self.iou_threshold = iou_threshold
        self.vdc_weight = vdc_weight
        self.ocr_iou = iou_threshold if ocr_iou is None else ocr_iou
        self.use_ocr = use_ocr
        self.oru_steps = oru_steps
        self.new_track_thresh = new_track_thresh
        self.tracks = []
        self.next_id = 1

    def _score(self, trk, det_box):
        """Stage-1 shifted OCM score; -1 = ineligible."""
        i = iou(x_to_bbox(trk.x), det_box)
        if i < self.iou_threshold:
            return -1.0
        pen = 0.0
        lc = 0.5 * (trk.last_obs[:2] + trk.last_obs[2:])
        pc = 0.5 * (trk.prev_obs[:2] + trk.prev_obs[2:])
        v = lc - pc
        vn = math.hypot(v[0], v[1])
        if trk.hits >= 2 and vn > 1e-6:
            dc = 0.5 * (np.asarray(det_box[:2], float)
                        + np.asarray(det_box[2:], float))
            d = dc - lc
            dn = math.hypot(d[0], d[1])
            if dn > 1e-6:
                cos = (v[0] * d[0] + v[1] * d[1]) / max(1e-6, vn * dn)
                pen = math.acos(max(-1.0, min(1.0, cos))) / math.pi
        return 2.0 + i - self.vdc_weight * pen

    def _greedy(self, mat, accept, trk_idx, det_idx):
        """Greedy global-argmax over a prebuilt matrix. Returns matches
        [(ti, di)] and the unmatched trk/det index sets."""
        matches = []
        unmatched_t = set(trk_idx)
        unmatched_d = set(det_idx)
        if mat.size == 0:
            return matches, unmatched_t, unmatched_d
        mat = mat.copy()
        while True:
            flat = int(np.argmax(mat))
            if mat.flat[flat] < accept:
                break
            a, b = np.unravel_index(flat, mat.shape)
            ti, di = trk_idx[a], det_idx[b]
            if ti in unmatched_t and di in unmatched_d:
                matches.append((ti, di))
                unmatched_t.remove(ti)
                unmatched_d.remove(di)
            mat[a, :] = -1e9
            mat[:, b] = -1e9
        return matches, unmatched_t, unmatched_d

    def update(self, det_boxes, det_conf, ts, projector=None):
        """det_boxes: list of (x1,y1,x2,y2); det_conf: list of float.
        Returns per-det dicts {id, distance, speed_kmh} (id None for
        unmatched dets below new_track_thresh)."""
        out = [dict(id=None, distance=None, speed_kmh=None)
               for _ in det_boxes]
        for trk in self.tracks:
            trk.predict(ts)

        all_t = list(range(len(self.tracks)))
        all_d = list(range(len(det_boxes)))

        # stage 1: OCM-scored greedy on predicted-IoU-gated pairs
        mat = np.full((len(all_t), len(all_d)), -1.0)
        for a, ti in enumerate(all_t):
            for b, di in enumerate(all_d):
                mat[a, b] = self._score(self.tracks[ti], det_boxes[di])
        m1, um_t, um_d = self._greedy(mat, 0.0, all_t, all_d)

        # stage 2 (OCR): leftover dets vs leftover tracks on last-obs IoU
        m2 = []
        if self.use_ocr and um_t and um_d:
            t2, d2 = sorted(um_t), sorted(um_d)
            mat2 = np.zeros((len(t2), len(d2)))
            for a, ti in enumerate(t2):
                for b, di in enumerate(d2):
                    mat2[a, b] = iou(self.tracks[ti].last_obs,
                                     det_boxes[di])
            m2, um_t2, um_d2 = self._greedy(mat2, self.ocr_iou, t2, d2)
            um_t, um_d = um_t2, um_d2

        for ti, di in m1 + m2:
            trk = self.tracks[ti]
            bbox = det_boxes[di]
            trk.oc_update(bbox, ts, self.oru_steps)
            trk.last_predict_ts = ts
            trk.last_update_ts = ts
            trk.hits += 1
            trk.hit_streak += 1
            if projector is not None:
                trk.update_metrics(projector, bbox, ts)
            out[di]["id"] = trk.id
            if trk.distance is not None:
                out[di]["distance"] = trk.distance
            if trk.speed is not None:
                out[di]["speed_kmh"] = trk.speed * 3.6

        matched = {ti for ti, _ in m1 + m2}
        for ti in all_t:
            if ti not in matched:
                self.tracks[ti].hit_streak = 0

        for di in sorted(um_d):
            if det_conf[di] < self.new_track_thresh:
                continue
            bbox = det_boxes[di]
            trk = _OcTrack(self.next_id, bbox, ts, self.speed_window)
            if projector is not None:
                trk.update_metrics(projector, bbox, ts)
                if trk.distance is not None:
                    out[di]["distance"] = trk.distance
                if trk.speed is not None:
                    out[di]["speed_kmh"] = trk.speed * 3.6
            out[di]["id"] = trk.id
            self.tracks.append(trk)
            self.next_id += 1

        self.tracks = [t for t in self.tracks
                       if (ts - t.last_update_ts) <= self.max_staleness]
        return out
