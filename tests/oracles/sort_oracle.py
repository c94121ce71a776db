"""Independent scalar numpy oracle for the reference SORT semantics.

Implements the behavior documented in SURVEY.md §2.2 (7-dim real-dt Kalman,
greedy global-argmax IoU association, immediate ID assignment, staleness
pruning, windowed speed) in plain float64 numpy — hand-rolled KF with
filterpy's predict/update equations (Joseph-form covariance). Used as the
golden reference for the vectorized TPU tracker.
"""
import math

import numpy as np

H = np.zeros((4, 7))
H[:4, :4] = np.eye(4)
R = np.diag([1.0, 1.0, 10.0, 10.0])
P0 = np.diag([10.0, 10.0, 10.0, 10.0, 1e4, 1e4, 1e4])


def bbox_to_z(bbox):
    x1, y1, x2, y2 = bbox
    w = max(1e-3, x2 - x1)
    h = max(1e-3, y2 - y1)
    return np.array([x1 + 0.5 * w, y1 + 0.5 * h, w * h, w / h])


def x_to_bbox(x):
    cx, cy, s, r = x[:4]
    w = math.sqrt(max(1e-6, s * r))
    h = s / max(1e-6, w)
    return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


def iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    aa = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ab = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    denom = aa + ab - inter
    return inter / denom if denom > 0 else 0.0


def _fq(dt):
    dt = max(1e-3, dt)
    F = np.eye(7)
    F[0, 4] = F[1, 5] = F[2, 6] = dt
    Q = np.zeros((7, 7))
    Q[0, 0] = Q[1, 1] = Q[2, 2] = 0.04 * dt * dt
    Q[4, 4] = Q[5, 5] = Q[6, 6] = dt
    return F, Q


class _Track:
    def __init__(self, tid, bbox, ts, speed_window):
        self.id = tid
        self.x = np.zeros(7)
        self.x[:4] = bbox_to_z(bbox)
        self.P = P0.copy()
        self.last_predict_ts = ts
        self.last_update_ts = ts
        self.speed_window = max(0.05, speed_window)
        self.hits = 1
        self.hit_streak = 1
        self.history = []
        self.distance = None
        self.speed = None

    def predict(self, ts):
        F, Q = _fq(ts - self.last_predict_ts)
        self.x = F @ self.x
        self.P = F @ self.P @ F.T + Q
        self.last_predict_ts = ts

    def kf_update(self, bbox):
        z = bbox_to_z(bbox)
        y = z - H @ self.x
        S = H @ self.P @ H.T + R
        K = self.P @ H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        IKH = np.eye(7) - K @ H
        self.P = IKH @ self.P @ IKH.T + K @ R @ K.T

    def update_metrics(self, projector, bbox, ts):
        ground = projector.project_bbox(bbox)
        if ground is None:
            self.distance = None
            self.speed = None
            return
        self.distance = projector.distance(ground)
        self.history.append((ts, ground[0], ground[1]))
        while self.history and (ts - self.history[0][0]) > self.speed_window:
            self.history.pop(0)
        if len(self.history) > 32:
            self.history = self.history[-32:]
        if len(self.history) >= 2:
            t0, x0, y0 = self.history[0]
            t1, x1, y1 = self.history[-1]
            self.speed = math.hypot(x1 - x0, y1 - y0) / max(1e-3, t1 - t0)
        else:
            self.speed = None


class SortOracle:
    def __init__(self, max_staleness=1.0, min_hits=3, iou_threshold=0.3,
                 speed_window=0.75):
        self.max_staleness = max_staleness
        self.iou_threshold = iou_threshold
        self.speed_window = speed_window
        self.tracks = []
        self.next_id = 1

    def update(self, det_boxes, ts, projector=None):
        """det_boxes: list of (x1,y1,x2,y2). Returns list of dicts per det:
        {id, distance, speed_kmh}."""
        out = [dict(id=None, distance=None, speed_kmh=None)
               for _ in det_boxes]
        if not det_boxes and not self.tracks:
            return out
        for trk in self.tracks:
            trk.predict(ts)

        # greedy global-argmax association
        matches = []
        unmatched_t = set(range(len(self.tracks)))
        unmatched_d = set(range(len(det_boxes)))
        if self.tracks and det_boxes:
            mat = np.zeros((len(self.tracks), len(det_boxes)))
            for i, trk in enumerate(self.tracks):
                tb = x_to_bbox(trk.x)
                for j, db in enumerate(det_boxes):
                    mat[i, j] = iou(tb, db)
            while True:
                idx = int(np.argmax(mat))
                if mat.flat[idx] < self.iou_threshold:
                    break
                ti, di = np.unravel_index(idx, mat.shape)
                if ti in unmatched_t and di in unmatched_d:
                    matches.append((int(ti), int(di)))
                    unmatched_t.remove(int(ti))
                    unmatched_d.remove(int(di))
                mat[ti, :] = -1.0
                mat[:, di] = -1.0

        for ti, di in matches:
            trk = self.tracks[ti]
            bbox = det_boxes[di]
            trk.kf_update(bbox)
            trk.last_predict_ts = ts
            trk.last_update_ts = ts
            trk.hits += 1
            trk.hit_streak += 1
            if projector is not None:
                trk.update_metrics(projector, bbox, ts)
            out[di]["id"] = trk.id
            if trk.distance is not None:
                out[di]["distance"] = trk.distance
            elif projector is not None:
                out[di]["distance"] = projector.distance_for_bbox(bbox)
            if trk.speed is not None:
                out[di]["speed_kmh"] = trk.speed * 3.6

        for ti in unmatched_t:
            self.tracks[ti].hit_streak = 0

        for di in sorted(unmatched_d):
            bbox = det_boxes[di]
            trk = _Track(self.next_id, bbox, ts, self.speed_window)
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
