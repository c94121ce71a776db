"""Independent scalar float64 oracle for the ByteTrack backend.

Same SORT mechanics as sort_oracle.py (7-dim real-dt Kalman, greedy
global-argmax IoU matching, time-based staleness, windowed speed) with
ByteTrack's two-stage association (Zhang et al., ECCV 2022) adapted to
this framework's semantics — see roadvision_tpu/track/bytetrack.py:

  stage 1: high-score dets (conf >= track_high_thresh) vs all tracks,
           accept at iou >= match_iou;
  stage 2: low-score dets (track_low_thresh <= conf < high) vs the
           tracks stage 1 left unmatched, accept at iou >= second_match_iou;
  new tracks only from unmatched high dets with conf >= new_track_thresh.
"""
import numpy as np

from .sort_oracle import _Track, iou, x_to_bbox


class ByteOracle:
    def __init__(self, max_staleness=1.0, speed_window=0.75,
                 track_high_thresh=0.5, track_low_thresh=0.1,
                 new_track_thresh=0.6, match_iou=0.3,
                 second_match_iou=0.5):
        self.max_staleness = max_staleness
        self.speed_window = speed_window
        self.high = track_high_thresh
        self.low = track_low_thresh
        self.new_thresh = new_track_thresh
        self.iou1 = match_iou
        self.iou2 = second_match_iou
        self.tracks = []
        self.next_id = 1

    def _greedy(self, det_idx, trk_idx, det_boxes, thresh):
        """Greedy global-argmax matching over the given det/track subsets.
        Returns (matches [(ti, di)], unmatched_t set, unmatched_d set)."""
        matches = []
        unmatched_t = set(trk_idx)
        unmatched_d = set(det_idx)
        if not trk_idx or not det_idx:
            return matches, unmatched_t, unmatched_d
        mat = np.zeros((len(trk_idx), len(det_idx)))
        for a, ti in enumerate(trk_idx):
            tb = x_to_bbox(self.tracks[ti].x)
            for b, di in enumerate(det_idx):
                mat[a, b] = iou(tb, det_boxes[di])
        while True:
            flat = int(np.argmax(mat))
            if mat.flat[flat] < thresh:
                break
            a, b = np.unravel_index(flat, mat.shape)
            ti, di = trk_idx[a], det_idx[b]
            if ti in unmatched_t and di in unmatched_d:
                matches.append((ti, di))
                unmatched_t.remove(ti)
                unmatched_d.remove(di)
            mat[a, :] = -1.0
            mat[:, b] = -1.0
        return matches, unmatched_t, unmatched_d

    def update(self, det_boxes, det_conf, ts, projector=None):
        """det_boxes: list of (x1,y1,x2,y2); det_conf: list of float.
        Returns per-det dicts {id, distance, speed_kmh} (id None for
        ignored/unmatched-low/sub-threshold dets)."""
        out = [dict(id=None, distance=None, speed_kmh=None)
               for _ in det_boxes]
        for trk in self.tracks:
            trk.predict(ts)

        high_idx = [i for i, c in enumerate(det_conf) if c >= self.high]
        low_idx = [i for i, c in enumerate(det_conf)
                   if self.low <= c < self.high]
        all_t = list(range(len(self.tracks)))

        m1, um_t, um_high = self._greedy(high_idx, all_t, det_boxes,
                                         self.iou1)
        m2, _, _ = self._greedy(low_idx, sorted(um_t), det_boxes, self.iou2)

        for ti, di in m1 + m2:
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

        matched = {ti for ti, _ in m1 + m2}
        for ti in all_t:
            if ti not in matched:
                self.tracks[ti].hit_streak = 0

        for di in sorted(um_high):
            if det_conf[di] < self.new_thresh:
                continue
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
