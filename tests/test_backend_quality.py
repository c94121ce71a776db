"""Cross-backend tracking quality: the added backends beat SORT on the
scenarios they were built for, measured with the MOTA evaluator.

The reference ships SORT only (src/track/sort_tracker.py); bytetrack.py
and ocsort.py are TPU-native additions. These tests are the evidence the
additions earn their keep: identical detection sequences through
build_tracker() for each backend, scored with
track.eval.evaluate_tracking (CLEAR-MOT accounting) — not hand-waved
"should be better" claims.
"""
import numpy as np

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.track import build_tracker
from roadvision_tpu.track.eval import evaluate_tracking


def _dets(boxes, confs, cls_id=2):
    return [Detection(b[0], b[1], b[2], b[3], c, cls_id, "car")
            for b, c in zip(boxes, confs)]


def _run(backend, seq, **over):
    """Drive one backend over [(dt, boxes, confs, gt_ids)], returning
    (frames_gt, frames_pred) for evaluate_tracking."""
    cfg = {"backend": backend, "max_staleness": 1.2, "speed_window": 0.8,
           "det_capacity": 16, "track_slots": 16, "iou_threshold": 0.3,
           "min_hits": 1}
    cfg.update(over)
    tracker = build_tracker(cfg)
    t = 1700000000.0
    frames_gt, frames_pred = [], []
    for dt, boxes, confs, gt_ids in seq:
        t += dt
        out = tracker.update(_dets(boxes, confs), t)
        frames_gt.append([(b[0], b[1], b[2], b[3], g)
                          for b, g in zip(boxes, gt_ids) if g is not None])
        frames_pred.append([(d.x1, d.y1, d.x2, d.y2, d.track_id)
                            for d in out if d.track_id is not None])
    return frames_gt, frames_pred


def _score(backend, seq, **over):
    gt, pred = _run(backend, seq, **over)
    return evaluate_tracking(gt, pred)


def test_ocsort_survives_occlusion_gap_sort_fragments():
    """A vehicle disappears behind an occluder for 6 frames and reappears
    where it was last seen. SORT's Kalman prediction has coasted past IoU
    reach -> identity fragments (1 switch). OC-SORT's recovery stage
    matches on the last observation -> identity holds, higher MOTA."""
    seq = []
    seq.append((0.0, [(0, 0, 60, 40)], [0.9], [1]))
    for f in range(1, 6):  # constant 20 px/frame rightward
        seq.append((1 / 30, [(20 * f, 0, 60 + 20 * f, 40)], [0.9], [1]))
    for _ in range(6):     # occluded: no detection, no visible GT
        seq.append((1 / 30, [], [], []))
    for _ in range(4):     # reappears stopped at the last-seen box
        seq.append((1 / 30, [(100, 0, 160, 40)], [0.9], [1]))

    sort_m = _score("sort", seq)
    oc_m = _score("ocsort", seq)

    assert sort_m["id_switches"] >= 1       # fragments
    assert oc_m["id_switches"] == 0         # identity recovered
    assert oc_m["mota"] > sort_m["mota"]


def test_ocm_keeps_crossing_identities():
    """Two vehicles on converging courses pass close enough that the
    predicted-IoU scores tie-break ambiguously for one frame. OC-SORT's
    direction-consistency term keeps each ID on its own motion vector;
    both backends are scored, OC-SORT must not be worse."""
    seq = []
    for f in range(14):
        a = (10 + 18 * f, 100, 70 + 18 * f, 160)        # left -> right
        b = (244 - 18 * f, 104, 304 - 18 * f, 164)      # right -> left
        seq.append((1 / 30, [a, b], [0.9, 0.9], [1, 2]))
    oc_m = _score("ocsort", seq)
    sort_m = _score("sort", seq)
    assert oc_m["id_switches"] <= sort_m["id_switches"]
    assert oc_m["mota"] >= sort_m["mota"]
    assert oc_m["id_switches"] == 0


def test_bytetrack_ignores_low_confidence_clutter():
    """One-frame low-confidence noise blips: SORT births a track from
    every valid detection (reference behavior, immediate IDs) -> false
    positives. ByteTrack only starts tracks from confident detections;
    low-score dets may only rescue existing tracks -> clean output."""
    rng = np.random.default_rng(3)
    seq = []
    for f in range(12):
        boxes = [(20 + 10 * f, 200, 80 + 10 * f, 240)]
        confs, gids = [0.9], [1]
        if f % 3 == 1:  # transient clutter far from the real object
            x = float(rng.uniform(300, 500))
            y = float(rng.uniform(0, 120))
            boxes.append((x, y, x + 30, y + 25))
            confs.append(0.2)
            gids.append(None)  # not a real object
        seq.append((1 / 30, boxes, confs, gids))

    sort_m = _score("sort", seq)
    byte_m = _score("bytetrack", seq, track_high_thresh=0.5,
                    track_low_thresh=0.1, new_track_thresh=0.6)

    assert sort_m["false_positives"] >= 3   # every blip got an ID
    assert byte_m["false_positives"] == 0
    assert byte_m["mota"] > sort_m["mota"]
    assert byte_m["misses"] == sort_m["misses"] == 0


def test_bytetrack_low_conf_rescues_through_conf_dip():
    """The real ByteTrack win: the detector's confidence dips below the
    engine's keep threshold during partial occlusion. Upstream filtering
    (engine conf_thres 0.5) drops those dets for SORT -> track coasts and
    the reappearing box has drifted away -> fragment. ByteTrack sees the
    low-score dets (the engine passes [track_low_thresh, inf) when the
    backend wants them) and keeps correcting the filter -> identity
    holds."""
    # simulate the engine's filtering: SORT receives only conf >= 0.5
    full = []
    for f in range(16):
        box = (15 * f, 60, 70 + 15 * f, 120)
        conf = 0.9 if (f < 5 or f > 11) else 0.25   # dip while occluded
        full.append((1 / 30, [box], [conf], [1]))

    seq_filtered = [(dt, b if c and c[0] >= 0.5 else [],
                     c if c and c[0] >= 0.5 else [],
                     g if c and c[0] >= 0.5 else [])
                    for dt, b, c, g in full]

    # SORT on filtered stream: 7-frame blind coast, then re-acquire far
    # from the prediction is fine here (constant velocity), so weaken the
    # motion: the object STOPS while occluded (brake lights behind a bus)
    full_stop = []
    for f in range(16):
        x = 15 * min(f, 5) if f <= 11 else 15 * 5 + 8 * (f - 11)
        box = (x, 60, 70 + x, 120)
        conf = 0.9 if (f < 5 or f > 11) else 0.25
        full_stop.append((1 / 30, [box], [conf], [1]))
    seq_stop_filtered = [(dt, b if c and c[0] >= 0.5 else [],
                          c if c and c[0] >= 0.5 else [],
                          g if c and c[0] >= 0.5 else [])
                         for dt, b, c, g in full_stop]

    sort_m = _score("sort", seq_stop_filtered)
    byte_m = _score("bytetrack", full_stop, track_high_thresh=0.5,
                    track_low_thresh=0.1, new_track_thresh=0.6)

    assert byte_m["id_switches"] == 0
    assert byte_m["matches"] > sort_m["matches"]  # tracked through the dip
    assert byte_m["mota"] >= sort_m["mota"]
