"""ByteTrack-style two-stage association tracker (TPU-native addition).

The reference ships a single tracker backend, SORT with greedy IoU
association (src/track/sort_tracker.py; its registry reserves room for
more, src/track/registry.py:10-14). ByteTrack ("ByteTrack: Multi-Object
Tracking by Associating Every Detection Box", Zhang et al., ECCV 2022)
is the natural second backend for road scenes: instead of discarding
low-confidence detections, it associates them in a second pass so
partially-occluded vehicles keep their track identity through the
occlusion instead of fragmenting.

Algorithm, adapted to this framework's SORT semantics (real-timestamp
7-dim Kalman, time-based staleness, immediate ID assignment — see
sort_tpu.py):

  1. split detections by score: high (conf ≥ track_high_thresh) and
     low (track_low_thresh ≤ conf < track_high_thresh);
  2. stage 1: greedy IoU association of HIGH detections against all
     alive tracks (accept at iou ≥ match_iou);
  3. stage 2: greedy IoU association of LOW detections against the
     tracks left unmatched by stage 1 (accept at iou ≥
     second_match_iou — stricter, low boxes are noisy);
  4. matched tracks (either stage) get the full Kalman update +
     distance/speed metrics; a low detection that matched inherits the
     track's ID in the output;
  5. only unmatched HIGH detections with conf ≥ new_track_thresh start
     new tracks; low detections never create tracks (the ByteTrack
     invariant);
  6. unmatched tracks coast (Kalman predict only) until
     ``max_staleness`` seconds without an update — the time-based
     equivalent of ByteTrack's ``track_buffer`` frame window, during
     which they stay eligible for re-association.

Everything is fixed-shape and jit/scan/vmap-compatible: both stages
reuse :func:`sort_tpu.greedy_associate` (parallel mutual-maximum
rounds, exact sequential-greedy parity) on masked views of the same
IoU matrix, so the whole two-stage step costs one extra while_loop over
the SORT step. Behavior is pinned against a scalar float64 oracle
(tests/oracles/byte_oracle.py) in tests/test_bytetrack.py.

Config (``tracking:`` section, backend "bytetrack"):
  track_high_thresh: 0.5   score split between the two stages
  track_low_thresh:  0.1   below this a detection is ignored entirely
  new_track_thresh:  0.6   unmatched-high score needed to start a track
  match_iou:         0.3   stage-1 IoU acceptance (reuses iou_threshold
                           if match_iou is not given)
  second_match_iou:  0.5   stage-2 IoU acceptance
  max_staleness, speed_window, det_capacity, track_slots: as for SORT.
"""
from __future__ import annotations

import jax.numpy as jnp

from .sort_tracker import SortTracker
from .sort_tpu import greedy_associate, make_sort_step


def make_byte_associate(track_high_thresh: float, track_low_thresh: float,
                        match_iou: float, second_match_iou: float):
    """Two-stage association strategy: ``(iou, alive, dvalid, conf) →
    det→track (D,) i32, -1 unmatched`` (the make_sort_step hook)."""
    hi_t = float(track_high_thresh)
    lo_t = float(track_low_thresh)
    iou1 = float(match_iou)
    iou2 = float(second_match_iou)

    def associate(iou, alive, dvalid, conf, ctx):
        del ctx  # predicted-IoU association only; no observation memory
        num_t = iou.shape[0]
        high = dvalid & (conf >= hi_t)
        low = dvalid & ~high & (conf >= lo_t)
        d2t_hi = greedy_associate(iou, alive, high, iou1)
        # retire tracks taken in stage 1 (scatter of matched track ids)
        taken_t = jnp.zeros((num_t,), bool).at[
            jnp.where(d2t_hi >= 0, d2t_hi, num_t)
        ].set(True, mode="drop")
        d2t_lo = greedy_associate(iou, alive & ~taken_t, low, iou2)
        return jnp.where(d2t_hi >= 0, d2t_hi, d2t_lo)

    return associate


def make_byte_step(max_staleness: float, speed_window: float,
                   track_high_thresh: float = 0.5,
                   track_low_thresh: float = 0.1,
                   new_track_thresh: float = 0.6,
                   match_iou: float = 0.3,
                   second_match_iou: float = 0.5,
                   nsa: bool = False):
    """Build the jitted single-frame ByteTrack step.

    Same signature as :func:`sort_tpu.make_sort_step`'s return value:
    ``step(state, boxes, cls, conf, dvalid, ts, proj) → (state', out)``
    over the shared SortState — scan/vmap/shard it exactly like the
    SORT step (track.multi / parallel.inference work unchanged).
    """
    hi_t = float(track_high_thresh)
    new_t = float(new_track_thresh)

    def new_track(dvalid, matched_d, conf):
        # only unmatched HIGH detections above the start threshold; low
        # detections never create tracks (the ByteTrack invariant)
        return dvalid & ~matched_d & (conf >= hi_t) & (conf >= new_t)

    return make_sort_step(
        0.0, max_staleness, speed_window,
        associate_fn=make_byte_associate(track_high_thresh, track_low_thresh,
                                         match_iou, second_match_iou),
        new_track_fn=new_track, nsa=nsa)


class ByteTracker(SortTracker):
    """Host-facing ByteTrack with the reference Tracker contract
    (``update(detections, timestamp, projector=None) → List[Detection]``,
    src/track/base.py:11-24). Unmatched low-score detections come back
    with ``track_id=None`` — callers that only trust tracked objects
    filter on that, exactly as with SORT's unmatched dets."""

    def _parse(self, cfg: dict) -> None:
        """Config parsing alone (no step build) — BotSortTracker reuses
        these knobs for its own step."""
        from .sort_tracker import parse_common_cfg
        parse_common_cfg(self, cfg)
        self.track_high_thresh = float(cfg.get("track_high_thresh", 0.5))
        self.track_low_thresh = float(cfg.get("track_low_thresh", 0.1))
        self.new_track_thresh = float(cfg.get("new_track_thresh", 0.6))
        # match_iou falls back to the SORT key so a backend swap in an
        # existing config keeps its tuned stage-1 threshold
        self.match_iou = float(cfg.get("match_iou",
                                       cfg.get("iou_threshold", 0.3)))
        self.second_match_iou = float(cfg.get("second_match_iou", 0.5))

    def __init__(self, cfg: dict):
        import jax

        self._parse(cfg)
        self._step = jax.jit(make_byte_step(
            self.max_staleness, self.speed_window,
            track_high_thresh=self.track_high_thresh,
            track_low_thresh=self.track_low_thresh,
            new_track_thresh=self.new_track_thresh,
            match_iou=self.match_iou,
            second_match_iou=self.second_match_iou,
            nsa=self.nsa))
        from .sort_tpu import init_state
        self._state = init_state(self.track_slots)
        self._t0 = None
