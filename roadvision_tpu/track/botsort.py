"""BoT-SORT-style tracker backend: two-stage association with a fused
motion+appearance cost and camera-motion compensation.

Beyond-reference tracking addition (the reference ships motion-only
SORT, src/track/sort_tracker.py; its registry reserves room for more
backends, src/track/registry.py:10-14). BoT-SORT ("BoT-SORT: Robust
Associations Multi-Pedestrian Tracking", Aharon et al., 2022) is the
combination of the three ideas this framework already ships as
separate primitives, and is ultralytics' own default tracker — so a
reference user who flips their tracker config expects the name:

  * ByteTrack's two-stage high/low-score association
    (track/bytetrack.py) — low-confidence detections re-associate in a
    second pass instead of being discarded;
  * DeepSORT-style appearance re-identification (track/deepsort.py,
    track/appearance.py) — the FIRST stage fuses predicted-IoU with an
    appearance cosine over gated pairs, so a drifted track can
    re-acquire its object on looks; the second (low-score) stage stays
    IoU-only, exactly as in the paper (low boxes are too noisy for
    appearance matching);
  * camera-motion compensation (track/gmc.py) — enabled by the same
    orthogonal ``tracking.gmc: true`` knob as every other backend (the
    engine feeds the phase-correlation shift into the step; BoT-SORT's
    sparse-flow GMC is host-CPU, ours rides the device FFT).

TPU-first: built ENTIRELY from the strategy hooks of
sort_tpu.make_sort_step — the fused cost is one (T, E)·(E, D) matmul
plus elementwise gates, both stages reuse the parallel mutual-maximum
exact-greedy kernel on masked views of the same matrices, and the
whole step scans/vmaps/shards like SORT (track.multi,
parallel.inference work unchanged).

Config (``tracking:`` section, backend "botsort") — the union of the
bytetrack and deepsort knobs:
  track_high_thresh / track_low_thresh / new_track_thresh /
  match_iou / second_match_iou: as for bytetrack;
  app_weight / app_thresh / rescue_iou: as for deepsort (stage 1 only);
  gmc: true  — recommended companion knob (any backend honors it).
"""
from __future__ import annotations

import jax.numpy as jnp

from .bytetrack import ByteTracker
from .sort_tpu import greedy_associate, make_sort_step


def make_botsort_associate(track_high_thresh: float,
                           track_low_thresh: float,
                           match_iou: float, second_match_iou: float,
                           app_weight: float, app_thresh: float,
                           rescue_iou: float):
    """Two-stage fused-cost association strategy (make_sort_step hook).

    Stage 1 (high-score detections, all alive tracks): affinity =
    IoU + app_weight·max(cos, 0) over pairs passing the motion gate
    (IoU ≥ match_iou) OR the appearance-rescue gate (cos ≥ app_thresh
    with IoU ≥ rescue_iou). Stage 2 (low-score detections, tracks left
    unmatched by stage 1): plain IoU at second_match_iou. Without
    embeddings stage 1 degrades to ByteTrack's IoU-only pass.
    """
    hi_t = float(track_high_thresh)
    lo_t = float(track_low_thresh)
    iou1 = float(match_iou)
    iou2 = float(second_match_iou)
    w_app = float(app_weight)
    cos_t = float(app_thresh)
    resc = float(rescue_iou)

    def associate(iou, alive, dvalid, conf, ctx):
        state, _boxes, _ts, emb = ctx
        num_t = iou.shape[0]
        high = dvalid & (conf >= hi_t)
        low = dvalid & ~high & (conf >= lo_t)
        if emb is None:
            # no descriptors supplied → ByteTrack's motion-only stage 1
            d2t_hi = greedy_associate(iou, alive, high, iou1)
        else:
            cos = state.app @ emb.T                  # (T, D) one matmul
            gate = (iou >= iou1) | ((cos >= cos_t) & (iou >= resc))
            affinity = iou + w_app * jnp.maximum(cos, 0.0)
            d2t_hi = greedy_associate(
                jnp.where(gate, affinity, 0.0), alive, high, 1e-6)
        # retire tracks taken in stage 1 (scatter of matched track ids)
        taken_t = jnp.zeros((num_t,), bool).at[
            jnp.where(d2t_hi >= 0, d2t_hi, num_t)
        ].set(True, mode="drop")
        d2t_lo = greedy_associate(iou, alive & ~taken_t, low, iou2)
        return jnp.where(d2t_hi >= 0, d2t_hi, d2t_lo)

    return associate


def make_botsort_step(max_staleness: float, speed_window: float,
                      track_high_thresh: float = 0.5,
                      track_low_thresh: float = 0.1,
                      new_track_thresh: float = 0.6,
                      match_iou: float = 0.3,
                      second_match_iou: float = 0.5,
                      app_weight: float = 0.5,
                      app_thresh: float = 0.6,
                      rescue_iou: float = 0.02,
                      nsa: bool = False):
    """Build the jitted single-frame BoT-SORT-style step.

    Same signature as :func:`sort_tpu.make_sort_step`'s return value;
    pass per-detection descriptors as the trailing ``emb`` argument and
    the GMC camera shift as ``shift`` — the engine supplies both when
    ``tracking.backend: botsort`` (+ ``gmc: true``).
    """
    hi_t = float(track_high_thresh)
    new_t = float(new_track_thresh)

    def new_track(dvalid, matched_d, conf):
        # only unmatched HIGH detections above the start threshold; low
        # detections never create tracks (the ByteTrack invariant)
        return dvalid & ~matched_d & (conf >= hi_t) & (conf >= new_t)

    return make_sort_step(
        0.0, max_staleness, speed_window,
        associate_fn=make_botsort_associate(
            track_high_thresh, track_low_thresh, match_iou,
            second_match_iou, app_weight, app_thresh, rescue_iou),
        new_track_fn=new_track, nsa=nsa)


class BotSortTracker(ByteTracker):
    """Host-facing BoT-SORT with the reference Tracker contract
    (``update(detections, timestamp, projector=None)``,
    src/track/base.py:11-24).

    The list API carries no pixels, so this host surface runs without
    descriptors — stage 1 degrades to ByteTrack's IoU pass (the
    appearance path is engine-resident: runtime/engine.py computes
    embeddings on device when ``tracking.backend: botsort``). Kept so
    config-driven backend swaps never break the host API.
    """

    def __init__(self, cfg: dict):
        import jax

        # parse the ByteTrack knobs WITHOUT building (and discarding)
        # the ByteTrack step
        self._parse(cfg)
        self._step = jax.jit(make_botsort_step(
            self.max_staleness, self.speed_window,
            track_high_thresh=self.track_high_thresh,
            track_low_thresh=self.track_low_thresh,
            new_track_thresh=self.new_track_thresh,
            match_iou=self.match_iou,
            second_match_iou=self.second_match_iou,
            app_weight=float(cfg.get("app_weight", 0.5)),
            app_thresh=float(cfg.get("app_thresh", 0.6)),
            rescue_iou=float(cfg.get("rescue_iou", 0.02)),
            nsa=self.nsa))
        from .sort_tpu import init_state
        self._state = init_state(self.track_slots)
        self._t0 = None
