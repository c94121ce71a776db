"""OC-SORT-style observation-centric tracker (TPU-native addition).

The reference ships SORT only (src/track/sort_tracker.py; its registry
reserves room for more backends, src/track/registry.py:10-14). OC-SORT
("Observation-Centric SORT: Rethinking SORT for Robust Multi-Object
Tracking", Cao et al., CVPR 2023) addresses SORT's weakness under
occlusion: while a track coasts, the Kalman filter compounds its own
prediction error (no observations correct it), so by the time the object
reappears the predicted box has drifted and the IoU match fails or the
velocity estimate is useless. OC-SORT treats *observations* — not filter
states — as the ground truth to steer by. For road scenes this keeps
vehicle identities through the frequent truck/pillar/overpass occlusions.

Three mechanisms, adapted to this framework's real-timestamp, fixed-slot,
scan-compatible semantics (sort_tpu.py):

  * **OCM (observation-centric momentum)** — the association cost adds a
    velocity-direction consistency term: the angle between the track's
    observed motion direction (previous observation center → last
    observation center) and the direction last observation → candidate
    detection. Score = ``2 + IoU − vdc_weight · angle/π`` on pairs with
    predicted-IoU ≥ ``iou_threshold`` (the +2 shift keeps every eligible
    score above the greedy accept threshold; the IoU gate itself is
    unchanged from SORT). Tracks need two observations (hits ≥ 2) for a
    direction; pairs without one fall back to pure IoU.
  * **OCR (observation-centric recovery)** — a second association stage
    matches the detections stage 1 left unmatched against the *last
    observations* of the tracks stage 1 left unmatched (accept at IoU ≥
    ``ocr_iou``). A coasting track's KF prediction drifts, but the object
    usually reappears near where it was last *seen* — OCR catches exactly
    that case.
  * **ORU (observation-centric re-update)** — when a coasting track
    re-associates (it was unmatched the previous step: hit_streak == 0),
    the drifted filter state is discarded: the KF restarts from the
    posterior snapshot at the last accepted observation and re-runs
    ``oru_steps`` virtual predict/update cycles along the straight-line
    (z-space: cx, cy, s, r) trajectory between the last and the current
    observation, each with dt = gap/oru_steps. The last virtual
    observation IS the current detection, so the track ends updated at
    the new box with a velocity estimate consistent with the observed
    motion instead of the coasting drift. A fixed step count (not
    one-per-missed-frame) keeps shapes static for jit/scan.

Everything reuses the SORT step's strategy hooks (associate_fn /
new_track_fn / update_fn — sort_tpu.make_sort_step) and the observation
memory sort_tpu maintains in SortState (last_obs / prev_obs /
obs_mean / obs_cov), so the OC-SORT step has the exact step contract of
SORT/ByteTrack: scan/vmap/shard it unchanged (track.multi,
parallel.inference, the fused engine). Behavior is pinned against a
scalar float64 oracle (tests/oracles/ocsort_oracle.py) in
tests/test_ocsort.py.

Config (``tracking:`` section, backend "ocsort"):
  iou_threshold:    0.3   stage-1 IoU gate (as SORT)
  vdc_weight:       0.2   weight of the OCM direction-consistency term
                          (0 disables OCM; must be < 2 — the score shift)
  ocr_iou:          null  stage-2 accept IoU (default: iou_threshold)
  use_ocr:          true  enable the OCR recovery stage
  oru_steps:        4     virtual re-update steps (0 disables ORU)
  new_track_thresh: 0.6   unmatched-det score needed to start a track
                          (OC-SORT starts tracks from confident dets only)
  max_staleness, speed_window, det_capacity, track_slots: as for SORT.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .sort_tpu import (_kf_predict, _kf_update, bbox_to_z, greedy_associate,
                       iou_matrix, make_sort_step)
from .sort_tracker import SortTracker


def make_oc_associate(iou_threshold: float, vdc_weight: float,
                      ocr_iou: float, use_ocr: bool = True):
    """OCM + OCR association strategy (the make_sort_step hook):
    ``(iou, alive, dvalid, conf, ctx) → det→track (D,) i32, -1
    unmatched``."""
    thr = float(iou_threshold)
    w = float(vdc_weight)
    if not 0.0 <= w < 2.0:
        raise ValueError(f"vdc_weight={w} out of range [0, 2): the score "
                         f"shift guarantees accepted scores stay positive "
                         f"only for weights below 2")
    thr2 = float(ocr_iou)

    def associate(iou, alive, dvalid, conf, ctx):
        del conf
        state, boxes, _ts, _emb = ctx
        num_t, num_d = iou.shape

        # OCM: angle between observed track direction and the direction
        # to each candidate detection, as a [0,1] penalty
        lc = 0.5 * (state.last_obs[:, :2] + state.last_obs[:, 2:])  # (T,2)
        pc = 0.5 * (state.prev_obs[:, :2] + state.prev_obs[:, 2:])
        v = lc - pc
        vn = jnp.hypot(v[:, 0], v[:, 1])
        has_v = alive & (state.hits >= 2) & (vn > 1e-6)
        dc = 0.5 * (boxes[:, :2] + boxes[:, 2:])                    # (D,2)
        dd = dc[None, :, :] - lc[:, None, :]                        # (T,D,2)
        dn = jnp.hypot(dd[..., 0], dd[..., 1])
        cos = (v[:, None, 0] * dd[..., 0] + v[:, None, 1] * dd[..., 1]) \
            / jnp.maximum(1e-6, vn[:, None] * dn)
        ang = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi
        pen = jnp.where(has_v[:, None] & (dn > 1e-6), ang, 0.0)

        # shifted score: eligible pairs land in [2-w, 3], ineligible at
        # -1 (rejected by greedy_associate's accept-at-0 threshold)
        score = jnp.where(iou >= thr, 2.0 + iou - w * pen, -1.0)
        d2t = greedy_associate(score, alive, dvalid, 0.0)
        if not use_ocr:
            return d2t

        # OCR: leftover dets vs leftover tracks on LAST-OBSERVATION IoU
        taken_t = jnp.zeros((num_t,), bool).at[
            jnp.where(d2t >= 0, d2t, num_t)
        ].set(True, mode="drop")
        rem_d = dvalid & (d2t < 0)
        iou_obs = iou_matrix(state.last_obs, boxes)
        d2t2 = greedy_associate(iou_obs, alive & ~taken_t, rem_d, thr2)
        return jnp.where(d2t >= 0, d2t, d2t2)

    return associate


def make_oru_update(oru_steps: int, nsa: bool = False):
    """ORU measurement-update strategy (the make_sort_step update_fn
    hook). Freshly-tracked matches get the plain batched KF update;
    re-activating matches (hit_streak == 0: unmatched the previous step)
    restart from the last-observation posterior and re-run ``oru_steps``
    virtual predict/update cycles along the z-space line between the
    last and the current observation."""
    k_steps = int(oru_steps)
    use_nsa = bool(nsa)

    def update(state, boxes, det_idx, matched_t, ts, conf):
        from .sort_tpu import nsa_r_scale
        scale = nsa_r_scale(conf[det_idx]) if use_nsa else None
        z_new = bbox_to_z(boxes)[det_idx]                 # (T,4)
        umean, ucov = _kf_update(state.mean, state.cov, z_new, scale)
        if k_steps <= 0:
            return umean, ucov
        reactivated = matched_t & (state.hit_streak == 0)
        gap = jnp.maximum(1e-3, ts - state.last_obs_ts)   # (T,)
        dt_k = gap / k_steps                              # NOT re-clamped
        z_last = bbox_to_z(state.last_obs)

        def body(k, mc):
            mean, cov = mc
            frac = (k + 1.0) / k_steps
            zk = z_last + frac * (z_new - z_last)
            pm, pc = _kf_predict(mean, cov, dt_k)
            return _kf_update(pm, pc, zk, scale)

        vmean, vcov = jax.lax.fori_loop(
            0, k_steps, body, (state.obs_mean, state.obs_cov))
        return (jnp.where(reactivated[:, None], vmean, umean),
                jnp.where(reactivated[:, None, None], vcov, ucov))

    return update


def make_oc_step(iou_threshold: float, max_staleness: float,
                 speed_window: float, vdc_weight: float = 0.2,
                 ocr_iou: float = None, use_ocr: bool = True,
                 oru_steps: int = 4, new_track_thresh: float = 0.6,
                 nsa: bool = False):
    """Build the jitted single-frame OC-SORT step.

    Same signature as :func:`sort_tpu.make_sort_step`'s return value —
    scan/vmap/shard it exactly like the SORT step.
    """
    new_t = float(new_track_thresh)

    def new_track(dvalid, matched_d, conf):
        # OC-SORT starts tracks from confident detections only
        return dvalid & ~matched_d & (conf >= new_t)

    return make_sort_step(
        float(iou_threshold), float(max_staleness), float(speed_window),
        associate_fn=make_oc_associate(
            iou_threshold, vdc_weight,
            iou_threshold if ocr_iou is None else ocr_iou, use_ocr),
        new_track_fn=new_track,
        update_fn=make_oru_update(oru_steps, nsa=nsa))


class OcSortTracker(SortTracker):
    """Host-facing OC-SORT with the reference Tracker contract
    (``update(detections, timestamp, projector=None) → List[Detection]``,
    src/track/base.py:11-24). Detections that fail both association
    stages and the new-track threshold come back with
    ``track_id=None``."""

    def __init__(self, cfg: dict):
        import jax

        from .sort_tracker import parse_common_cfg
        parse_common_cfg(self, cfg)
        self.vdc_weight = float(cfg.get("vdc_weight", 0.2))
        ocr = cfg.get("ocr_iou")
        self.ocr_iou = float(ocr) if ocr is not None else self.iou_threshold
        self.use_ocr = bool(cfg.get("use_ocr", True))
        self.oru_steps = int(cfg.get("oru_steps", 4))
        self.new_track_thresh = float(cfg.get("new_track_thresh", 0.6))
        self._step = jax.jit(make_oc_step(
            self.iou_threshold, self.max_staleness, self.speed_window,
            vdc_weight=self.vdc_weight, ocr_iou=self.ocr_iou,
            use_ocr=self.use_ocr, oru_steps=self.oru_steps,
            new_track_thresh=self.new_track_thresh, nsa=self.nsa))
        from .sort_tpu import init_state
        self._state = init_state(self.track_slots)
        self._t0 = None
