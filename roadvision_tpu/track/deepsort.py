"""DeepSORT-style appearance re-identification tracker backend.

Beyond-reference tracking addition (the reference's SORT is motion-only,
src/track/sort_tracker.py — when the Kalman prediction drifts through a
long occlusion the identity is lost). ``tracking.backend: "deepsort"``
augments the association with an appearance similarity in the spirit of
DeepSORT (Wojke et al.: motion gate + appearance cosine distance):

  * per-detection descriptors come in through the step's ``emb``
    argument (the fused engine computes them on device from the
    processed frame — track/appearance.py — so the tracker pays no
    extra host round-trip; without embeddings the backend degrades to
    plain SORT's predicted-IoU association);
  * affinity = IoU + ``app_weight`` · max(cos, 0) over pairs that pass
    the gate: predicted IoU ≥ ``iou_threshold`` (the motion gate), OR
    cos ≥ ``app_thresh`` with IoU ≥ ``rescue_iou`` (appearance rescue —
    a drifted track may re-acquire its object on looks alone, the
    deep-metric analogue of OC-SORT's last-observation recovery);
  * matched tracks keep an EMA of their descriptors
    (sort_tpu.SortState.app, APP_EMA), renormalized each update.

TPU-first: the cosine matrix is one (T, E)·(E, D) matmul; the gate and
affinity are elementwise; matching reuses the parallel mutual-maximum
exact-greedy kernel. The whole backend is the strategy hooks of
sort_tpu.make_sort_step — scan/vmap/shard it exactly like SORT.
"""
from __future__ import annotations

import jax.numpy as jnp

from .appearance import EMB_DIM, box_embeddings  # noqa: F401 (re-export)
from .sort_tpu import greedy_associate, make_sort_step
from .sort_tracker import SortTracker


def make_deepsort_associate(iou_threshold: float, app_weight: float,
                            app_thresh: float, rescue_iou: float):
    """Appearance-augmented association strategy (make_sort_step hook)."""
    iou_t = float(iou_threshold)
    w_app = float(app_weight)
    cos_t = float(app_thresh)
    resc = float(rescue_iou)

    def associate(iou, alive, dvalid, conf, ctx):
        del conf
        state, _boxes, _ts, emb = ctx
        if emb is None:
            # no descriptors supplied → plain SORT association
            return greedy_associate(iou, alive, dvalid, iou_t)
        cos = state.app @ emb.T                     # (T, D)
        # tracks with an empty appearance memory contribute cos 0
        gate = (iou >= iou_t) | ((cos >= cos_t) & (iou >= resc))
        affinity = iou + w_app * jnp.maximum(cos, 0.0)
        score = jnp.where(gate, affinity, 0.0)
        return greedy_associate(score, alive, dvalid, 1e-6)

    return associate


def make_deepsort_step(iou_threshold: float, max_staleness: float,
                       speed_window: float, app_weight: float = 0.5,
                       app_thresh: float = 0.6,
                       rescue_iou: float = 0.02,
                       new_track_thresh: float = 0.6,
                       nsa: bool = False):
    """Build the jitted single-frame DeepSORT-style step.

    Same signature as :func:`sort_tpu.make_sort_step`'s return value;
    pass the per-detection descriptors as the trailing ``emb`` argument
    (``step(state, boxes, cls, conf, dvalid, ts, proj, emb)``).
    """
    new_t = float(new_track_thresh)

    def new_track(dvalid, matched_d, conf):
        # confident detections only (re-id trackers avoid seeding
        # identities from noise — matches the ByteTrack/OC-SORT policy)
        return dvalid & ~matched_d & (conf >= new_t)

    return make_sort_step(
        float(iou_threshold), float(max_staleness), float(speed_window),
        associate_fn=make_deepsort_associate(
            iou_threshold, app_weight, app_thresh, rescue_iou),
        new_track_fn=new_track, nsa=nsa)


class DeepSortTracker(SortTracker):
    """Host-facing DeepSORT-style tracker with the reference Tracker
    contract (``update(detections, timestamp, projector=None)``,
    src/track/base.py:11-24).

    The list API carries no pixels, so this host surface runs the
    appearance-augmented step WITHOUT descriptors (pure motion — i.e.
    SORT association with the re-id start policy); the appearance path
    is engine-resident (runtime/engine.py computes embeddings on device
    when ``tracking.backend: deepsort``). Kept so config-driven backend
    swaps never break the host API.
    """

    def __init__(self, cfg: dict):
        import jax

        from .sort_tracker import parse_common_cfg
        parse_common_cfg(self, cfg)   # incl. nsa default on "strongsort"
        self._step = jax.jit(make_deepsort_step(
            self.iou_threshold, self.max_staleness, self.speed_window,
            app_weight=float(cfg.get("app_weight", 0.5)),
            app_thresh=float(cfg.get("app_thresh", 0.6)),
            rescue_iou=float(cfg.get("rescue_iou", 0.02)),
            new_track_thresh=float(cfg.get("new_track_thresh", 0.6)),
            nsa=self.nsa))
        from .sort_tpu import init_state
        self._state = init_state(self.track_slots)
        self._t0 = None
