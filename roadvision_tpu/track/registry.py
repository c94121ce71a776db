"""Tracker registry (reference: src/track/registry.py:10-14).

Table-driven like the preprocess registry, so additional association
backends (e.g. a Hungarian variant) plug in as new entries.

Two factories, one per calling convention:
  * :func:`build_tracker` — host-facing Tracker objects with the
    reference's ``update(dets, ts, projector)`` list API;
  * :func:`build_device_step` — the raw jit-traceable step the fused
    engine composes into its device-resident pipeline
    (runtime/engine.py), dispatching on the same ``backend`` key so a
    config drives both paths identically.
"""
from __future__ import annotations

from typing import Any, Dict, Type

from .base import Tracker
from .botsort import BotSortTracker, make_botsort_step
from .bytetrack import ByteTracker, make_byte_step
from .deepsort import DeepSortTracker, make_deepsort_step
from .ocsort import OcSortTracker, make_oc_step
from .sort_tracker import SortTracker
from .sort_tpu import make_sort_step

BACKENDS: Dict[str, Type[Tracker]] = {
    "sort": SortTracker,
    "bytetrack": ByteTracker,
    "ocsort": OcSortTracker,
    "deepsort": DeepSortTracker,
    # strongsort = the StrongSORT recipe (Du et al.) composed from the
    # framework's own parts: deepsort appearance association + NSA
    # Kalman (default on) + camera-motion compensation (the engine
    # defaults tracking.gmc on for this backend)
    "strongsort": DeepSortTracker,
    "botsort": BotSortTracker,
}


def build_tracker(cfg: Dict[str, Any]) -> Tracker:
    name = str(cfg.get("backend") or "sort").lower()
    try:
        cls = BACKENDS[name]
    except KeyError:
        raise ValueError(f"unknown tracking backend: {name}") from None
    return cls(cfg)


def build_device_step(cfg: Dict[str, Any]):
    """Un-jitted single-frame tracking step from a ``tracking:`` config.

    Signature of the returned step: ``step(state, boxes (D,4), cls (D,),
    conf (D,), dvalid (D,), ts (), proj) → (state', SortOutput)`` for
    every backend (ByteTrack shares SortState), so engine/scan/vmap
    composition is backend-agnostic.
    """
    name = str(cfg.get("backend") or "sort").lower()
    # NSA Kalman (StrongSORT/GIAOTracker): confidence-adaptive
    # measurement noise R~ = (1-conf)*R, available under every backend
    nsa = bool(cfg.get("nsa", name == "strongsort"))
    if name == "sort":
        return make_sort_step(
            float(cfg.get("iou_threshold", 0.3)),
            float(cfg.get("max_staleness", 1.0)),
            float(cfg.get("speed_window", 0.75)),
            int(cfg.get("min_hits", 3)),
            association=str(cfg.get("association", "greedy")),
            nsa=nsa)
    if name == "bytetrack":
        return make_byte_step(
            float(cfg.get("max_staleness", 1.0)),
            float(cfg.get("speed_window", 0.75)),
            track_high_thresh=float(cfg.get("track_high_thresh", 0.5)),
            track_low_thresh=float(cfg.get("track_low_thresh", 0.1)),
            new_track_thresh=float(cfg.get("new_track_thresh", 0.6)),
            match_iou=float(cfg.get("match_iou",
                                    cfg.get("iou_threshold", 0.3))),
            second_match_iou=float(cfg.get("second_match_iou", 0.5)),
            nsa=nsa)
    if name == "ocsort":
        ocr = cfg.get("ocr_iou")
        iou_t = float(cfg.get("iou_threshold", 0.3))
        return make_oc_step(
            iou_t,
            float(cfg.get("max_staleness", 1.0)),
            float(cfg.get("speed_window", 0.75)),
            vdc_weight=float(cfg.get("vdc_weight", 0.2)),
            ocr_iou=float(ocr) if ocr is not None else iou_t,
            use_ocr=bool(cfg.get("use_ocr", True)),
            oru_steps=int(cfg.get("oru_steps", 4)),
            new_track_thresh=float(cfg.get("new_track_thresh", 0.6)),
            nsa=nsa)
    if name in ("deepsort", "strongsort"):
        step = make_deepsort_step(
            float(cfg.get("iou_threshold", 0.3)),
            float(cfg.get("max_staleness", 1.0)),
            float(cfg.get("speed_window", 0.75)),
            app_weight=float(cfg.get("app_weight", 0.5)),
            app_thresh=float(cfg.get("app_thresh", 0.6)),
            rescue_iou=float(cfg.get("rescue_iou", 0.02)),
            new_track_thresh=float(cfg.get("new_track_thresh", 0.6)),
            nsa=nsa)
        step.needs_embeddings = True  # engine computes per-det descriptors
        return step
    if name == "botsort":
        step = make_botsort_step(
            float(cfg.get("max_staleness", 1.0)),
            float(cfg.get("speed_window", 0.75)),
            track_high_thresh=float(cfg.get("track_high_thresh", 0.5)),
            track_low_thresh=float(cfg.get("track_low_thresh", 0.1)),
            new_track_thresh=float(cfg.get("new_track_thresh", 0.6)),
            match_iou=float(cfg.get("match_iou",
                                    cfg.get("iou_threshold", 0.3))),
            second_match_iou=float(cfg.get("second_match_iou", 0.5)),
            app_weight=float(cfg.get("app_weight", 0.5)),
            app_thresh=float(cfg.get("app_thresh", 0.6)),
            rescue_iou=float(cfg.get("rescue_iou", 0.02)),
            nsa=nsa)
        step.needs_embeddings = True  # engine computes per-det descriptors
        return step
    raise ValueError(f"unknown tracking backend: {name}")
