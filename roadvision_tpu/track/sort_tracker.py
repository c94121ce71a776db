"""Host-facing SORT tracker with the reference's list-of-Detection API.

Wraps the vectorized device step (sort_tpu.py) behind the reference's
``update(detections, timestamp, projector=None) -> List[Detection]``
contract (src/track/sort_tracker.py:171-281). Config keys and defaults
preserved: max_staleness=1.0, min_hits=3, iou_threshold=0.3,
speed_window=0.75 (:174-178).

Timestamps are rebased to the first-seen time before hitting the device
(f32 cannot hold unix epochs). Detection capacity is fixed (static shapes);
``det_capacity`` (default 100 == detect.max_det) and ``track_slots``
(default 64) are TPU-native additions to the tracking config.
"""
from __future__ import annotations

from typing import Iterable, List, Optional

import jax
import numpy as np

from ..detect.types import Detection
from ..geometry import GroundProjector, HomographyProjector
from .base import Tracker
from .sort_tpu import SortState, init_state, make_sort_step


def parse_common_cfg(tracker, cfg: dict) -> None:
    """Shared host-Tracker config parsing — ONE implementation so the
    slot-capacity warning and the NSA default cannot drift between the
    backend classes (they did: deepsort silently dropped both).

    Sets max_staleness / min_hits / iou_threshold / speed_window /
    det_capacity / track_slots (+ the under-provisioned warning) and
    ``nsa`` with the same default rule as ``build_device_step`` (on for
    the strongsort preset), so the host list API and the fused engine
    path read a config identically.
    """
    tracker.max_staleness = float(cfg.get("max_staleness", 1.0))
    tracker.min_hits = int(cfg.get("min_hits", 3))
    tracker.iou_threshold = float(cfg.get("iou_threshold", 0.3))
    tracker.speed_window = float(cfg.get("speed_window", 0.75))
    tracker.det_capacity = int(cfg.get("det_capacity", 100))
    # auto-size slots to the detection capacity (the reference tracker
    # grows unbounded; fewer slots than concurrent dets drops tracks)
    slots_cfg = cfg.get("track_slots")
    tracker.track_slots = int(slots_cfg) if slots_cfg else \
        max(64, tracker.det_capacity)
    if tracker.track_slots < tracker.det_capacity:
        import warnings
        warnings.warn(
            f"track_slots={tracker.track_slots} < det_capacity="
            f"{tracker.det_capacity}: bursts of new objects will "
            f"silently drop tracks", stacklevel=3)
    backend = str(cfg.get("backend") or "").lower()
    tracker.nsa = bool(cfg.get("nsa", backend == "strongsort"))


class SortTracker(Tracker):
    def __init__(self, cfg: dict):
        parse_common_cfg(self, cfg)
        self.association = str(cfg.get("association", "greedy"))
        # one jitted step serves both paths: jax.jit specializes on the
        # proj pytree structure (None vs (H, origin, maxd))
        self._step = jax.jit(make_sort_step(
            self.iou_threshold, self.max_staleness, self.speed_window,
            self.min_hits, association=self.association,
            nsa=self.nsa))
        self._state: SortState = init_state(self.track_slots)
        self._t0: Optional[float] = None

    @property
    def state(self) -> SortState:
        return self._state

    def reset(self) -> None:
        self._state = init_state(self.track_slots)
        self._t0 = None

    def update(self, detections: Iterable[Detection], timestamp: float,
               projector: Optional[GroundProjector] = None) -> List[Detection]:
        det_list = list(detections)
        # reference clears stale enrichment on entry (:219-222)
        for det in det_list:
            det.track_id = None
            det.distance_m = None
            det.speed_kmh = None
        if len(det_list) > self.det_capacity:
            raise ValueError(
                f"{len(det_list)} detections exceed det_capacity="
                f"{self.det_capacity}")

        if self._t0 is None:
            self._t0 = float(timestamp)
        ts = np.float32(float(timestamp) - self._t0)

        cap = self.det_capacity
        boxes = np.zeros((cap, 4), np.float32)
        cls_id = np.zeros((cap,), np.int32)
        conf = np.zeros((cap,), np.float32)
        valid = np.zeros((cap,), bool)
        for i, d in enumerate(det_list):
            boxes[i] = (d.x1, d.y1, d.x2, d.y2)
            cls_id[i] = d.cls_id
            conf[i] = d.conf
            valid[i] = True

        proj = None
        if projector is not None:
            if not isinstance(projector, HomographyProjector):
                raise TypeError("device tracker requires a HomographyProjector")
            proj = projector.device_params()

        self._state, out = self._step(self._state, boxes, cls_id, conf,
                                      valid, ts, proj)

        ids = np.asarray(out.track_id)
        dist = np.asarray(out.distance_m)
        spd = np.asarray(out.speed_kmh)
        for i, det in enumerate(det_list):
            det.track_id = int(ids[i]) if ids[i] > 0 else None
            det.distance_m = float(dist[i]) if np.isfinite(dist[i]) else None
            det.speed_kmh = float(spd[i]) if np.isfinite(spd[i]) else None
        return det_list

    def close(self) -> None:
        self.reset()
