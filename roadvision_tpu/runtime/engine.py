"""Batched pipeline engine — the TPU-native inversion of the reference loop.

The reference processes one frame at a time through five Python stages with
two host↔device round-trips per frame (SURVEY.md §3.1). Here the WHOLE
per-batch step — preprocess chain → letterbox → YOLOv8 forward → DFL decode
→ NMS → box rescale → SORT scan over the batch's time axis → geometry — is
a single jit-compiled function:

    host decode → one uint8 transfer → [device: everything] → one transfer back

Tracking is sequential in time by nature; inside the step it is a
``lax.scan`` over the batch's frames carrying the fixed-capacity track
state, which also persists on device across batches (SURVEY.md §2.5: the
sequence dimension of this domain is video time). The host thread only
decodes, overlaps the next batch's decode with device compute (double
buffering), and rasterizes overlays on returned frames.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..detect.base import Detector
from ..detect.types import COCO_NAMES, Detection
from ..geometry import HomographyProjector, build_projector
from ..geometry.projector import distance_device, project_boxes_device
from ..io_video.capture import VideoSource
from ..ops.letterbox import axis_plan, finish_letterbox, scale_boxes
from ..ops.nms import nms_batch
from ..preprocess import PreprocessPipeline
from ..track.registry import build_device_step
from ..track.sort_tpu import SortState, init_state
from ..utils import StageTimer, get_logger

log = get_logger("roadvision.engine")


class FrameResult(NamedTuple):
    raw: np.ndarray          # (H, W, 3) uint8 BGR
    proc: np.ndarray         # (H, W, 3) uint8 BGR
    detections: List[Detection]
    ts: float


GATE_BLOCK = 8   # motion-probe pooling block (thumbnail px per side)


def _motion_score(frames_u8: jnp.ndarray, prev_thumb: jnp.ndarray,
                  prev_valid: jnp.ndarray):
    """Temporal-gate motion probe → (score, last_thumbnail).

    Score = max over consecutive gray-thumbnail pairs (including the
    carried previous batch's last frame, so batch-boundary motion is
    never invisible) of the max BLOCKWISE mean abs diff (u8 levels).
    Blockwise, not global: a distant moving vehicle covers a handful of
    thumbnail pixels, and a whole-frame mean would dilute it ~16000×
    below any usable threshold; an 8×8-px block dilutes it at most
    ~64× while the thumbnail's area averaging keeps sensor noise well
    under 1 level. The first pair scores +inf when no previous batch
    exists (prev_valid 0) — an unknown past never gates.

    Rides the fused step's outputs — a separate probe dispatch costs a
    full tunnel round trip per batch (measured net-negative on a
    high-latency attach)."""
    from ..track.gmc import GMC_SIZE, gray_thumbnail
    g = jax.vmap(gray_thumbnail)(frames_u8)            # (B, G, G)
    prev = jnp.concatenate([prev_thumb[None], g[:-1]], axis=0)
    d = jnp.abs(g - prev)                              # (B, G, G)
    nb = GMC_SIZE // GATE_BLOCK
    b = d.shape[0]
    blocks = d.reshape(b, nb, GATE_BLOCK, nb, GATE_BLOCK).mean((2, 4))
    per_pair = blocks.max((1, 2))                      # (B,)
    first = jnp.where(prev_valid > 0, per_pair[0], -jnp.inf)
    score = jnp.maximum(first, jnp.max(per_pair[1:], initial=-jnp.inf))
    # no observable pair at all (batch of 1, no carried thumbnail):
    # an unknown past must never gate
    score = jnp.where(jnp.isinf(score), jnp.inf, score)
    return score, g[-1]


def unpack_detections(arrays, names: List[str], b: int,
                      extra_kind: str = "masks") -> List[List[Detection]]:
    """Masked fixed-shape device arrays → per-frame Detection lists.

    One vectorized pass over the whole batch: compress the masked slots
    with numpy, convert to python scalars in bulk, then build only the
    valid Detection objects (the b×max_det python double loop was the
    host-side ceiling at device rates). Shared by the single-stream and
    sharded multi-stream engines. An 8th array carries the segment
    task's masks, the pose task's keypoints, or the obb task's rotated
    boxes — ``extra_kind`` ("masks" | "keypoints" | "rboxes") says
    which Detection field it fills.
    """
    masks = kpts = rbs = None
    if len(arrays) == 8:   # segment masks / pose kpts / obb rboxes
        boxes, conf, cls_id, valid, ids, dist, speed, extra = arrays
        if extra_kind == "keypoints":
            kpts = extra
        elif extra_kind == "rboxes":
            rbs = extra
        else:
            masks = extra
    else:
        boxes, conf, cls_id, valid, ids, dist, speed = arrays
    fi, sj = np.nonzero(valid)
    vb = boxes[fi, sj].tolist()
    vconf = conf[fi, sj].tolist()
    vcls = cls_id[fi, sj].tolist()
    vids = ids[fi, sj].tolist()
    vdist = dist[fi, sj]
    vspeed = speed[fi, sj]
    dist_ok = np.isfinite(vdist)
    speed_ok = np.isfinite(vspeed)
    vdist = vdist.tolist()
    vspeed = vspeed.tolist()
    per_frame: List[List[Detection]] = [[] for _ in range(b)]
    n_names = len(names)
    for n, (i, k) in enumerate(zip(fi.tolist(), vcls)):
        x1, y1, x2, y2 = vb[n]
        per_frame[i].append(Detection(
            x1, y1, x2, y2, vconf[n], k,
            names[k] if 0 <= k < n_names else str(k),
            track_id=vids[n] if vids[n] > 0 else None,
            distance_m=vdist[n] if dist_ok[n] else None,
            speed_kmh=vspeed[n] if speed_ok[n] else None,
            mask=(masks[fi[n], sj[n]] if masks is not None else None),
            keypoints=(kpts[fi[n], sj[n]] if kpts is not None else None),
            rbox=(rbs[fi[n], sj[n]] if rbs is not None else None)))
    return per_frame


class PipelineEngine:
    """Config-driven end-to-end engine with the reference's soft-fail
    construction semantics (main_preview.py:61-78): tracker/projector build
    failures degrade to None with a warning."""

    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        tpu_cfg = cfg.get("tpu", {}) or {}
        self.batch_size = int(tpu_cfg.get("batch_size", 8))

        self.pipeline = PreprocessPipeline(cfg.get("preprocess", {}) or {})

        det_cfg = dict(cfg.get("detect", {}) or {})
        # tpu.compute_dtype governs the conv path unless detect overrides it
        det_cfg.setdefault("compute_dtype",
                           tpu_cfg.get("compute_dtype", "bfloat16"))
        # model-name dispatched backend: YOLOJax for the YOLO families,
        # RTDETRJax for rtdetr-* (detect/registry.py) — both expose the
        # step-builder surface (letterbox/forward_fn/params/max_det)
        self.detector: Optional[Detector] = None
        if det_cfg.get("enabled", False):
            from ..detect.registry import build_detector
            self.detector = build_detector(det_cfg)
        self.max_det = int(det_cfg.get("max_det", 100))

        # Fixed-capacity track slots. The reference grows its track list
        # unbounded; with slots < max_det a burst of new objects would
        # silently drop tracks, so auto-size to max_det and warn on an
        # explicit under-provisioned override.
        slots_cfg = tpu_cfg.get("track_slots")
        self.track_slots = int(slots_cfg) if slots_cfg else \
            max(64, self.max_det)
        if self.track_slots < self.max_det:
            log.warning(
                "tpu.track_slots=%d < detect.max_det=%d: more than %d "
                "concurrent new objects will drop tracks (the reference "
                "tracker grows unbounded)", self.track_slots, self.max_det,
                self.track_slots)

        track_cfg = cfg.get("tracking", {}) or {}
        self.track_enabled = bool(track_cfg.get("enabled", False)) \
            and self.detector is not None
        self._sort_step = None
        if self.track_enabled:
            try:
                # backend-aware (sort / bytetrack) — every backend shares
                # the SortState step contract, so the fused device path
                # below is identical either way
                self._sort_step = build_device_step(track_cfg)
            except Exception as exc:  # soft fail (main_preview.py:66-70)
                log.warning("tracker init failed: %s", exc)
                self.track_enabled = False

        # per-detection appearance descriptors for the re-id backends:
        # handcrafted grid signature by default (track/appearance.py),
        # or the learned embedder when tracking.reid_weights points at a
        # trained checkpoint (track/reid.py, tools/train_reid.py) — same
        # vector contract, so association/EMA downstream are unchanged
        self._embed_fn = None
        if self._sort_step is not None and \
                getattr(self._sort_step, "needs_embeddings", False):
            from ..track.appearance import box_embeddings
            self._embed_fn = box_embeddings
            reid_w = track_cfg.get("reid_weights")
            if reid_w:
                try:
                    from ..track.reid import (load_reid_params,
                                              make_reid_embed)
                    self._embed_fn = make_reid_embed(
                        load_reid_params(reid_w))
                    log.info("re-id: learned embedder from %s", reid_w)
                except Exception as exc:  # soft fail, keep grid descriptor
                    log.warning("re-id weights %s unusable (%s); using "
                                "the grid descriptor", reid_w, exc)

        # camera-motion compensation (track/gmc.py): device-side phase
        # correlation; the carried previous-frame thumbnail lives here
        # (the sharded multi-stream engine carries an (S, G, G) stack
        # per stream — parallel/inference.py)
        backend_name = str(track_cfg.get("backend") or "sort").lower()
        self.gmc_enabled = self.track_enabled \
            and bool(track_cfg.get("gmc", backend_name == "strongsort"))
        self._gmc_prev = None

        geom_cfg = cfg.get("geometry", {}) or {}
        self.projector: Optional[HomographyProjector] = None
        if geom_cfg.get("enabled", False):
            try:
                proj = build_projector(geom_cfg)
                if isinstance(proj, HomographyProjector):
                    self.projector = proj
            except Exception as exc:  # soft fail (main_preview.py:74-78)
                log.warning("projector init failed: %s", exc)

        self.sort_state: Optional[SortState] = \
            init_state(self.track_slots) if self.track_enabled else None
        self._t0: Optional[float] = None
        self._jit_cache: Dict[Tuple[int, int, int], Any] = {}
        self.timer = StageTimer()

        # device-step watchdog: a dispatch that blocks far beyond the
        # steady-state rate usually means the backend stalled (remote
        # attach hiccup, preempted chip). Warn — never kill — and skip
        # the first call per compiled shape (that one IS minutes-long
        # compilation). 0 disables.
        self._sampled_pre = bool(tpu_cfg.get("sampled_preprocess", False))
        self._watchdog_s = float(tpu_cfg.get("watchdog_s", 60.0))
        self._warmed: set = set()
        self.watchdog_fired = threading.Event()

        # temporal gating (detect.temporal_gate): on near-static scenes
        # skip the detector forward entirely and coast the tracker with
        # the last full batch's final detections — the "Fast YOLO"
        # motion-adaptive inference pattern. Policy runs on the HOST
        # with a one-batch lag (the motion probe result of batch i
        # gates batch i+2 in the pipelined stream), so no sync is ever
        # inserted into the dispatch path.
        gcfg = (det_cfg.get("temporal_gate") or {}) \
            if self.detector is not None else {}
        self._gate_cfg: Optional[Dict[str, float]] = None
        if gcfg.get("enable"):
            if getattr(self.detector, "task", "detect") != "detect" \
                    or getattr(self.detector, "tile_cfg", None):
                raise ValueError(
                    "detect.temporal_gate supports the plain detect task "
                    "without tiling (coasting has no defined semantics "
                    "for masks/keypoints/rboxes or tiled candidates)")
            if self.gmc_enabled:
                raise ValueError(
                    "detect.temporal_gate and tracking.gmc are mutually "
                    "exclusive (camera motion raises the gate's motion "
                    "score, so the scene never qualifies as static)")
            self._gate_cfg = dict(
                thresh=float(gcfg.get("thresh", 1.5)),
                max_skip=int(gcfg.get("max_skip_batches", 3)))
        self._gate_score: Optional[float] = None
        self._gate_skips = 0
        self._gate_dets = None          # device (boxes, conf, cls, valid)
        self._gate_thumb = None         # device (G, G) thumbnail carry
        self.gate_frames_coasted = 0    # observability + tests
        self._coast_cache: Dict[Tuple[Tuple[int, int, int], bool], Any] = {}

    # ------------------------------------------------------------------
    def _build_step(self, shape: Tuple[int, int, int],
                    want_proc: bool = True):
        return jax.jit(self.build_raw_step(shape, want_proc),
                       donate_argnums=(1,))

    def _dets_tail(self, b: int, max_det: int, w: int, proj, sort_step,
                   sort_state, boxes, conf, cls_id, valid, ts, frames_u8,
                   gmc_prev=None, gmc_valid=None):
        """Shared tracker/geometry tail of the full AND coast steps
        (traced inside both): detections → (ids, dist, speed,
        last_gray). Keeping one implementation means a sort_step
        contract change cannot silently diverge the coasted frames'
        outputs from the full ones."""
        last_gray = None
        if self.track_enabled:
            feed = [boxes, cls_id, conf, valid, ts]
            needs_emb = getattr(sort_step, "needs_embeddings", False)
            if needs_emb:
                # re-id backend (deepsort/botsort): per-det appearance
                # descriptors, computed on device from the RAW frames
                # (stable across preprocess settings; proc may not even
                # exist on the sampled path)
                feed.append(jax.vmap(self._embed_fn)(frames_u8,
                                                     boxes, valid))
            use_gmc = gmc_prev is not None
            if use_gmc:
                # camera-motion compensation: device phase correlation
                # between consecutive gray thumbnails
                from ..track.gmc import (GMC_SIZE, batch_shifts,
                                         gray_thumbnail)
                grays = jax.vmap(gray_thumbnail)(frames_u8)
                sx = max(1, w // GMC_SIZE)
                sy = max(1, frames_u8.shape[1] // GMC_SIZE)
                feed.append(batch_shifts(gmc_prev, grays, gmc_valid,
                                         (sx, sy)))
                last_gray = grays[-1]

            def body(st, frame):
                fb, fc, fcf, fv, ft, *rest = frame
                it = iter(rest)
                fe = next(it) if needs_emb else None
                fs = next(it) if use_gmc else None
                return sort_step(st, fb, fc, fcf, fv, ft, proj, fe, fs)
            sort_state, outs = jax.lax.scan(body, sort_state,
                                            tuple(feed))
            return (outs.track_id, outs.distance_m, outs.speed_kmh,
                    last_gray, sort_state)
        ids = jnp.zeros((b, max_det), jnp.int32)
        if proj is not None:
            # projector-only distance (main_preview.py:105-109)
            h_mat, origin, maxd = proj
            ground, gvalid = project_boxes_device(h_mat, boxes)
            dist = distance_device(ground, gvalid & valid, origin, maxd)
        else:
            dist = jnp.full((b, max_det), jnp.nan)
        speed = jnp.full((b, max_det), jnp.nan)
        return ids, dist, speed, None, sort_state

    def _detect_from_imgs(self, params, imgs, ratio, pad,
                          hw: Tuple[int, int]):
        """Letterboxed canvas → (boxes, conf, cls_id, valid) in source
        pixels, for the plain detect task (covers the YOLO single-pass,
        TTA, and the NMS-free rtdetr conventions). Shared by the fused
        raw step and the device-resident gated step's full branch so the
        two cannot drift."""
        det = self.detector
        h, w = hw
        if getattr(det, "nms_free", False):
            # rtdetr: suppression is learned — score threshold →
            # classes_keep → top-k, then normalized [0,1] boxes map
            # to source pixels by (w, h) (stretch resize: ratio/pad
            # are identity, so the shared scale_boxes is just the clip)
            from ..ops.nms import select_topk_batch
            boxes_n, probs = det.forward_fn(params, imgs)
            boxes, conf, cls_id, valid = select_topk_batch(
                boxes_n, probs, conf_thres=det.conf,
                max_det=det.max_det,
                classes_keep=det.keep if det.keep else None)
            boxes = boxes * jnp.asarray([w, h, w, h], jnp.float32)
        elif getattr(det, "tta", False):
            from ..ops.tta import tta_nms
            boxes, conf, cls_id, valid = tta_nms(
                det.forward_fn, params, imgs, conf=det.conf,
                iou=det.iou, max_det=det.max_det,
                classes_keep=det.keep if det.keep else None)
        else:
            boxes640, scores = det.forward_fn(params, imgs)
            boxes, conf, cls_id, valid = nms_batch(
                boxes640, scores, conf_thres=det.conf,
                iou_thres=det.iou, max_det=det.max_det, pre_topk=300,
                classes_keep=det.keep if det.keep else None)
        boxes = scale_boxes(boxes, ratio, pad, (h, w))
        return boxes, conf, cls_id, valid

    def build_raw_step(self, shape: Tuple[int, int, int],
                       want_proc: bool = True):
        """The un-jitted traced step — composable inside larger jitted
        loops (e.g. a device-resident lax.scan over many batches)."""
        b, h, w = shape
        pre = self.pipeline
        det = self.detector
        sort_step = self._sort_step
        proj = self.projector.device_params() if self.projector else None
        track = self.track_enabled
        max_det = det.max_det if det else self.max_det
        task = getattr(det, "task", "detect") if det else "detect"
        seg = task == "segment"
        pose = task == "pose"
        obb = task == "obb"
        nms_free = getattr(det, "nms_free", False)  # rtdetr set prediction

        # sampled-preprocess path: when nothing consumes the full
        # processed frame (want_proc=False) and the letterbox resize is a
        # pure strided slice, the chain's terminal op can evaluate only
        # at the sample grid (1/9 of the median/CLAHE-apply arithmetic at
        # 1080p) — bit-identical to full-chain-then-subsample (tested).
        # OPT-IN (tpu.sampled_preprocess): on this attach the stride-3
        # lane access pattern measured 3x SLOWER than streaming the full
        # plane (109 vs 360 fps headline) — strided int-plane reads
        # serialize; re-evaluate on real silicon.
        # tiled small-object inference (ops/tiling.py; detect task only,
        # validated at detector construction) — the grid is static per
        # (h, w), so the whole tiled pass stays one fixed-shape trace
        tiled = getattr(det, "tile_cfg", None) if det is not None else None
        if tiled is not None:
            from ..ops.tiling import tile_plan
            plan = tile_plan(h, w, tile=tiled["tile"],
                             overlap=tiled["overlap"])

        sampled_fn = None
        if self._sampled_pre and det is not None and not want_proc \
                and tiled is None and not nms_free \
                and not pre.identity and pre.supports_sampled():
            r = min(det.imgsz / h, det.imgsz / w)
            new_h, new_w = round(h * r), round(w * r)
            py, px = axis_plan(h, new_h), axis_plan(w, new_w)
            if py[0] == "slice" and px[0] == "slice":
                sampled_fn = pre.sampled_planes_fn(
                    (py[1], py[2], new_h), (px[1], px[2], new_w))

        def step(params, sort_state, frames_u8, ts,
                 gmc_prev=None, gmc_valid=None):
            if sampled_fn is not None:
                proc = jnp.zeros((), jnp.uint8)  # nothing reads full proc
            else:
                proc = frames_u8 if pre.identity else pre._batch_fn(frames_u8)
            if det is None:
                z = jnp.zeros((b, max_det), jnp.float32)
                empty = (jnp.zeros((b, max_det, 4), jnp.float32), z,
                         jnp.zeros((b, max_det), jnp.int32),
                         jnp.zeros((b, max_det), bool),
                         jnp.zeros((b, max_det), jnp.int32),
                         jnp.full((b, max_det), jnp.nan),
                         jnp.full((b, max_det), jnp.nan))
                return proc, empty, sort_state

            if sampled_fn is not None:
                small = jnp.stack(sampled_fn(frames_u8), axis=-1)
                imgs, ratio, pad = finish_letterbox(
                    small, (h, w), size=det.imgsz, rect=det.rect)
            elif tiled is None:
                imgs, ratio, pad = det.letterbox(proc)
            extra = None   # seg masks / pose keypoints (8th output)
            if tiled is not None:
                from ..ops.tiling import tiled_candidates
                boxes_all, scores_all = tiled_candidates(
                    det, params, proc, plan,
                    full_frame=tiled["full_frame"])
                # already in source coordinates (scale_boxes applied
                # per tile / per frame inside); pre_topk doubled — each
                # object occupies up to T overlap duplicates pre-merge
                boxes, conf, cls_id, valid = nms_batch(
                    boxes_all, scores_all, conf_thres=det.conf,
                    iou_thres=det.iou, max_det=det.max_det, pre_topk=600,
                    classes_keep=det.keep if det.keep else None)
            elif seg:
                from ..ops.masks import compose_masks
                boxes640, scores, coeffs, protos = det.forward_fn(params,
                                                                  imgs)
                boxes, conf, cls_id, valid, kidx = nms_batch(
                    boxes640, scores, conf_thres=det.conf,
                    iou_thres=det.iou, max_det=det.max_det, pre_topk=300,
                    classes_keep=det.keep if det.keep else None,
                    return_idx=True)
                kc = jnp.take_along_axis(coeffs, kidx[..., None], axis=1)
                extra = compose_masks(kc, protos, boxes, valid)
            elif pose:
                from ..models.yolo.yolov8_pose import scale_kpts
                boxes640, scores, kpts_all = det.forward_fn(params, imgs)
                boxes, conf, cls_id, valid, kidx = nms_batch(
                    boxes640, scores, conf_thres=det.conf,
                    iou_thres=det.iou, max_det=det.max_det, pre_topk=300,
                    classes_keep=det.keep if det.keep else None,
                    return_idx=True)
                kk = jnp.take_along_axis(
                    kpts_all, kidx[..., None, None], axis=1)
                extra = scale_kpts(kk, ratio, pad, (h, w))
            elif obb:
                from ..ops.obb import (nms_rotated_batch, rbox_to_aabb,
                                       scale_rboxes)
                rboxes640, scores = det.forward_fn(params, imgs)
                rb, conf, cls_id, valid = nms_rotated_batch(
                    rboxes640, scores, conf_thres=det.conf,
                    iou_thres=det.iou, max_det=det.max_det, pre_topk=300,
                    classes_keep=det.keep if det.keep else None)
                extra = scale_rboxes(rb, ratio, pad, (h, w))
                ab = rbox_to_aabb(extra)
                boxes = jnp.stack([jnp.clip(ab[..., 0], 0, w),
                                   jnp.clip(ab[..., 1], 0, h),
                                   jnp.clip(ab[..., 2], 0, w),
                                   jnp.clip(ab[..., 3], 0, h)], axis=-1)
            else:
                # plain detect task (single-pass / TTA / NMS-free) —
                # shared with the gated step's full branch
                boxes, conf, cls_id, valid = self._detect_from_imgs(
                    params, imgs, ratio, pad, (h, w))
            if tiled is None and extra is not None and not obb:
                # seg/pose boxes above are still in letterbox-canvas
                # space; obb's AABBs were built from ALREADY-scaled
                # rboxes (scale_rboxes), so scaling them again would
                # double-transform (r1-r3 did exactly that — the fused
                # step's obb AABBs disagreed with the standalone
                # detector's; fixed r4 + pinned by test_obb)
                boxes = scale_boxes(boxes, ratio, pad, (h, w))

            gate_on = self._gate_cfg is not None
            if gate_on and gmc_prev is None:
                # direct raw_step callers (bench scan) pass no carry:
                # score against an unknown past (never gates)
                from ..track.gmc import GMC_SIZE
                gmc_prev = jnp.zeros((GMC_SIZE, GMC_SIZE), jnp.float32)
                gmc_valid = jnp.float32(0.0)
            # gate and gmc are mutually exclusive (validated at init),
            # so the carry slots mean gmc thumbnails unless gating
            ids, dist, speed, last_gray, sort_state = self._dets_tail(
                b, det.max_det, w, proj, sort_step, sort_state,
                boxes, conf, cls_id, valid, ts, frames_u8,
                gmc_prev=None if gate_on else gmc_prev,
                gmc_valid=None if gate_on else gmc_valid)

            # returning the processed frames costs a (B,H,W,3) device→host
            # transfer; skip it when the caller only needs detections
            out_frames = proc if want_proc else jnp.zeros((), jnp.uint8)
            outs = (boxes, conf, cls_id, valid, ids, dist, speed)
            if extra is not None:   # segment masks / pose kpts
                outs = outs + (extra,)
            if last_gray is not None:   # GMC thumbnail carry
                return out_frames, outs, sort_state, last_gray
            if gate_on:
                # motion (score, thumbnail carry) ride the step — the
                # carry slots hold the previous batch's thumbnail here
                return out_frames, outs, sort_state, \
                    _motion_score(frames_u8, gmc_prev, gmc_valid)
            return out_frames, outs, sort_state

        return step

    def lb_meta(self, h: int, w: int):
        """(ratio, (left, top)) the device step letterboxed (h, w) frames
        with — host-computed, for pasting segment masks
        (ops.masks.paste_masks / vis.draw_masks) without extra device
        traffic. None when no detector is configured."""
        if self.detector is None:
            return None
        from ..ops.letterbox import letterbox_meta
        return letterbox_meta(h, w, size=self.detector.imgsz,
                              rect=self.detector.rect)

    def _step_for(self, shape, want_proc: bool = True):
        key = (shape, want_proc)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_step(shape, want_proc)
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # temporal gating (detect.temporal_gate)
    def _coast_for(self, shape, want_proc: bool = True):
        key = (shape, want_proc)
        if key not in self._coast_cache:
            self._coast_cache[key] = jax.jit(
                self.build_coast_step(shape, want_proc),
                donate_argnums=(1,))
        return self._coast_cache[key]

    def build_coast_step(self, shape: Tuple[int, int, int],
                         want_proc: bool = True):
        """The gated step: preprocess runs (display/record need it), the
        detector forward is SKIPPED, and the tracker/geometry tail runs
        on reused detections — one (max_det,)-set replicated across the
        batch's frames. Timestamps still advance, so KF updates against
        the unchanged boxes decay the speed estimates toward zero —
        exactly right for the static scene the gate certified."""
        b, h, w = shape
        pre = self.pipeline
        det = self.detector
        sort_step = self._sort_step
        proj = self.projector.device_params() if self.projector else None
        max_det = det.max_det

        def step(params, sort_state, frames_u8, ts,
                 boxes1, conf1, cls1, valid1, prev_thumb, prev_valid):
            proc = frames_u8 if pre.identity else pre._batch_fn(frames_u8)
            boxes = jnp.broadcast_to(boxes1[None], (b, max_det, 4))
            conf = jnp.broadcast_to(conf1[None], (b, max_det))
            cls_id = jnp.broadcast_to(cls1[None], (b, max_det))
            valid = jnp.broadcast_to(valid1[None], (b, max_det))
            ids, dist, speed, _, sort_state = self._dets_tail(
                b, max_det, w, proj, sort_step, sort_state,
                boxes, conf, cls_id, valid, ts, frames_u8)
            out_frames = proc if want_proc else jnp.zeros((), jnp.uint8)
            return (out_frames,
                    (boxes, conf, cls_id, valid, ids, dist, speed),
                    sort_state,
                    _motion_score(frames_u8, prev_thumb, prev_valid))

        return step

    def build_gated_scan_step(self, shape: Tuple[int, int, int]):
        """Device-resident temporal gate: the coast/full choice rides
        INSIDE the compiled step as a ``lax.cond`` on the motion score,
        so a ``lax.scan`` over batches gates at device rates with ZERO
        host policy (VERDICT r3 #4 — the host dispatch/collect loop's
        ±20% swing measured the tunnel, not the gate). Both branches
        are fixed-shape; XLA compiles both and executes one, so a
        coasted batch genuinely skips the detector forward's FLOPs.

        Tighter semantics than the pipelined host policy (which gates
        batch i+2 on the score of batch i): the score of THIS batch's
        own frames against the carried previous thumbnail gates THIS
        batch — any motion in the current batch forces a full pass, so
        coasting is never stale by more than the probe threshold.

        Returns ``(step, init_carry)`` where
        ``step(params, carry, frames_u8, ts) -> (outs, coasted, carry)``
        and outs is the 7-tuple the raw step emits. The carry holds
        (sort_state, thumb, thumb_valid, skips, gate_dets, gate_valid).
        """
        if self._gate_cfg is None:
            raise ValueError("detect.temporal_gate is not enabled")
        b, h, w = shape
        pre = self.pipeline
        det = self.detector
        sort_step = self._sort_step
        proj = self.projector.device_params() if self.projector else None
        max_det = det.max_det
        thresh = jnp.float32(self._gate_cfg["thresh"])
        max_skip = jnp.int32(self._gate_cfg["max_skip"])
        from ..track.gmc import GMC_SIZE

        def init_carry():
            gdets = (jnp.zeros((max_det, 4), jnp.float32),
                     jnp.zeros((max_det,), jnp.float32),
                     jnp.zeros((max_det,), jnp.int32),
                     jnp.zeros((max_det,), bool))
            state = self.sort_state if self.sort_state is not None \
                else init_state(self.track_slots)
            return (state, jnp.zeros((GMC_SIZE, GMC_SIZE), jnp.float32),
                    jnp.float32(0.0), jnp.int32(0), gdets,
                    jnp.bool_(False))

        def step(params, carry, frames_u8, ts):
            (sort_state, prev_thumb, prev_valid, skips, gdets,
             gvalid) = carry
            score, last_thumb = _motion_score(frames_u8, prev_thumb,
                                              prev_valid)
            proc = frames_u8 if pre.identity else pre._batch_fn(frames_u8)
            coast = (score < thresh) & (skips < max_skip) & gvalid

            def coast_fn(_):
                return (tuple(jnp.broadcast_to(g[None], (b,) + g.shape)
                              for g in gdets), gdets, skips + 1)

            def full_fn(_):
                imgs, ratio, pad = det.letterbox(proc)
                boxes, conf, cls_id, valid = self._detect_from_imgs(
                    params, imgs, ratio, pad, (h, w))
                new_g = (boxes[-1], conf[-1], cls_id[-1], valid[-1])
                return (boxes, conf, cls_id, valid), new_g, jnp.int32(0)

            dets4, gdets, skips = jax.lax.cond(coast, coast_fn, full_fn,
                                               None)
            ids, dist, speed, _, sort_state = self._dets_tail(
                b, max_det, w, proj, sort_step, sort_state, *dets4, ts,
                frames_u8)
            outs = dets4 + (ids, dist, speed)
            carry = (sort_state, last_thumb, jnp.float32(1.0), skips,
                     gdets, gvalid | ~coast)
            return outs, coast, carry

        return step, init_carry

    # ------------------------------------------------------------------
    def dispatch_batch(self, frames: np.ndarray, timestamps: np.ndarray,
                       want_proc: bool = True, device_frames=None):
        """Enqueue one batch on the device WITHOUT waiting for results.

        Returns an in-flight handle for :meth:`collect_batch`. JAX
        dispatch is asynchronous, so several batches can be in flight —
        the streaming driver keeps a small pipeline so the device→host
        round trip of batch i overlaps the compute of batch i+1 (on a
        high-latency attach the per-batch sync otherwise caps streaming
        throughput regardless of device speed)."""
        # auto-gate "auto" threshold resolves from the FIRST batch,
        # before the compiled step (which bakes it) first traces
        self.pipeline.ensure_gate_calibrated(frames)
        b, h, w = frames.shape[:3]
        if self._t0 is None:
            self._t0 = float(timestamps[0])
        ts_rel = (timestamps - self._t0).astype(np.float32)
        params = self.detector.params if self.detector else {}
        dev = device_frames if device_frames is not None \
            else jnp.asarray(frames)
        gate = self._gate_cfg
        score_dev = None
        coasted = gate is not None \
            and self._gate_score is not None \
            and self._gate_score < gate["thresh"] \
            and self._gate_skips < gate["max_skip"] \
            and self._gate_dets is not None
        if gate is not None:
            from ..track.gmc import GMC_SIZE
            prev = self._gate_thumb if self._gate_thumb is not None \
                else jnp.zeros((GMC_SIZE, GMC_SIZE), jnp.float32)
            pvalid = jnp.float32(0.0 if self._gate_thumb is None else 1.0)
            if coasted:
                step = self._coast_for((b, h, w), want_proc)
                proc, det_arrays, self.sort_state, \
                    (score_dev, self._gate_thumb) = step(
                        params, self.sort_state, dev, jnp.asarray(ts_rel),
                        *self._gate_dets, prev, pvalid)
                # skip accounting at DISPATCH time: in the pipelined
                # stream, collect-time accounting lags one batch and
                # overshoots the budget by one
                self._gate_skips += 1
                self.gate_frames_coasted += b
            else:
                step = self._step_for((b, h, w), want_proc)
                proc, det_arrays, self.sort_state, \
                    (score_dev, self._gate_thumb) = step(
                        params, self.sort_state, dev, jnp.asarray(ts_rel),
                        prev, pvalid)
                self._gate_skips = 0
                # the reusable set: the final frame's detections, kept
                # ON DEVICE (slicing the async output handles — no
                # host round trip)
                self._gate_dets = tuple(a[b - 1] for a in det_arrays[:4])
            # the policy score is read on the host at collect time
        elif self.gmc_enabled:
            from ..track.gmc import GMC_SIZE
            step = self._step_for((b, h, w), want_proc)
            prev = self._gmc_prev if self._gmc_prev is not None \
                else jnp.zeros((GMC_SIZE, GMC_SIZE), jnp.float32)
            valid = jnp.float32(0.0 if self._gmc_prev is None else 1.0)
            proc, det_arrays, self.sort_state, self._gmc_prev = step(
                params, self.sort_state, dev, jnp.asarray(ts_rel),
                prev, valid)
        else:
            step = self._step_for((b, h, w), want_proc)
            proc, det_arrays, self.sort_state = step(
                params, self.sort_state, dev, jnp.asarray(ts_rel))
        return (frames, timestamps, proc, det_arrays, want_proc,
                ((b, h, w), want_proc, coasted), score_dev, coasted)

    def collect_batch(self, inflight) -> List[FrameResult]:
        """Block until an in-flight batch completes; unpack results."""
        (frames, timestamps, proc_dev, det_arrays, want_proc, key,
         score_dev, coasted) = inflight
        b = frames.shape[0]
        dog = None
        if self._watchdog_s > 0 and key in self._warmed:
            def bark():
                self.watchdog_fired.set()
                log.warning(
                    "device step has run > %.0fs for batch shape %s — "
                    "backend may be stalled (step continues; this is a "
                    "diagnostic, not an abort)", self._watchdog_s, key[0])
            dog = threading.Timer(self._watchdog_s, bark)
            dog.daemon = True
            dog.start()
        try:
            with self.timer.stage("device_step"):
                proc = np.asarray(proc_dev) if want_proc else None
                arrays = [np.asarray(a) for a in det_arrays]
        finally:
            if dog is not None:
                dog.cancel()
            self._warmed.add(key)

        if score_dev is not None:
            # the score of THIS batch gates a later dispatch (all other
            # gate bookkeeping happens at dispatch time)
            self._gate_score = float(np.asarray(score_dev))

        if self.detector is not None:
            names = [self.detector.names.get(i, str(i))
                     for i in range(self.detector.nc)]
        else:
            names = list(COCO_NAMES)
        results = []
        kind = {"pose": "keypoints", "obb": "rboxes"}.get(
            getattr(self.detector, "task", "detect")
            if self.detector is not None else "detect", "masks")
        with self.timer.stage("host_unpack"):
            per_frame = unpack_detections(arrays, names, b,
                                          extra_kind=kind)
            for i in range(b):
                results.append(FrameResult(
                    frames[i], proc[i] if proc is not None else frames[i],
                    per_frame[i], float(timestamps[i])))
        return results

    def process_batch(self, frames: np.ndarray,
                      timestamps: np.ndarray,
                      want_proc: bool = True,
                      device_frames=None) -> List[FrameResult]:
        """(B, H, W, 3) BGR uint8 + (B,) float64 stamps → per-frame results.

        Synchronous convenience over dispatch/collect. ``device_frames``
        lets a prefetch thread start the host→device transfer early;
        ``want_proc=False`` skips the processed-frame return transfer
        (the detections are tiny)."""
        return self.collect_batch(self.dispatch_batch(
            frames, timestamps, want_proc=want_proc,
            device_frames=device_frames))

    # ------------------------------------------------------------------
    def stream(self, source: VideoSource, max_frames: Optional[int] = None,
               want_proc: bool = True) -> Iterator[FrameResult]:
        """Double-buffered streaming: decode + host→device transfer of
        batch i+1 overlap with the device compute of batch i."""
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def reader():
            count = 0
            try:
                while not stop.is_set():
                    n = self.batch_size
                    if max_frames is not None:
                        n = min(n, max_frames - count)
                        if n <= 0:
                            break
                    with self.timer.stage("decode"):
                        frames, ts, m = source.read_batch(n)
                    if m == 0:
                        break
                    # start the uint8 transfer now; jnp.asarray is async,
                    # so it overlaps the compute of the batch in flight
                    dev = jnp.asarray(frames)
                    q.put((frames, ts, dev))
                    count += m
            except Exception as exc:  # decode failure ends the stream
                log.warning("frame source failed: %s", exc)
            finally:
                q.put(None)  # always unblock the consumer

        thread = threading.Thread(target=reader, daemon=True)
        thread.start()
        # two batches in flight: the device→host round trip of batch i
        # overlaps the compute of batch i+1 (results arrive one batch
        # late, which realtime consumers don't observe — frames carry
        # their own timestamps)
        pending: "list" = []
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                frames, ts, dev = item
                pending.append(self.dispatch_batch(
                    frames, ts, want_proc=want_proc, device_frames=dev))
                if len(pending) >= 2:
                    yield from self.collect_batch(pending.pop(0))
            for inflight in pending:
                yield from self.collect_batch(inflight)
            pending = []
        finally:
            stop.set()
            # drain so the reader thread can exit
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            thread.join(timeout=2.0)

    def reset(self) -> None:
        if self.track_enabled:
            self.sort_state = init_state(self.track_slots)
        self._gmc_prev = None
        self._t0 = None
        # a new stream must not coast on the previous stream's
        # detections or motion score; the coast counter reports
        # per-stream
        self._gate_score = None
        self._gate_skips = 0
        self._gate_dets = None
        self._gate_thumb = None
        self.gate_frames_coasted = 0

    def save_state(self, path) -> None:
        """Checkpoint the device-resident stream state — the full
        SortState (identities, Kalman posteriors, histories, appearance
        memory), the camera-motion thumbnail, and the stream's ts epoch
        — so a long-running deployment can stop and resume EXACTLY
        (beyond-reference: §5 checkpoint/resume for inference, the
        analog of the training checkpoints in runtime/checkpoint.py).
        Host-side analytics state (roadvision_tpu/analytics.py) is
        driver-owned and not included."""
        data = {}
        if self.sort_state is not None:
            for k, v in zip(SortState._fields, self.sort_state):
                data[f"sort_{k}"] = np.asarray(v)
        data["t0"] = np.asarray(
            np.nan if self._t0 is None else self._t0, np.float64)
        if self._gmc_prev is not None:
            data["gmc_prev"] = np.asarray(self._gmc_prev)
        np.savez(path, **data)

    def load_state(self, path) -> None:
        """Restore a :meth:`save_state` checkpoint. The tracker slot
        count must match the current config."""
        with np.load(path) as z:
            if self.sort_state is not None:
                missing = [k for k in SortState._fields
                           if f"sort_{k}" not in z.files]
                if missing:
                    raise ValueError(
                        f"state file {path}: missing tracker arrays "
                        f"{missing} (saved without tracking?)")
                saved_slots = z["sort_alive"].shape[0]
                if saved_slots != self.track_slots:
                    raise ValueError(
                        f"state file {path}: {saved_slots} track slots, "
                        f"engine has {self.track_slots} "
                        f"(tpu.track_slots must match)")
                self.sort_state = SortState(
                    *[jnp.asarray(z[f"sort_{k}"])
                      for k in SortState._fields])
            t0 = float(z["t0"])
            self._t0 = None if np.isnan(t0) else t0
            self._gmc_prev = jnp.asarray(z["gmc_prev"]) \
                if "gmc_prev" in z.files else None
