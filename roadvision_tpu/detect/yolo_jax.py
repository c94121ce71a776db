"""Native JAX YOLOv8 detector backend.

Drop-in for the reference's Ultralytics wrapper
(src/detect/yolo_ultralytics.py:6-60) with the same config surface
(model/device/conf_thres/iou_thres/max_det/classes_keep) and ``infer(bgr) ->
List[Detection]`` contract. The whole per-batch step — letterbox →
backbone/head forward → DFL decode → class-aware NMS → classes_keep
post-filter → box rescale to source coordinates — is ONE jitted function
over a frame batch, specialized per input shape.

Weights come from the configured ``.pt``/``.npz`` checkpoint when present
(imported and BN-fused by models/yolo/weights.py); otherwise the graph runs
with random init (shape/NMS invariants still hold — the weights-free CI
mode of SURVEY.md §4).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolo import weights as yolo_weights
from ..models.yolo import yolov8
from ..ops.letterbox import letterbox_rect_u8, letterbox_u8, scale_boxes
from ..ops.nms import nms_batch
from .base import Detector
from .types import COCO_NAMES, Detection, DetectionBatch


def _size_from_model_name(name: str) -> str:
    base = str(name).lower()
    for v in ("yolov8", "yolov5", "yolo11"):
        for s in ("n", "s", "m", "l", "x"):
            if f"{v}{s}" in base:
                return s
    return "n"


class YOLOJax(Detector):
    def __init__(self, cfg: Dict[str, Any]):
        self.conf = float(cfg.get("conf_thres", 0.25))
        self.iou = float(cfg.get("iou_thres", 0.7))
        self.max_det = int(cfg.get("max_det", 100))
        self.keep = tuple(sorted(int(x) for x in cfg.get("classes_keep", [])))
        self.imgsz = int(cfg.get("imgsz", 640))
        # rect=True (default): minimal-rectangle letterbox — what the
        # reference's `model.predict` actually runs (LetterBox(auto=True),
        # yolo_ultralytics.py:28-35), and ~0.6× the conv FLOPs at 16:9;
        # rect=False: square canvas (the ONNX-export convention)
        self.rect = bool(cfg.get("rect", True))
        device = cfg.get("device", "auto")
        compute = str(cfg.get("compute_dtype", "bfloat16"))
        self.int8 = compute == "int8"
        self.dtype = jnp.bfloat16 if compute == "bfloat16" else jnp.float32
        if device == "cpu" and not self.int8:
            self.dtype = jnp.float32

        model_ref = cfg.get("model", "yolov8n.pt")
        size_hint = _size_from_model_name(model_ref)
        lname = str(model_ref).lower()
        arch_hint = "v5" if "yolov5" in lname \
            else "11" if "yolo11" in lname else "v8"
        # task: "detect" | "segment" | "pose" | "obb" | "auto" (from the
        # model name's "-seg"/"-pose"/"-obb" suffix, then from the
        # checkpoint's head)
        task = str(cfg.get("task", "auto"))
        if task == "auto":
            name = str(model_ref).lower()
            task = "segment" if "-seg" in name \
                else "pose" if "-pose" in name \
                else "obb" if "-obb" in name else "detect"
        self.params, self.arch, self.size, self.loaded = \
            yolo_weights.load_params(model_ref, size=size_hint,
                                     arch=arch_hint, task=task)
        head = "23" if self.arch == "11" else "22"
        if self.arch != "v5" and "cv4" in self.params.get(head, {}):
            # checkpoint head wins over the hint (cv4 final width: 1 =
            # angle branch, else keypoints — weights.detect_task logic)
            if "proto" in self.params[head]:
                task = "segment"
            elif self.params[head]["cv4"][0][2]["b"].shape[0] == 1:
                task = "obb"
            else:
                task = "pose"
        self.task = task
        if self.task in ("segment", "pose", "obb") and self.arch == "v5":
            raise ValueError(f"task '{self.task}' requires a YOLOv8 or "
                             f"YOLO11 {self.task} model")
        if not self.loaded:
            suffix = {"segment": "-seg", "pose": "-pose",
                      "obb": "-obb"}.get(task, "")
            print(f"[roadvision] weights '{model_ref}' not found — running "
                  f"yolo{self.arch}{self.size}{suffix} with random init")
        if self.arch == "v5":
            no = self.params["24"]["m"][0]["b"].shape[0]
            self.nc = no // 3 - 5
        else:
            self.nc = self.params[head]["cv3"][0][2]["b"].shape[0]
        if self.int8:
            from ..models.yolo.quant import quantize_params
            self.params = quantize_params(self.params)
            self.dtype = jnp.float32  # dequant/activation math
        # int8_calibration: N > 0 auto-calibrates static activation
        # scales from the first N stream frames (running abs-max), then
        # bakes them — the config-reachable path to calibrate_int8()
        self._calib_left = int(cfg.get("int8_calibration", 0)) \
            if self.int8 else 0
        self._calib_running = None
        self.names = {i: n for i, n in enumerate(COCO_NAMES)} \
            if self.nc == len(COCO_NAMES) else {i: str(i) for i in range(self.nc)}
        if self.task == "pose" and self.nc == 1:
            self.names = {0: "person"}   # -pose checkpoints are person-only
        if self.task == "obb" and self.nc == 15:
            from ..models.yolo.yolov8_obb import DOTA_NAMES
            self.names = dict(enumerate(DOTA_NAMES))
        # tiled small-object inference (ops/tiling.py): normalized to
        # None (off) or dict(tile, overlap, full_frame)
        tcfg = cfg.get("tiling") or {}
        self.tile_cfg: Optional[Dict[str, Any]] = None
        if tcfg.get("enable"):
            if self.task != "detect":
                raise ValueError(
                    f"detect.tiling supports the detect task only (got "
                    f"'{self.task}') — per-anchor side outputs have no "
                    f"defined cross-tile merge")
            self.tile_cfg = dict(
                tile=int(tcfg.get("tile", self.imgsz)),
                overlap=float(tcfg.get("overlap", 0.25)),
                full_frame=bool(tcfg.get("full_frame", True)))
        # test-time augmentation (ops/tta.py): the ultralytics
        # predict(augment=True) surface — accuracy-over-speed knob
        self.tta = bool(cfg.get("tta", False))
        if self.tta and self.task != "detect":
            raise ValueError(f"detect.tta supports the detect task only "
                             f"(got '{self.task}') — the augmented "
                             f"candidate merge is box/score-level")
        if self.tta and self.tile_cfg:
            raise ValueError("detect.tta and detect.tiling are mutually "
                             "exclusive (both multiply the candidate set)")
        if self.tta and self.imgsz % 32 != 0:
            # clip_bounds trims whole anchor LEVELS, which exist only when
            # the canvas is a stride-32 multiple (ultralytics enforces the
            # same via check_imgsz); rect letterbox rounds to 32 anyway,
            # but rect:false builds an imgsz x imgsz canvas verbatim
            raise ValueError(
                f"detect.tta needs detect.imgsz to be a multiple of 32 "
                f"(got {self.imgsz}): the augmented-pass anchor trim is "
                f"level-aligned only on stride-32 canvases")
        self._jit_cache: Dict[Tuple[int, int, int], Any] = {}

    # ------------------------------------------------------------------
    def letterbox(self, frames_u8):
        """The configured letterbox transform (square or rect)."""
        if self.rect:
            return letterbox_rect_u8(frames_u8, size=self.imgsz)
        return letterbox_u8(frames_u8, size=self.imgsz)

    def forward_fn(self, params, imgs):
        """Letterboxed images → (boxes, scores[, coeffs, protos]),
        arch/task-dispatched."""
        if self.arch == "v5":
            from ..models.yolo import yolov5
            return yolov5.forward(params, imgs, size=self.size, nc=self.nc,
                                  dtype=self.dtype)
        if self.task == "segment":
            from ..models.yolo import yolov8_seg
            return yolov8_seg.forward_seg(params, imgs, size=self.size,
                                          nc=self.nc, dtype=self.dtype,
                                          arch=self.arch)
        if self.task == "pose":
            from ..models.yolo import yolov8_pose
            return yolov8_pose.forward_pose(params, imgs, size=self.size,
                                            nc=self.nc, dtype=self.dtype,
                                            arch=self.arch)
        if self.task == "obb":
            from ..models.yolo import yolov8_obb
            return yolov8_obb.forward_obb(params, imgs, size=self.size,
                                          nc=self.nc, dtype=self.dtype,
                                          arch=self.arch)
        if self.arch == "11":
            from ..models.yolo import yolo11
            return yolo11.forward_11(params, imgs, size=self.size,
                                     nc=self.nc, dtype=self.dtype)
        return yolov8.forward(params, imgs, size=self.size, nc=self.nc,
                              dtype=self.dtype)

    def forward_fn_raw(self, params, imgs):
        """Un-jitted forward — for calibration passes that must observe
        conv execution order / live param dicts (models/yolo/quant.py)."""
        if self.arch == "v5":
            from ..models.yolo import yolov5
            return yolov5.forward_raw(params, imgs, size=self.size,
                                      nc=self.nc, dtype=self.dtype)
        if self.task == "segment":
            from ..models.yolo import yolov8_seg
            return yolov8_seg.forward_seg_raw(params, imgs, size=self.size,
                                              nc=self.nc, dtype=self.dtype,
                                              arch=self.arch)
        if self.task == "pose":
            from ..models.yolo import yolov8_pose
            return yolov8_pose.forward_pose_raw(params, imgs,
                                                size=self.size,
                                                nc=self.nc,
                                                dtype=self.dtype,
                                                arch=self.arch)
        if self.task == "obb":
            from ..models.yolo import yolov8_obb
            return yolov8_obb.forward_obb_raw(params, imgs,
                                              size=self.size, nc=self.nc,
                                              dtype=self.dtype,
                                              arch=self.arch)
        if self.arch == "11":
            from ..models.yolo import yolo11
            return yolo11.forward_raw_11(params, imgs, size=self.size,
                                         nc=self.nc, dtype=self.dtype)
        return yolov8.forward_raw(params, imgs, size=self.size, nc=self.nc,
                                  dtype=self.dtype)

    def _build_fn(self, shape: Tuple[int, int, int]):
        conf, iou, max_det, keep = self.conf, self.iou, self.max_det, self.keep
        h, w = shape[1], shape[2]
        params = self.params
        fwd = self.forward_fn
        lbox = self.letterbox

        if self.task == "segment":
            from ..ops.masks import compose_masks

            @jax.jit
            def run_seg(params, frames_u8):
                imgs, ratio, pad = lbox(frames_u8)
                boxes640, scores, coeffs, protos = fwd(params, imgs)
                b, c, k, v, idx = nms_batch(
                    boxes640, scores, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, pre_topk=300,
                    classes_keep=keep if keep else None, return_idx=True)
                kc = jnp.take_along_axis(coeffs, idx[..., None], axis=1)
                # crop in letterbox space (pre-rescale boxes)
                masks = compose_masks(kc, protos, b, v)
                b = scale_boxes(b, ratio, pad, (h, w))
                return b, c, k, v, masks, ratio, pad

            return functools.partial(run_seg, params)

        if self.task == "pose":
            from ..models.yolo.yolov8_pose import scale_kpts

            @jax.jit
            def run_pose(params, frames_u8):
                imgs, ratio, pad = lbox(frames_u8)
                boxes640, scores, kpts = fwd(params, imgs)
                b, c, k, v, idx = nms_batch(
                    boxes640, scores, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, pre_topk=300,
                    classes_keep=keep if keep else None, return_idx=True)
                kk = jnp.take_along_axis(
                    kpts, idx[..., None, None], axis=1)
                kk = scale_kpts(kk, ratio, pad, (h, w))
                b = scale_boxes(b, ratio, pad, (h, w))
                return b, c, k, v, kk

            return functools.partial(run_pose, params)

        if self.task == "obb":
            from ..ops.obb import (nms_rotated_batch, rbox_to_aabb,
                                   scale_rboxes)

            @jax.jit
            def run_obb(params, frames_u8):
                imgs, ratio, pad = lbox(frames_u8)
                rboxes640, scores = fwd(params, imgs)
                rb, c, k, v = nms_rotated_batch(
                    rboxes640, scores, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, pre_topk=300,
                    classes_keep=keep if keep else None)
                rb = scale_rboxes(rb, ratio, pad, (h, w))
                # the compatible axis-aligned surface: enclosing AABB,
                # clamped to the frame like scale_boxes
                ab = rbox_to_aabb(rb)
                ab = jnp.stack([jnp.clip(ab[..., 0], 0, w),
                                jnp.clip(ab[..., 1], 0, h),
                                jnp.clip(ab[..., 2], 0, w),
                                jnp.clip(ab[..., 3], 0, h)], axis=-1)
                return ab, c, k, v, rb

            return functools.partial(run_obb, params)

        if self.tile_cfg:
            from ..ops.tiling import tile_plan, tiled_candidates
            plan = tile_plan(h, w, tile=self.tile_cfg["tile"],
                             overlap=self.tile_cfg["overlap"])
            full = self.tile_cfg["full_frame"]
            det = self

            @jax.jit
            def run_tiled(params, frames_u8):
                boxes_all, scores_all = tiled_candidates(
                    det, params, frames_u8, plan, full_frame=full)
                # candidates are already in source coordinates; pre_topk
                # doubled vs the single-pass 300 — each object occupies
                # up to T overlap duplicates pre-merge
                return nms_batch(boxes_all, scores_all, conf_thres=conf,
                                 iou_thres=iou, max_det=max_det,
                                 pre_topk=600,
                                 classes_keep=keep if keep else None)

            return functools.partial(run_tiled, params)

        if self.tta:
            from ..ops.tta import tta_nms

            @jax.jit
            def run_tta(params, frames_u8):
                imgs, ratio, pad = lbox(frames_u8)
                b, c, k, v = tta_nms(fwd, params, imgs, conf=conf, iou=iou,
                                     max_det=max_det,
                                     classes_keep=keep if keep else None)
                b = scale_boxes(b, ratio, pad, (h, w))
                return b, c, k, v

            return functools.partial(run_tta, params)

        @jax.jit
        def run(params, frames_u8):
            imgs, ratio, pad = lbox(frames_u8)
            boxes640, scores = fwd(params, imgs)
            b, c, k, v = nms_batch(boxes640, scores, conf_thres=conf,
                                   iou_thres=iou, max_det=max_det,
                                   pre_topk=300,
                                   classes_keep=keep if keep else None)
            b = scale_boxes(b, ratio, pad, (h, w))
            return b, c, k, v

        return functools.partial(run, params)

    def calibrate_int8(self, frames_u8, batch_size: int = 8) -> int:
        """Bake static per-conv activation scales from calibration frames.

        ``frames_u8``: (N, H, W, 3) BGR uint8 representative frames (the
        first seconds of the deployment's own stream work well). Scales
        are the running abs-max over all batches (models/yolo/quant.py);
        afterwards every conv skips its dynamic abs-max reduction — the
        measured overhead that made dynamic int8 trail bf16. Returns the
        number of convs calibrated. Compiled steps rebind automatically
        (params are a traced argument); call BEFORE the hot loop to
        avoid a mid-stream retrace.
        """
        if not self.int8:
            raise RuntimeError("calibrate_int8 requires "
                               "detect.compute_dtype: 'int8'")
        frames = np.asarray(frames_u8)
        if frames.ndim == 3:
            frames = frames[None]
        for i in range(0, frames.shape[0], batch_size):
            self._calib_collect(frames[i:i + batch_size])
        self._calib_left = 0  # manual call supersedes the auto counter
        return self._calib_finalize()

    def _calib_collect(self, frames_u8: np.ndarray) -> None:
        """Fold one batch's dynamic scales into the running abs-max."""
        from ..models.yolo import quant
        if not hasattr(self, "_calib_jit"):
            self._calib_jit = jax.jit(functools.partial(
                quant.capture_scales, self.forward_fn_raw))
        imgs, _, _ = self.letterbox(jnp.asarray(frames_u8))
        s = np.asarray(self._calib_jit(self.params, imgs))
        self._calib_running = s if self._calib_running is None \
            else np.maximum(self._calib_running, s)

    def _calib_finalize(self) -> int:
        """Bake the accumulated scales into the live param pytree."""
        from ..models.yolo import quant
        # eager pass over a tiny canvas: visit order is shape-independent
        tiny = jnp.zeros((1, 64, 64, 3), jnp.float32)
        n = quant.assign_scales(self.forward_fn_raw, self.params,
                                self._calib_running, tiny)
        self._calib_running = None
        self.set_params(self.params)
        return n

    def set_params(self, params) -> None:
        """Swap the weight pytree without rebuilding the detector: the
        compiled step takes params as a traced argument, so cached
        executables per shape are rebound to the new tree (a changed
        tree SHAPE simply retraces on next call). In-train eval uses
        this to score the current/EMA weights."""
        self.params = params
        if self.arch == "v5":
            no = params["24"]["m"][0]["b"].shape[0]
            self.nc = no // 3 - 5
        else:
            self.nc = params["22"]["cv3"][0][2]["b"].shape[0]
        self.names = {i: n for i, n in enumerate(COCO_NAMES)} \
            if self.nc == len(COCO_NAMES) \
            else {i: str(i) for i in range(self.nc)}
        self._jit_cache = {k: functools.partial(fn.func, params)
                           for k, fn in self._jit_cache.items()}

    def _fn_for(self, frames: np.ndarray):
        key = tuple(frames.shape[:3])
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_fn(frames.shape)
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    def infer_batch(self, frames_u8: np.ndarray) -> DetectionBatch:
        """(B, H, W, 3) BGR uint8 → DetectionBatch with (B, max_det) arrays."""
        if self._calib_left > 0:
            # config-driven auto-calibration (detect.int8_calibration: N):
            # fold the first N stream frames into the running abs-max,
            # then bake static scales — one retrace, before the hot loop
            self._calib_collect(frames_u8)
            self._calib_left -= int(frames_u8.shape[0])
            if self._calib_left <= 0:
                self._calib_left = 0
                n = self._calib_finalize()
                print(f"[roadvision] int8 auto-calibration baked static "
                      f"scales for {n} convs")
        fn = self._fn_for(frames_u8)
        if self.task == "segment":
            b, c, k, v, m, ratio, pad = fn(jnp.asarray(frames_u8))
            self._last_lb_meta = (float(ratio), np.asarray(pad))
            return DetectionBatch(np.asarray(b), np.asarray(c),
                                  np.asarray(k), np.asarray(v),
                                  masks=np.asarray(m))
        if self.task == "pose":
            b, c, k, v, kk = fn(jnp.asarray(frames_u8))
            return DetectionBatch(np.asarray(b), np.asarray(c),
                                  np.asarray(k), np.asarray(v),
                                  keypoints=np.asarray(kk))
        if self.task == "obb":
            b, c, k, v, rb = fn(jnp.asarray(frames_u8))
            return DetectionBatch(np.asarray(b), np.asarray(c),
                                  np.asarray(k), np.asarray(v),
                                  rboxes=np.asarray(rb))
        b, c, k, v = fn(jnp.asarray(frames_u8))
        return DetectionBatch(np.asarray(b), np.asarray(c),
                              np.asarray(k), np.asarray(v))

    def infer(self, bgr: np.ndarray) -> List[Detection]:
        batch = self.infer_batch(bgr[None])
        single = DetectionBatch(batch.boxes[0], batch.conf[0],
                                batch.cls_id[0], batch.valid[0],
                                masks=(None if batch.masks is None
                                       else batch.masks[0]),
                                keypoints=(None if batch.keypoints is None
                                           else batch.keypoints[0]),
                                rboxes=(None if batch.rboxes is None
                                        else batch.rboxes[0]))
        names = [self.names.get(i, str(i)) for i in range(self.nc)]
        return single.to_detections(names)

    def last_letterbox_meta(self):
        """(ratio, pad) of the most recent segment-task batch — feed to
        ops.masks.paste_masks to lift prototype-resolution masks to
        source-frame pixels."""
        return getattr(self, "_last_lb_meta", None)

    def close(self) -> None:
        self._jit_cache.clear()
