"""Detector registry (reference: src/detect/registry.py:5-9).

The reference knows only the "ultralytics" backend; that name is preserved
and resolves to the native JAX implementation (there is no torch at
runtime). "jax" and "yolov8" are explicit aliases.

The reference's shipped config also reserves "onnx" and "tensorrt"
(configs/default.yaml:38, requirements.txt onnx/onnxruntime-gpu). "onnx" is
honored natively: the configured ``.onnx`` export is parsed for its weight
initializers (models/yolo/onnx_io.py — no onnxruntime) and runs through the
same jitted XLA graph. "tensorrt" has no TPU meaning (XLA *is* the
ahead-of-time compiler here); it raises with a pointer to the AOT warmup
tool rather than pretending.
"""
from __future__ import annotations

from typing import Any, Dict

from .base import Detector
from .yolo_jax import YOLOJax


def build_detector(cfg: Dict[str, Any]) -> Detector:
    backend = (cfg.get("backend") or "ultralytics").lower()
    if backend in ("ultralytics", "jax", "yolov8", "onnx"):
        if backend == "onnx":
            from pathlib import Path
            model = str(cfg.get("model", ""))
            if not model.endswith(".onnx"):
                raise ValueError(
                    f"detect.backend 'onnx' needs detect.model to be a "
                    f".onnx file (got {model!r})")
            if not Path(model).exists():
                # explicitly configured interchange file: fail fast
                # rather than silently running random-init weights
                raise FileNotFoundError(
                    f"detect.backend 'onnx': model file not found: {model}")
        model = str(cfg.get("model", ""))
        is_rtdetr = "rtdetr" in model.lower()
        if not is_rtdetr and model.endswith(".npz"):
            from ..models.rtdetr import is_rtdetr_npz
            is_rtdetr = is_rtdetr_npz(model)
        if is_rtdetr:
            # the ultralytics wrapper's other detector family — model-name
            # dispatch, same as `YOLO("rtdetr-l.pt")` resolving to RTDETR
            from .rtdetr_jax import RTDETRJax
            return RTDETRJax(cfg)
        return YOLOJax(cfg)
    if backend == "tensorrt":
        raise ValueError(
            "detect.backend 'tensorrt' is CUDA-only; on TPU the XLA jit is "
            "the engine builder — use backend 'ultralytics' (alias 'jax') "
            "and tools/warmup.py for ahead-of-time compilation")
    raise ValueError(f"unknown detect backend: {backend}")
