"""Detector registry (reference: src/detect/registry.py:5-9).

The reference knows only the "ultralytics" backend; that name is preserved
and resolves to the native JAX implementation (there is no torch at
runtime). "jax" and "yolov8" are explicit aliases.
"""
from __future__ import annotations

from typing import Any, Dict

from .base import Detector
from .yolo_jax import YOLOJax


def build_detector(cfg: Dict[str, Any]) -> Detector:
    backend = (cfg.get("backend") or "ultralytics").lower()
    if backend in ("ultralytics", "jax", "yolov8"):
        return YOLOJax(cfg)
    raise ValueError(f"unknown detect backend: {backend}")
