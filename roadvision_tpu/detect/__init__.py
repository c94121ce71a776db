from .base import Detector
from .registry import build_detector
from .types import COCO_NAMES, Detection, DetectionBatch
from .yolo_jax import YOLOJax

__all__ = ["Detector", "build_detector", "Detection", "DetectionBatch",
           "COCO_NAMES", "YOLOJax"]
