"""Preprocess op registry (reference: src/preprocess/registry.py:14-28).

The reference registers CUDA variants only when cv2.cuda imports; here one
TPU implementation serves both names, so the CUDA-prefixed aliases are always
registered and resolve to the same classes (the reference's CUDA ops fall
back to the CPU op when no device is present — same observable behavior,
src/preprocess/ops_cuda/cuda_clahe_dehaze.py:22-35).

Unknown names raise ``KeyError`` listing available ops, matching the
reference's error contract (src/preprocess/registry.py:26-28).
"""
from __future__ import annotations

from typing import Dict, Type

from .base import PreprocessOp
from .ops import CLAHEDehaze, MedianDerain

REGISTRY: Dict[str, Type[PreprocessOp]] = {
    "CLAHEDehaze": CLAHEDehaze,
    "MedianDerain": MedianDerain,
    # TPU aliases for the reference's CUDA registry names.
    "CUDACLAHEDehaze": CLAHEDehaze,
    "CUDAMedianDerain": MedianDerain,
}


def register(name: str, cls: Type[PreprocessOp]) -> None:
    """Register a custom op class under ``name`` (plugin extension point)."""
    REGISTRY[name] = cls


def get_op_class(name: str) -> Type[PreprocessOp]:
    if name not in REGISTRY:
        raise KeyError(
            f"Preprocess op '{name}' not found. Available: {list(REGISTRY.keys())}")
    return REGISTRY[name]
