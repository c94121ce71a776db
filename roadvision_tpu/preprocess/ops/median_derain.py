"""Median-blur "derain" op (reference: src/preprocess/ops/median_derain.py).

ksize normalization preserved: even → +1, clamped to [3, 9]. The kernel
itself lives in ops/median.py (median-of-9 exchange network for k=3).
Planar-capable: filters int32 channel planes directly inside the
pipeline's fused path.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops.median import (median_blur_u8, median_planar_i32,
                           median_planar_strided_i32)
from ..base import PreprocessOp


class MedianDerain(PreprocessOp):
    def supports_planar(self) -> bool:
        return True

    def apply_planar(self, planes):
        k = int(self.params.get("ksize", 3))
        return tuple(median_planar_i32(p, ksize=k) for p in planes)

    def supports_planar_sampled(self) -> bool:
        return True

    def apply_planar_sampled(self, planes, plan_y, plan_x):
        k = int(self.params.get("ksize", 3))
        return tuple(median_planar_strided_i32(p, k, plan_y, plan_x)
                     for p in planes)

    def apply_batch(self, frames: jnp.ndarray) -> jnp.ndarray:
        k = int(self.params.get("ksize", 3))
        return median_blur_u8(frames, ksize=k)
