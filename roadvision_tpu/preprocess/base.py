"""Preprocess op contract (reference: src/preprocess/base.py:4-16).

Ops take ``**params`` at construction and are callable on BGR uint8 frames.
The TPU-native extension is :meth:`PreprocessOp.apply_batch`: a jit-traceable
function over a *batch* of frames ``(..., H, W, 3) uint8`` that runs entirely
on device. The scalar ``__call__(image)`` host API is preserved and simply
routes a single frame through the batched path.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any

import jax.numpy as jnp
import numpy as np


class PreprocessOp(ABC):
    """Base class for preprocess ops. ``__call__(image) -> image`` on BGR u8."""

    def __init__(self, **params: Any):
        self.params = params

    @abstractmethod
    def apply_batch(self, frames: jnp.ndarray) -> jnp.ndarray:
        """Device path: (..., H, W, 3) uint8 → same shape uint8, traceable."""

    def supports_planar(self) -> bool:
        """True if :meth:`apply_planar` is implemented for this op/config.

        Planar ops run inside the pipeline's fused fast path: channels as
        int32 (..., H, W) planes (full 128-lane utilization on TPU) with
        one unpack/repack at the pipeline boundary instead of per op.
        """
        return False

    def apply_planar(self, planes):
        """Planar device path: (b, g, r) int32 planes → same, traceable."""
        raise NotImplementedError(
            f"{type(self).__name__} has no planar path")

    def supports_planar_sampled(self) -> bool:
        """True if :meth:`apply_planar_sampled` is implemented.

        The sampled path is the pipeline's TERMINAL-op optimization: when
        a pure-slice letterbox consumes the chain output, the last op
        only needs to produce values at the sample grid (ops/letterbox.py
        axis_plan "slice"), bit-identically to full-apply-then-subsample.
        """
        return False

    def apply_planar_sampled(self, planes, plan_y, plan_x):
        """Planar path evaluated at the (stride, offset, count) grids."""
        raise NotImplementedError(
            f"{type(self).__name__} has no sampled planar path")

    def __call__(self, image: np.ndarray) -> np.ndarray:
        return np.asarray(self.apply_batch(jnp.asarray(image)))
