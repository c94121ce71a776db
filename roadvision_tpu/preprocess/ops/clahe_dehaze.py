"""CLAHE-on-luma "dehaze" op (reference: src/preprocess/ops/clahe_dehaze.py).

Converts BGR→YCrCb (default) or LAB, applies CLAHE to the luma/L channel,
converts back. Parameter names, defaults and normalization preserved:
``space`` ("YCrCb" | "LAB", case-insensitive), ``clip_limit`` (2.0),
``tile_grid`` (8, floored at 2). One TPU implementation also serves the
reference's CUDA registry name (SURVEY.md §2.3).
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops import color
from ...ops.clahe import clahe_u8
from ..base import PreprocessOp


class CLAHEDehaze(PreprocessOp):
    def apply_batch(self, frames: jnp.ndarray) -> jnp.ndarray:
        space = str(self.params.get("space", "YCrCb")).upper()
        clip_limit = float(self.params.get("clip_limit", 2.0))
        grid = max(2, int(self.params.get("tile_grid", 8)))

        if space == "LAB":
            lab = color.bgr_to_lab_u8(frames)
            l2 = clahe_u8(lab[..., 0], clip_limit=clip_limit, grid=(grid, grid))
            out = color.lab_to_bgr_u8(
                jnp.concatenate([l2[..., None], lab[..., 1:]], axis=-1))
        else:
            ycc = color.bgr_to_ycrcb_u8(frames)
            y2 = clahe_u8(ycc[..., 0], clip_limit=clip_limit, grid=(grid, grid))
            out = color.ycrcb_to_bgr_u8(
                jnp.concatenate([y2[..., None], ycc[..., 1:]], axis=-1))
        return out
