"""CLAHE-on-luma "dehaze" op (reference: src/preprocess/ops/clahe_dehaze.py).

Converts BGR→YCrCb (default) or LAB, applies CLAHE to the luma/L channel,
converts back. Parameter names, defaults and normalization preserved:
``space`` ("YCrCb" | "LAB", case-insensitive), ``clip_limit`` (2.0),
``tile_grid`` (8, floored at 2). One TPU implementation also serves the
reference's CUDA registry name (SURVEY.md §2.3).

The YCrCb path (the reference default) is planar: int32 channel planes in
and out, so the pipeline can fuse color→CLAHE→median into one pass with a
single unpack/repack at the boundary. LAB runs the float channel-last path.
"""
from __future__ import annotations

import jax.numpy as jnp

from ...ops import color
from ...ops.clahe import (clahe_planar_i32, clahe_planar_sampled_i32,
                          clahe_u8)
from ..base import PreprocessOp


class CLAHEDehaze(PreprocessOp):
    def _settings(self):
        space = str(self.params.get("space", "YCrCb")).upper()
        clip_limit = float(self.params.get("clip_limit", 2.0))
        grid = max(2, int(self.params.get("tile_grid", 8)))
        return space, clip_limit, grid

    def supports_planar(self) -> bool:
        space, _, _ = self._settings()
        return space != "LAB"

    def apply_planar(self, planes):
        _, clip_limit, grid = self._settings()
        b, g, r = planes
        y, cr, cb = color.bgr_planes_to_ycrcb_i32(b, g, r)
        y2 = clahe_planar_i32(y, clip_limit=clip_limit, grid=(grid, grid))
        return color.ycrcb_planes_to_bgr_i32(y2, cr, cb)

    def supports_planar_sampled(self) -> bool:
        return self.supports_planar()

    def apply_planar_sampled(self, planes, plan_y, plan_x):
        """Histogram/LUT on the full luma plane (defined over all
        pixels); the LUT-apply sweep, the chroma transform, and the BGR
        reconstruction evaluated only at the sample grid."""
        _, clip_limit, grid = self._settings()
        b, g, r = planes
        sy, oy, ny = plan_y
        sx, ox, nx = plan_x

        def sub(p):
            return p[..., oy:oy + sy * ny:sy, ox:ox + sx * nx:sx]

        # full-res Y for the histogram (unused full-res chroma is DCE'd)
        y_full = color.bgr_planes_to_ycrcb_i32(b, g, r)[0]
        y2s = clahe_planar_sampled_i32(y_full, plan_y, plan_x,
                                       clip_limit=clip_limit,
                                       grid=(grid, grid))
        _, crs, cbs = color.bgr_planes_to_ycrcb_i32(sub(b), sub(g), sub(r))
        return color.ycrcb_planes_to_bgr_i32(y2s, crs, cbs)

    def apply_batch(self, frames: jnp.ndarray) -> jnp.ndarray:
        space, clip_limit, grid = self._settings()
        if space == "LAB":
            # both directions are OpenCV's exact integer u8 pipelines
            # (bit-exact vs cv2 over the full input domain — see
            # tests/test_cv2_crosscheck.py)
            lab = color.bgr_to_lab_u8_fixed(frames)
            l2 = clahe_u8(lab[..., 0], clip_limit=clip_limit, grid=(grid, grid))
            return color.lab_to_bgr_u8_fixed(
                jnp.concatenate([l2[..., None], lab[..., 1:]], axis=-1))
        x = frames.astype(jnp.int32)
        b, g, r = self.apply_planar((x[..., 0], x[..., 1], x[..., 2]))
        return jnp.stack([b, g, r], axis=-1).astype(jnp.uint8)
