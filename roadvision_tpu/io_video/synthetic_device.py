"""Device-side synthetic road source.

Renders the same procedural road scene as
:class:`roadvision_tpu.io_video.capture.SyntheticRoadSource` directly on
device with jnp ops, so benchmark loops can run fully HBM-resident — no
host decode and no per-batch transfer (in production that role is played by
a DMA feed from the decoder; SURVEY.md §2.3 keeps decode host-side).

The static background is rendered once on the host and transferred a single
time; per-frame vehicle rectangles are painted with vectorized masks from
the frame index, matching the host renderer's geometry formulas.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .capture import SyntheticRoadSource


class DeviceSyntheticSource:
    def __init__(self, width: int = 640, height: int = 480,
                 num_vehicles: int = 4, seed: int = 0):
        self.host = SyntheticRoadSource(width, height, num_vehicles,
                                        seed=seed)
        self.w, self.h = width, height
        self.n_veh = num_vehicles
        self.seed = seed
        self.bg = jnp.asarray(self.host._background())
        self.palette = jnp.asarray(SyntheticRoadSource._PALETTE)

    def make_render_fn(self, batch: int):
        """Returns a jitted fn: frame_idx0 () i32 → (batch, H, W, 3) u8."""
        render_one = self._render_one_fn()

        @jax.jit
        def render(idx0):
            return jax.vmap(render_one)(idx0 + jnp.arange(batch))

        return render

    def make_render_at_fn(self):
        """Jitted fn: (B,) i32 frame indices → (B, H, W, 3) u8 —
        arbitrary index schedules (repeated frames for a static scene,
        ``idx // k`` for a slow-moving one) for the temporal-gate
        benchmarks."""
        render_one = self._render_one_fn()

        @jax.jit
        def render_at(idxs):
            return jax.vmap(render_one)(idxs)

        return render_at

    def _render_one_fn(self):
        h, w, n_veh, seed = self.h, self.w, self.n_veh, self.seed
        bg, palette = self.bg, self.palette
        horizon = 0.40 * h

        yy = jnp.arange(h, dtype=jnp.float32)[:, None]
        xx = jnp.arange(w, dtype=jnp.float32)[None, :]

        def render_one(idx):
            idx = idx.astype(jnp.float32)
            img = bg
            for v in range(n_veh):
                speed = 0.006 + 0.003 * ((v * 7 + seed) % 5)
                prog = ((idx * speed) + v / max(1, n_veh)) % 1.0
                yc = horizon + prog * (h - horizon) * 0.95
                scale = 0.25 + 0.75 * prog
                bw = 0.11 * w * scale
                bh = 0.09 * h * scale
                lane = -1.0 if v % 2 == 0 else 1.0
                xc = w / 2 + lane * (0.12 + 0.10 * prog) * w \
                    + 0.02 * w * jnp.sin(idx * 0.05 + v)
                x1 = jnp.maximum(0.0, xc - bw / 2)
                y1 = jnp.maximum(0.0, yc - bh)
                x2 = jnp.minimum(w - 1.0, xc + bw / 2)
                y2 = jnp.minimum(h - 1.0, yc)
                # integer-cast bounds like the host painter
                xi1 = jnp.floor(x1).astype(jnp.int32).astype(jnp.float32)
                yi1 = jnp.floor(y1).astype(jnp.int32).astype(jnp.float32)
                xi2 = jnp.floor(x2).astype(jnp.int32).astype(jnp.float32)
                yi2 = jnp.floor(y2).astype(jnp.int32).astype(jnp.float32)
                visible = (x2 > 0) & (x1 < w) & (y2 > horizon * 0.5)
                body = ((yy >= yi1) & (yy < yi2)
                        & (xx >= xi1) & (xx < xi2)) & visible
                img = jnp.where(body[..., None], palette[v % len(palette)],
                                img)
                bh_i = yi2 - yi1
                bw_i = xi2 - xi1
                wy = yi1 + jnp.maximum(1.0, jnp.floor(bh_i / 5))
                wx1 = xi1 + jnp.floor(bw_i / 6)
                wx2 = xi2 - jnp.floor(bw_i / 6)
                shield = ((yy >= yi1) & (yy < wy)
                          & (xx >= wx1) & (xx < wx2)) & visible
                img = jnp.where(shield[..., None],
                                jnp.asarray([210, 220, 225], jnp.uint8), img)
            return img

        return render_one
