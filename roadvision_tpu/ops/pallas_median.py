"""Pallas TPU kernel: 3×3 median filter (the default derain ksize).

The jnp path (ops/median.py) materializes 9 shifted views that XLA fuses
into an elementwise chain over the padded frame. This kernel computes each
128×128 output tile from one VMEM-resident halo strip with all memory
accesses aligned to the (8, 128) TPU vector tiling — the constraints this
backend's Mosaic toolchain actually enforces (found by bisection):

  * uint8 VMEM blocks are rejected → compute in int32, cast in XLA outside;
  * lane-dim (last axis) slices must be 128-aligned → column neighbors come
    from ``pltpu.roll`` on a 3-lane-tile (384-wide) strip followed by an
    aligned 128:256 slice, so the roll's wrap-around never reaches the
    center tile;
  * sublane-shifted row slices only compile on single-lane-tile (width-128)
    refs → row neighbors likewise use roll(axis=0) + aligned 0:128 slice
    on the 136-row strip;
  * the halo strip itself is DMA'd from HBM (`memory_space=ANY` input +
    ``make_async_copy`` with ``pl.ds``), offsets lane/sublane-aligned by
    construction.

One HBM read + one HBM write per pixel; the 19-exchange median-of-9
network runs on the VPU. median_blur_u8 dispatches here on TPU; the jnp
path remains the CPU fallback and oracle-tested reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
STRIP_ROWS = 136   # TILE + 2 halo rows, padded up to the 8-row sublane tile
STRIP_COLS = 3 * TILE


def _median9_net(p):
    def ex(i, j):
        lo = jnp.minimum(p[i], p[j])
        hi = jnp.maximum(p[i], p[j])
        p[i], p[j] = lo, hi

    ex(1, 2); ex(4, 5); ex(7, 8)
    ex(0, 1); ex(3, 4); ex(6, 7)
    ex(1, 2); ex(4, 5); ex(7, 8)
    ex(0, 3); ex(5, 8); ex(4, 7)
    ex(3, 6); ex(1, 4); ex(2, 5)
    ex(4, 7); ex(4, 2); ex(6, 4)
    ex(4, 2)
    return p[4]


def _roll(v, shift, axis, interpret):
    if interpret:
        return jnp.roll(v, shift, axis=axis)
    return pltpu.roll(v, shift % v.shape[axis], axis=axis)


def _make_kernel(interpret: bool):
    def kernel(x_hbm, out_ref, scratch, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        copy = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * TILE, STRIP_ROWS),
                     pl.ds(j * TILE, STRIP_COLS)],
            scratch, sem)
        copy.start()
        copy.wait()
        x = scratch[...]
        views = []
        for dy in range(3):
            # rows dy .. dy+127 via aligned slice of a row-roll
            rows = _roll(x, -dy, 0, interpret)[0:TILE, :]
            for dx in range(3):
                # center-tile cols shifted by dx-1 via aligned slice of a
                # lane-roll (wrap stays outside the 128:256 window)
                shifted = _roll(rows, 1 - dx, 1, interpret)
                views.append(shifted[:, TILE:2 * TILE])
        out_ref[0] = _median9_net(views)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def median3_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """3×3 median with replicate border on (..., H, W, C) uint8."""
    batch_shape = x.shape[:-3]
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    planes = jnp.moveaxis(x.reshape((-1, h, w, c)), -1, 1).reshape((-1, h, w))
    n = planes.shape[0]

    tiles_h = -(-h // TILE)
    tiles_w = -(-w // TILE)
    # rows: 1 edge row on top, edge+zeros below up to the DMA reach;
    # cols: TILE-1 zeros + 1 edge col on the left, mirrored on the right
    rows_total = tiles_h * TILE + (STRIP_ROWS - TILE)
    cols_total = TILE + tiles_w * TILE + TILE
    xe = jnp.pad(planes, ((0, 0), (1, 1), (1, 1)), mode="edge")
    xp = jnp.zeros((n, rows_total, cols_total), jnp.int32)
    xp = xp.at[:, :h + 2, TILE - 1:TILE - 1 + w + 2].set(xe.astype(jnp.int32))

    grid = (n, tiles_h, tiles_w)
    out = pl.pallas_call(
        _make_kernel(interpret),
        out_shape=jax.ShapeDtypeStruct((n, tiles_h * TILE, tiles_w * TILE),
                                       jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE, TILE),
            lambda b, i, j: (b, i, j),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((STRIP_ROWS, STRIP_COLS), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    out = out[:, :h, :w].astype(jnp.uint8)
    out = jnp.moveaxis(out.reshape((-1, c, h, w)), 1, -1)
    return out.reshape(batch_shape + (h, w, c))
