"""Pallas TPU kernel: 3×3 median filter (the default derain ksize).

The jnp path (ops/median.py) materializes 9 shifted views that XLA fuses
into an elementwise chain over the padded frame. This Pallas kernel keeps
the padded plane in HBM, DMAs each (TILE+2)² halo'd tile into VMEM scratch
(the guide's manual-copy stencil pattern — halo windows are not
block-aligned, so the input uses `memory_space=ANY` + `make_async_copy`
with `pl.ds` offsets), runs the 19-exchange median-of-9 network on the VPU,
and writes each output tile once: one HBM read + one HBM write per pixel.

uint8 is widened to int16 in VMEM for the min/max ops (narrow-int
elementwise support is shaky on some TPU generations) and narrowed on
store. Used by median_blur_u8 on TPU; the jnp path remains the CPU
fallback and oracle-tested reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 128
TILE_W = 128


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


def _kernel(x_hbm, out_ref, scratch, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TILE_H, TILE_H + 2),
                 pl.ds(j * TILE_W, TILE_W + 2)],
        scratch, sem)
    copy.start()
    copy.wait()
    x = scratch[...].astype(jnp.int16)
    views = [x[dy:dy + TILE_H, dx:dx + TILE_W]
             for dy in range(3) for dx in range(3)]
    out_ref[0] = _median9_net(views).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def median3_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """3×3 median with replicate border on (..., H, W, C) uint8."""
    batch_shape = x.shape[:-3]
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    planes = jnp.moveaxis(x.reshape((-1, h, w, c)), -1, 1).reshape((-1, h, w))
    n = planes.shape[0]

    pad_h = (-h) % TILE_H
    pad_w = (-w) % TILE_W
    xp = jnp.pad(planes, ((0, 0), (1, 1 + pad_h), (1, 1 + pad_w)),
                 mode="edge")

    grid = (n, (h + pad_h) // TILE_H, (w + pad_w) // TILE_W)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h + pad_h, w + pad_w), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W),
            lambda b, i, j: (b, i, j),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2, TILE_W + 2), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    out = out[:, :h, :w]
    out = jnp.moveaxis(out.reshape((-1, c, h, w)), 1, -1)
    return out.reshape(batch_shape + (h, w, c))
