"""Batched CLAHE — TPU-native replacement for ``cv2.createCLAHE().apply``.

Reference call sites: src/preprocess/ops/clahe_dehaze.py:19,24,29 (CPU) and
src/preprocess/ops_cuda/cuda_clahe_dehaze.py:31,55,65 (CUDA) — one
implementation covers both registry names (SURVEY.md §2.3).

The algorithm reproduces OpenCV's CLAHE pipeline step for step:

  1. pad right/bottom with BORDER_REFLECT_101 so (H, W) divide the tile grid;
  2. 256-bin histogram per tile — computed for the whole batch with a single
     scatter-add (`bincount` over value + tile-offset keys), not a Python
     loop per tile;
  3. integer clip limit ``max(int(clip_limit * tile_area / 256), 1)``,
     clipped excess redistributed: ``excess // 256`` to every bin plus the
     residual spread over bins ``0, s, 2s, ...`` with
     ``s = max(256 // residual, 1)`` (OpenCV's residual loop, vectorized);
  4. per-tile LUT = round(inclusive-cdf × 255 / tile_area) (round-half-even);
  5. output = bilinear blend of the 4 neighboring tile LUTs evaluated at each
     source pixel, with OpenCV's half-tile offset and edge clamping, final
     round-half-even.

Everything is static-shaped and jit-compiled; the per-pixel LUT evaluation is
4 gathers + an elementwise blend, which XLA fuses. Histogram scatter-add is
the only non-fused op and runs at O(B·H·W) work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _reflect_pad_101(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 pad on bottom/right only (OpenCV CLAHE extension)."""
    if pad_h == 0 and pad_w == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[-2] = (0, pad_h)
    widths[-1] = (0, pad_w)
    return jnp.pad(x, widths, mode="reflect")


def _tile_histograms(tiles_vals: jnp.ndarray, num_tiles: int) -> jnp.ndarray:
    """(num_tiles, area) uint8 values → (num_tiles, 256) int32 histograms."""
    offsets = (jnp.arange(num_tiles, dtype=jnp.int32) * 256)[:, None]
    keys = tiles_vals.astype(jnp.int32) + offsets
    counts = jnp.bincount(keys.reshape(-1), length=num_tiles * 256)
    return counts.reshape(num_tiles, 256).astype(jnp.int32)


def _clip_redistribute(hist: jnp.ndarray, clip: int) -> jnp.ndarray:
    """OpenCV clip + excess redistribution, vectorized over leading axes."""
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    redist = excess // 256
    residual = excess - redist * 256  # in [0, excess]
    out = clipped + redist
    idx = jnp.arange(256, dtype=jnp.int32)
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bump = (idx % step == 0) & ((idx // step) < residual)
    return out + bump.astype(jnp.int32)


def _tile_luts(hist: jnp.ndarray, tile_area: int) -> jnp.ndarray:
    """Inclusive CDF scaled by 255/tile_area, round-half-even.

    Stored as uint8 (values are 0..255 by construction) — the bilinear
    apply gathers these tables once per pixel per tap, so narrow storage
    quarters the dominant HBM gather traffic. Bit-exact either way."""
    cdf = jnp.cumsum(hist, axis=-1)
    scale = jnp.float32(255.0 / tile_area)
    return jnp.clip(jnp.rint(cdf.astype(jnp.float32) * scale),
                    0, 255).astype(jnp.uint8)


def _interp_coords(size: int, tile: int, tiles: int):
    """Per-pixel tile indices and blend weight along one axis (OpenCV math)."""
    pos = (jnp.arange(size, dtype=jnp.float32) + 0.0) * (1.0 / tile) - 0.5
    i1_raw = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i1_raw.astype(jnp.float32)  # computed before clamping
    # OpenCV: i2 = i1 + 1 BEFORE clamping i1; then i1 = max(i1, 0),
    # i2 = min(i2, tiles - 1) — so a border pixel keeps both taps in tile 0.
    i1 = jnp.maximum(i1_raw, 0)
    i2 = jnp.minimum(i1_raw + 1, tiles - 1)
    return i1, i2, frac


def compute_tile_luts(plane: jnp.ndarray, clip_limit: float = 2.0,
                      grid: tuple = (8, 8)) -> jnp.ndarray:
    """The histogram→clip→redistribute→CDF stage alone: (..., gy, gx, 256).

    Exposed for golden testing — this integer stage is bit-exact; only the
    float bilinear blend afterwards is subject to FMA-contraction ±1 LSB.
    """
    gy, gx = int(grid[0]), int(grid[1])
    h, w = plane.shape[-2], plane.shape[-1]
    x = plane.reshape((-1, h, w))
    b = x.shape[0]
    pad_h = (gy - h % gy) % gy
    pad_w = (gx - w % gx) % gx
    xe = _reflect_pad_101(x, pad_h, pad_w)
    th, tw = (h + pad_h) // gy, (w + pad_w) // gx
    tile_area = th * tw
    tiles = xe.reshape(b, gy, th, gx, tw).transpose(0, 1, 3, 2, 4)
    hist = _tile_histograms(
        tiles.reshape(b * gy * gx, tile_area), b * gy * gx).reshape(b, gy, gx, 256)
    clip = max(int(clip_limit * tile_area / 256.0), 1) if clip_limit > 0 else 0
    if clip > 0:
        hist = _clip_redistribute(hist, clip)
    return _tile_luts(hist, tile_area).reshape(plane.shape[:-2] + (gy, gx, 256))


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid"))
def clahe_u8(plane: jnp.ndarray, clip_limit: float = 2.0,
             grid: tuple = (8, 8)) -> jnp.ndarray:
    """Apply CLAHE to a batch of uint8 luma planes.

    Args:
      plane: (..., H, W) uint8.
      clip_limit: OpenCV clipLimit (float).
      grid: (tiles_y, tiles_x).

    Returns (..., H, W) uint8.
    """
    gy, gx = int(grid[0]), int(grid[1])
    batch_shape = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    x = plane.reshape((-1, h, w))
    b = x.shape[0]

    pad_h = (gy - h % gy) % gy
    pad_w = (gx - w % gx) % gx
    xe = _reflect_pad_101(x, pad_h, pad_w)
    he, we = h + pad_h, w + pad_w
    th, tw = he // gy, we // gx
    tile_area = th * tw

    # --- per-tile histograms over the extended image ---
    tiles = xe.reshape(b, gy, th, gx, tw).transpose(0, 1, 3, 2, 4)
    tiles_flat = tiles.reshape(b * gy * gx, tile_area)
    hist = _tile_histograms(tiles_flat, b * gy * gx).reshape(b, gy, gx, 256)

    # --- clip + redistribute + LUT ---
    clip = max(int(clip_limit * tile_area / 256.0), 1) if clip_limit > 0 else 0
    if clip > 0:
        hist = _clip_redistribute(hist, clip)
    luts = _tile_luts(hist, tile_area)  # (b, gy, gx, 256)

    # --- bilinear LUT interpolation over the ORIGINAL (unpadded) pixels ---
    ty1, ty2, ya = _interp_coords(h, th, gy)   # (h,)
    tx1, tx2, xa = _interp_coords(w, tw, gx)   # (w,)
    v = x.astype(jnp.int32)

    luts_flat = luts.reshape(b, gy * gx * 256)

    def gather(tyi, txi):
        # index (ty*gx + tx)*256 + pixel_value, gathered per batch element
        idx = (tyi[:, None] * gx + txi[None, :]) * 256 + v  # (b, h, w)
        return jnp.take_along_axis(
            luts_flat, idx.reshape(b, -1), axis=1).reshape(b, h, w).astype(jnp.float32)

    ya_ = ya[None, :, None]
    xa_ = xa[None, None, :]
    top = gather(ty1, tx1) * (1.0 - xa_) + gather(ty1, tx2) * xa_
    bot = gather(ty2, tx1) * (1.0 - xa_) + gather(ty2, tx2) * xa_
    res = top * (1.0 - ya_) + bot * ya_
    out = jnp.clip(jnp.rint(res), 0, 255).astype(jnp.uint8)
    return out.reshape(batch_shape + (h, w))
