"""Batched CLAHE — TPU-native replacement for ``cv2.createCLAHE().apply``.

Reference call sites: src/preprocess/ops/clahe_dehaze.py:19,24,29 (CPU) and
src/preprocess/ops_cuda/cuda_clahe_dehaze.py:31,55,65 (CUDA) — one
implementation covers both registry names (SURVEY.md §2.3).

The algorithm reproduces OpenCV's CLAHE pipeline step for step:

  1. pad right/bottom with BORDER_REFLECT_101 so (H, W) divide the tile grid;
  2. 256-bin histogram per tile;
  3. integer clip limit ``max(int(clip_limit * tile_area / 256), 1)``,
     clipped excess redistributed: ``excess // 256`` to every bin plus the
     residual spread over bins ``0, s, 2s, ...`` with
     ``s = max(256 // residual, 1)`` (OpenCV's residual loop, vectorized);
  4. per-tile LUT = round(inclusive-cdf × 255 / tile_area) (round-half-even);
  5. output = bilinear blend of the 4 neighboring tile LUTs evaluated at each
     source pixel, with OpenCV's half-tile offset and edge clamping, final
     round-half-even.

TPU formulation — **no gathers, no scatters** (both are order-of-magnitude
slow on TPU relative to streaming vector ops; measured 10-30× on this
backend, tools/profile_preprocess.py):

  * the histogram is a 256-step bin sweep: for each value v, a fused
    compare-and-reduce counts ``plane == v`` per tile (one streaming pass
    over VMEM-resident tiles per bin, no scatter-add);
  * the bilinear LUT apply is also a 256-step sweep. The x-axis LUT blend
    is precomputed into per-tile-row tables via one-hot matmuls (exact:
    each row of the one-hot matrix has a single 1), and the image is split
    into static row bands within which the two y-neighbor tile rows are
    constant; each band then accumulates ``where(pixel == v, blended_lut_v,
    acc)`` over the 256 bins — pure VPU select/fma traffic.

Everything is static-shaped and jit-compiled; the core runs on int32/f32
planes (uint8 VMEM is not vectorizable on TPU), with uint8 casts only at
the public ``clahe_u8`` boundary.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _reflect_pad_101(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 pad on bottom/right only (OpenCV CLAHE extension)."""
    if pad_h == 0 and pad_w == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[-2] = (0, pad_h)
    widths[-1] = (0, pad_w)
    return jnp.pad(x, widths, mode="reflect")


def _tile_histograms_sweep(tiled: jnp.ndarray) -> jnp.ndarray:
    """(b, gy, th, gx, tw) int32 values → (b, gy, gx, 256) histograms.

    256-iteration bin sweep: each step is a fused compare + reduction over
    the tile area — no scatter (TPU scatters serialize; the sweep streams).
    The reduce runs directly on the reshaped-but-untransposed view, axes
    (th, tw) = (2, 4): keeping the image's native row-major layout in the
    lane dimension measured 8× faster than reducing a transposed
    (b, gy, gx, th, tw) copy (tools/profile_preprocess.py)."""
    b, gy, _, gx, _ = tiled.shape

    def body(v, acc):
        cnt = jnp.sum((tiled == v).astype(jnp.int32), axis=(2, 4))
        return lax.dynamic_update_index_in_dim(acc, cnt, v, axis=-1)

    acc = jnp.zeros((b, gy, gx, 256), jnp.int32)
    return lax.fori_loop(0, 256, body, acc)


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
    """Inclusive CDF scaled by 255/tile_area, round-half-even (uint8 range)."""
    cdf = jnp.cumsum(hist, axis=-1)
    scale = jnp.float32(255.0 / tile_area)
    return jnp.clip(jnp.rint(cdf.astype(jnp.float32) * scale),
                    0, 255).astype(jnp.int32)


def _interp_coords(size: int, tile: int, tiles: int):
    """Per-pixel tile indices and blend weight along one axis (OpenCV math).

    Computed in numpy at trace time — the results are static arrays.
    """
    pos = (np.arange(size, dtype=np.float32) + 0.0) * (1.0 / np.float32(tile)) - 0.5
    i1_raw = np.floor(pos).astype(np.int32)
    frac = (pos - i1_raw).astype(np.float32)  # computed before clamping
    # OpenCV: i2 = i1 + 1 BEFORE clamping i1; then i1 = max(i1, 0),
    # i2 = min(i2, tiles - 1) — so a border pixel keeps both taps in tile 0.
    i1 = np.maximum(i1_raw, 0)
    i2 = np.minimum(i1_raw + 1, tiles - 1)
    return i1, i2, frac


def _row_bands(ty1: np.ndarray, ty2: np.ndarray):
    """Maximal runs of rows sharing the same (ty1, ty2) tile-row pair."""
    h = len(ty1)
    bands, start = [], 0
    for y in range(1, h + 1):
        if y == h or ty1[y] != ty1[start] or ty2[y] != ty2[start]:
            bands.append((start, y, int(ty1[start]), int(ty2[start])))
            start = y
    return bands


def _luts_for_plane(x: jnp.ndarray, clip_limit: float, gy: int, gx: int):
    """(b, h, w) int32 plane → ((b, gy, gx, 256) int32 LUTs, tile h/w)."""
    b, h, w = x.shape
    pad_h = (gy - h % gy) % gy
    pad_w = (gx - w % gx) % gx
    xe = _reflect_pad_101(x, pad_h, pad_w)
    th, tw = (h + pad_h) // gy, (w + pad_w) // gx
    tile_area = th * tw
    hist = _tile_histograms_sweep(xe.reshape(b, gy, th, gx, tw))
    clip = max(int(clip_limit * tile_area / 256.0), 1) if clip_limit > 0 else 0
    if clip > 0:
        hist = _clip_redistribute(hist, clip)
    return _tile_luts(hist, tile_area), th, tw


def _apply_band_sweep(x: jnp.ndarray, luts: jnp.ndarray,
                      th: int, tw: int, gy: int, gx: int) -> jnp.ndarray:
    """Bilinear 4-tile LUT blend of (b, h, w) int32 values, gather-free.

    Float arithmetic matches the reference formulation
    ``(l11*(1-xa) + l12*xa)*(1-ya) + (l21*(1-xa) + l22*xa)*ya`` — the x-blend
    is hoisted into per-(tile-row, column, bin) tables, the y-blend runs
    inside the 256-bin select sweep.
    """
    b, h, w = x.shape
    ty1, ty2, ya = _interp_coords(h, th, gy)
    tx1, tx2, xa = _interp_coords(w, tw, gx)
    bands = _row_bands(ty1, ty2)

    eye = np.eye(gx, dtype=np.float32)
    m1 = jnp.asarray(eye[tx1])            # (w, gx) one-hot of left tile col
    m2 = jnp.asarray(eye[tx2])
    xa_j = jnp.asarray(xa)
    ya_j = jnp.asarray(ya)

    lf = luts.astype(jnp.float32)         # (b, gy, gx, 256)
    # exact column selection as one-hot matmuls (single 1 per row)
    bx1 = jnp.einsum("wk,bgkv->bgwv", m1, lf)
    bx2 = jnp.einsum("wk,bgkv->bgwv", m2, lf)
    top_tab = (bx1 * (1.0 - xa_j)[None, None, :, None]
               + bx2 * xa_j[None, None, :, None])   # (b, gy, w, 256)

    outs = []
    for (y0, y1, t1, t2) in bands:
        vals = x[:, y0:y1]                 # (b, rows, w)
        tab1 = top_tab[:, t1]              # (b, w, 256)
        tab2 = top_tab[:, t2]
        yab = ya_j[y0:y1][None, :, None]

        def body(v, acc, vals=vals, tab1=tab1, tab2=tab2, yab=yab):
            lut1_v = lax.dynamic_slice_in_dim(tab1, v, 1, axis=2)[..., 0]
            lut2_v = lax.dynamic_slice_in_dim(tab2, v, 1, axis=2)[..., 0]
            blended = (lut1_v[:, None, :] * (1.0 - yab)
                       + lut2_v[:, None, :] * yab)
            return jnp.where(vals == v, blended, acc)

        acc = jnp.zeros(vals.shape, jnp.float32)
        outs.append(lax.fori_loop(0, 256, body, acc))

    res = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32)


def clahe_planar_i32(plane: jnp.ndarray, clip_limit: float = 2.0,
                     grid: tuple = (8, 8)) -> jnp.ndarray:
    """CLAHE on an int32 (..., H, W) plane with values in [0, 255].

    The fused-pipeline building block: int32 in/out so the surrounding
    color/median stages can stay in vector-friendly planar int32 form.
    """
    gy, gx = int(grid[0]), int(grid[1])
    batch_shape = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    x = plane.reshape((-1, h, w))
    luts, th, tw = _luts_for_plane(x, clip_limit, gy, gx)
    out = _apply_band_sweep(x, luts, th, tw, gy, gx)
    return out.reshape(batch_shape + (h, w))


def compute_tile_luts(plane: jnp.ndarray, clip_limit: float = 2.0,
                      grid: tuple = (8, 8)) -> jnp.ndarray:
    """The histogram→clip→redistribute→CDF stage alone: (..., gy, gx, 256).

    Exposed for golden testing — this integer stage is bit-exact; only the
    float bilinear blend afterwards is subject to FMA-contraction ±1 LSB.
    """
    gy, gx = int(grid[0]), int(grid[1])
    h, w = plane.shape[-2], plane.shape[-1]
    x = plane.reshape((-1, h, w)).astype(jnp.int32)
    luts, _, _ = _luts_for_plane(x, clip_limit, gy, gx)
    return luts.reshape(plane.shape[:-2] + (gy, gx, 256))


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
    return clahe_planar_i32(plane.astype(jnp.int32), clip_limit,
                            grid).astype(jnp.uint8)
