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

  * the histogram uses nibble decomposition: ``hist[16*hi + lo] =
    Σ_p [hi_p == hi]·[lo_p == lo]``, i.e. one 16×16 matmul of one-hot
    nibble planes per tile. 32 VPU compares/pixel build the one-hots and
    the 256 accumulates ride the MXU (bf16 one-hots are exact 0/1; f32
    accumulation is exact for any tile_area < 2²⁴).
  * the bilinear LUT apply is a per-row-band 256-bin select sweep over a
    **packed** per-column table: within a band the two y-neighbor tile
    rows are constant, so the four LUT taps per pixel collapse to one
    uint32 ``l11 | l12<<8 | l21<<16 | l22<<24`` per (column, bin), built
    exactly by two one-hot matmuls of 16-bit pairs (< 2²⁴, f32-exact).
    The sweep costs compare + select per bin per pixel on the image's
    native (rows, w) lane layout, ``_SWEEP_CHUNK`` bins per fori step so
    the single loop-carried accumulator round-trips 32× less often. The bilinear blend runs once per pixel afterwards in
    exact uint32 fixed point (weights are rationals over 2·tile) with
    round-half-even — deterministic across all fusion contexts, unlike a
    float blend (or OpenCV's own SIMD paths). Rejected by measurement:
    4-LUT gathers (~10× slower), a fully-unrolled packed-nibble region
    variant (4× slower — unaligned 5-D layout), a masked-SUM chunk
    accumulator (broadcasting the chunk over a (rows, w, chunk) axis —
    12.7 ms vs 3.6), and a two-level nibble select (17.6 ms — the
    16-wide per-pixel sub-table materializes); see
    tools/profile_preprocess.py.

Everything is static-shaped and jit-compiled; the core is
dtype-preserving over integer planes (the fused pipeline feeds int16 —
half the traffic of int32 for u8-domain values; uint8 itself is not
vectorizable in TPU VMEM), with uint8 casts only at the public
``clahe_u8`` boundary.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# bins evaluated per sweep iteration: fewer, fatter fori steps cut the
# loop-carried accumulator round-trips that dominate the sweep's cost
# (measured at 1080p/batch 8, 24 iters: chunk 1 → 14.2 ms, 16 → 4.6 ms,
# 32 → 3.6 ms, 64 → 8.3 ms)
_SWEEP_CHUNK = int(os.environ.get("RVT_CLAHE_CHUNK", "32"))
# The sweep walks 256 bins in fori steps of _SWEEP_CHUNK; a chunk that
# does not divide 256 would silently skip the trailing bins (pixels in
# them come out 0).  Fail loudly at import instead of corrupting images.
if not (1 <= _SWEEP_CHUNK <= 256) or 256 % _SWEEP_CHUNK != 0:
    raise ValueError(
        f"RVT_CLAHE_CHUNK={_SWEEP_CHUNK} must be a divisor of 256 in [1, 256] "
        "(e.g. 1, 2, 4, 8, 16, 32, 64, 128, 256)"
    )

# Final bilinear blend modes:
#   "cv2" (default) — reproduces OpenCV's float32 blend bit-for-bit on
#     grid-divisible geometry (every reference resolution divides the
#     8x8 grid; proven vs the real library in
#     tests/test_cv2_crosscheck.py). Each multiply is sealed with a
#     min-guard so XLA cannot contract mul+add into FMA — the roundings
#     stay separate binary32 ops, deterministic on any IEEE backend.
#   "fixed" — exact-rational uint32 blend, round-half-even. Pure integer
#     (no float rounding anywhere); within 1 LSB of cv2, whose own blend
#     varies by platform (v_muladd is mul+add on SSE, fused on NEON).
# Selected per call via the ``blend`` argument, or globally via
# RVT_CLAHE_BLEND.
_DEFAULT_BLEND = os.environ.get("RVT_CLAHE_BLEND", "cv2")

# Sweep implementation:
#   "xla" (default) — the chunked fori-loop sweep below; the loop-carried
#     accumulator round-trips HBM once per chunk (amortized by
#     _SWEEP_CHUNK).
#   "pallas" — ops/pallas_clahe.py: the whole 256-bin sweep over a
#     VMEM-resident block, no carry round-trips at all (used on TPU
#     backends only; bit-identical — the blend stays in XLA either way).
#     Measured slower on the emulated attach (dispatch overhead), kept
#     as the real-silicon candidate; tools/autotune.py measures both.
_SWEEP_IMPL = os.environ.get("RVT_CLAHE_SWEEP", "xla")
if _SWEEP_IMPL not in ("xla", "pallas"):
    raise ValueError(
        f"RVT_CLAHE_SWEEP={_SWEEP_IMPL!r} must be 'xla' or 'pallas'")


def _pallas_sweep_active() -> bool:
    import jax as _jax
    return _SWEEP_IMPL == "pallas" and _jax.default_backend() == "tpu"


# One-hot dtype for the nibble histogram matmul. Both are exact:
#   "bf16" (default) — bf16 0/1 one-hots, f32 accumulation (exact below
#     2²⁴; tile areas are ≤ a few 10⁵). Rides the MXU at bf16 rates.
#   "int8" — int8 one-hots, int32 accumulation; no float round-trip and
#     2× narrower operands, but int8 matmul throughput differs by
#     generation. tools/autotune.py measures both; pin the winner here.
_HIST_DTYPE = os.environ.get("RVT_CLAHE_HIST_DTYPE", "bf16")
if _HIST_DTYPE not in ("bf16", "int8"):
    raise ValueError(
        f"RVT_CLAHE_HIST_DTYPE={_HIST_DTYPE!r} must be 'bf16' or 'int8'")


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

    Nibble decomposition: ``hist[16*hi + lo] = Σ_p [hi_p==hi]·[lo_p==lo]``
    — a 16×16 one-hot matmul per tile. The contraction runs directly on
    the reshaped-but-untransposed view (axes th, tw = 2, 4): keeping the
    image's native row-major layout in the lane dimension measured 8×
    faster than transposed copies (tools/profile_preprocess.py). Exact:
    bf16 one-hots are exact 0/1 and f32 accumulation is exact below 2²⁴
    (tile areas are ≤ a few 10⁵)."""
    tiled = tiled.astype(jnp.int16)  # u8-domain values: halves the
    i16 = jnp.arange(16, dtype=jnp.int16)  # compare-pass HBM traffic
    if _HIST_DTYPE == "int8":
        hi_oh = ((tiled >> 4)[..., None] == i16).astype(jnp.int8)
        lo_oh = ((tiled & 15)[..., None] == i16).astype(jnp.int8)
        acc = jnp.int32
    else:
        hi_oh = ((tiled >> 4)[..., None] == i16).astype(jnp.bfloat16)
        lo_oh = ((tiled & 15)[..., None] == i16).astype(jnp.bfloat16)
        acc = jnp.float32
    # batch dims (b, gy, gx), contract over the tile area (th, tw)
    cnt = lax.dot_general(
        hi_oh, lo_oh,
        dimension_numbers=(((2, 4), (2, 4)), ((0, 1, 3), (0, 1, 3))),
        preferred_element_type=acc)                # (b, gy, gx, 16, 16)
    b, gy, gx = cnt.shape[:3]
    return cnt.reshape(b, gy, gx, 256).astype(jnp.int32)


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


def _interp_weight_num(size: int, tile: int) -> np.ndarray:
    """Exact integer numerator of the blend weight: frac = num / (2·tile).

    ``pos = x/tile - 0.5 = (2x - tile) / (2·tile)`` exactly (the OpenCV
    half-tile-offset convention, same as :func:`_interp_coords`), so
    ``frac(pos)`` has numerator ``(2x - tile) mod (2·tile)`` — trace-time
    integer math, enabling a fully deterministic fixed-point blend."""
    x = np.arange(size, dtype=np.int64)
    return ((2 * x - tile) % (2 * tile)).astype(np.int64)


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
    if h % gy == 0 and w % gx == 0:
        pad_h = pad_w = 0
    else:
        # OpenCV quirk (clahe.cpp): when EITHER dim is ragged it pads BOTH
        # with ``tiles - size % tiles`` and no outer modulo — a dimension
        # that already divides evenly gains a FULL extra tile of
        # REFLECT_101 rows/cols (e.g. 120x160 on a 2x3 grid pads to
        # 122x162, th=61 not 60). Replicated for bit parity
        # (tests/test_cv2_crosscheck.py).
        pad_h = gy - h % gy
        pad_w = gx - w % gx
    xe = _reflect_pad_101(x, pad_h, pad_w)
    th, tw = (h + pad_h) // gy, (w + pad_w) // gx
    tile_area = th * tw
    hist = _tile_histograms_sweep(xe.reshape(b, gy, th, gx, tw))
    clip = max(int(clip_limit * tile_area / 256.0), 1) if clip_limit > 0 else 0
    if clip > 0:
        hist = _clip_redistribute(hist, clip)
    return _tile_luts(hist, tile_area), th, tw


def _apply_band_sweep(x: jnp.ndarray, luts: jnp.ndarray,
                      th: int, tw: int, gy: int, gx: int,
                      full_hw=None, rows=None, cols=None,
                      blend: str = None) -> jnp.ndarray:
    """Bilinear 4-tile LUT blend of (b, h, w) int32 values, gather-free.

    Within a row band the two y-neighbor tile rows (ty1, ty2) are
    constant, so the four LUT taps per pixel collapse to ONE packed
    uint32 per-column table ``U = l11 | l12<<8 | l21<<16 | l22<<24``,
    built from two one-hot matmuls (each f32-exact: 16-bit pairs < 2²⁴,
    one 1 per one-hot row). The 256-bin sweep evaluates U at each pixel
    with compare + select per bin on the image's native (rows, w) lane
    layout, processing ``_SWEEP_CHUNK`` bins per fori step — the loop
    carries a single uint32 accumulator, and fewer, fatter iterations cut
    the loop-carry HBM round-trips that dominate the sweep's cost
    (measured: 2 carried planes ≈ 2× the time of 1).

    The bilinear blend runs once per pixel afterwards in **exact fixed
    point**: the interpolation weights are rationals with denominators
    2·tw / 2·th, so ``(l11·(1-xa)+l12·xa)·(1-ya) + (l21·(1-xa)+l22·xa)·ya``
    scaled by ``D = 4·th·tw`` is an exact uint32 integer (≤ 255·D < 2³²
    for any real tile size), finished with an exact round-half-even
    division. Unlike a float blend, the result is bit-identical across
    every fusion context (OpenCV's own SIMD vs scalar paths differ by ±1
    here).
    """
    if blend is None:
        blend = _DEFAULT_BLEND
    fixed_blend = blend != "cv2"
    b, h, w = x.shape
    fh, fw = full_hw if full_hw is not None else (h, w)
    ty1, ty2, yaf = _interp_coords(fh, th, gy)
    tx1, tx2, xaf = _interp_coords(fw, tw, gx)
    yan = _interp_weight_num(fh, th)       # ya = yan / (2·th), exact
    xan = _interp_weight_num(fw, tw)
    if rows is not None:                   # x is a sampled sub-grid of a
        ty1, ty2, yan, yaf = (ty1[rows], ty2[rows], yan[rows],
                              yaf[rows])   # (fh, fw) plane
    if cols is not None:
        tx1, tx2, xan, xaf = tx1[cols], tx2[cols], xan[cols], xaf[cols]
    bands = _row_bands(ty1, ty2)

    eye = np.eye(gx, dtype=np.float32)
    m1 = jnp.asarray(eye[tx1])             # (w, gx) one-hot of left tile col
    m2 = jnp.asarray(eye[tx2])
    lf = luts.astype(jnp.float32)          # (b, gy, gx, 256)

    xa_n = jnp.asarray(xan.astype(np.uint32))[None, None, :]
    twn = jnp.uint32(2 * tw)
    thn = jnp.uint32(2 * th)
    den = np.uint32(4 * th * tw)
    n_chunks = 256 // _SWEEP_CHUNK

    pallas_sweep = _pallas_sweep_active()
    x16 = x.astype(jnp.int16)  # vals are re-read every chunk iteration;
    outs = []                  # int16 halves that loop's HBM traffic
    for (y0, y1, t1, t2) in bands:
        vals = x16[:, y0:y1]               # (b, rows, w)
        lp = lf[:, t1] + 65536.0 * lf[:, t2]         # 16-bit pairs, f32-exact
        if pallas_sweep:
            from .pallas_clahe import sweep_pallas
            # (b, 256, w) layout: bin rows are lane-contiguous in VMEM
            e1t = jnp.einsum("wk,bkv->bvw", m1, lp)
            e2t = jnp.einsum("wk,bkv->bvw", m2, lp)
            packed_t = e1t.astype(jnp.uint32) + e2t.astype(jnp.uint32) * 256
            acc = sweep_pallas(vals, packed_t)
        else:
            e1 = jnp.einsum("wk,bkv->bwv", m1, lp)   # l11 + 65536·l21
            e2 = jnp.einsum("wk,bkv->bwv", m2, lp)   # l12 + 65536·l22
            packed = e1.astype(jnp.uint32) + e2.astype(jnp.uint32) * 256

            def eat(acc, v0, chunk, vals=vals):
                for i in range(_SWEEP_CHUNK):
                    acc = jnp.where(vals == v0 + i,
                                    chunk[:, :, i][:, None, :], acc)
                return acc

            def body(t, acc, vals=vals, packed=packed):
                v0 = t * _SWEEP_CHUNK
                chunk = lax.dynamic_slice(packed, (0, 0, v0),
                                          (b, w, _SWEEP_CHUNK))
                return eat(acc, v0, chunk)

            z = jnp.zeros(vals.shape, jnp.uint32)
            acc = eat(z, 0, packed) if n_chunks == 1 \
                else lax.fori_loop(0, n_chunks, body, z)

        l11 = acc & 255
        l12 = (acc >> 8) & 255
        l21 = (acc >> 16) & 255
        l22 = acc >> 24
        if fixed_blend:
            top = l11 * (twn - xa_n) + l12 * xa_n    # ≤ 255·2·tw
            bot = l21 * (twn - xa_n) + l22 * xa_n
            ya_n = jnp.asarray(yan[y0:y1].astype(np.uint32))[None, :, None]
            num = top * (thn - ya_n) + bot * ya_n    # ≤ 255·4·th·tw < 2³²
            q = num // den
            rem = num - q * den
            up = (2 * rem > den) | ((2 * rem == den) & ((q & 1) == 1))
            outs.append((q + up.astype(jnp.uint32)).astype(jnp.int32))
        else:
            # cv2-exact blend: OpenCV computes
            # (l11·xa1 + l12·xa)·ya1 + (l21·xa1 + l22·xa)·ya with each
            # multiply/add rounding separately in binary32, then cvRound.
            # A plain jnp formulation is NOT equivalent: XLA's CPU
            # codegen contracts mul+add into llvm.fmuladd (single
            # rounding) even across optimization_barrier — measured 14%
            # of random lerps off by 1 ulp. The min-with-huge-constant
            # guard is semantically a no-op for in-range values but
            # breaks the fmuladd pattern, forcing the separate f32
            # rounding cv2's SSE path has (bit-verified vs strict
            # float64-step emulation and vs cv2 itself in
            # tests/test_cv2_crosscheck.py).
            big = jnp.float32(1e30)

            def sealed(v):
                return jnp.minimum(v, big)

            # weights and complements exactly as cv2 rounds them
            # (1.0f - xa is itself a rounded f32 op) — host-side numpy
            xa = jnp.asarray(xaf)[None, None, :]
            xa1 = jnp.asarray(np.float32(1.0) - xaf)[None, None, :]
            ya = jnp.asarray(yaf[y0:y1])[None, :, None]
            ya1 = jnp.asarray(np.float32(1.0) - yaf[y0:y1])[None, :, None]
            top = sealed(l11.astype(jnp.float32) * xa1) \
                + sealed(l12.astype(jnp.float32) * xa)
            bot = sealed(l21.astype(jnp.float32) * xa1) \
                + sealed(l22.astype(jnp.float32) * xa)
            res = sealed(sealed(top) * ya1) + sealed(sealed(bot) * ya)
            outs.append(jnp.clip(jnp.rint(res), 0, 255).astype(jnp.int32))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def clahe_planar_i32(plane: jnp.ndarray, clip_limit: float = 2.0,
                     grid: tuple = (8, 8), blend: str = None) -> jnp.ndarray:
    """CLAHE on an int32 (..., H, W) plane with values in [0, 255].

    The fused-pipeline building block: int32 in/out so the surrounding
    color/median stages can stay in vector-friendly planar int32 form.
    """
    gy, gx = int(grid[0]), int(grid[1])
    batch_shape = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    x = plane.reshape((-1, h, w))
    luts, th, tw = _luts_for_plane(x, clip_limit, gy, gx)
    out = _apply_band_sweep(x, luts, th, tw, gy, gx, blend=blend)
    return out.reshape(batch_shape + (h, w)).astype(plane.dtype)


def clahe_planar_sampled_i32(plane: jnp.ndarray, plan_y, plan_x,
                             clip_limit: float = 2.0,
                             grid: tuple = (8, 8),
                             blend: str = None) -> jnp.ndarray:
    """CLAHE with the LUT apply evaluated only at a strided sample grid.

    Histogram/clip/CDF run on the FULL plane (they are defined over all
    pixels); the bilinear LUT apply — the expensive sweep — runs only at
    positions ``off + s·i`` per axis (``plan = (stride, offset, count)``).
    Bit-identical to ``clahe_planar_i32(plane)[..., oy::sy, ox::sx]``;
    used when a pure-slice letterbox consumes the result directly.
    """
    gy, gx = int(grid[0]), int(grid[1])
    batch_shape = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    x = plane.reshape((-1, h, w))
    luts, th, tw = _luts_for_plane(x, clip_limit, gy, gx)
    sy, oy, ny = plan_y
    sx, ox, nx = plan_x
    rows = np.arange(ny) * sy + oy
    cols = np.arange(nx) * sx + ox
    xs = x[:, oy:oy + sy * ny:sy, ox:ox + sx * nx:sx]
    out = _apply_band_sweep(xs, luts, th, tw, gy, gx,
                            full_hw=(h, w), rows=rows, cols=cols,
                            blend=blend)
    return out.reshape(batch_shape + (ny, nx)).astype(plane.dtype)


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


@functools.partial(jax.jit, static_argnames=("clip_limit", "grid", "blend"))
def clahe_u8(plane: jnp.ndarray, clip_limit: float = 2.0,
             grid: tuple = (8, 8), blend: str = None) -> jnp.ndarray:
    """Apply CLAHE to a batch of uint8 luma planes.

    Args:
      plane: (..., H, W) uint8.
      clip_limit: OpenCV clipLimit (float).
      grid: (tiles_y, tiles_x).

    Returns (..., H, W) uint8.
    """
    return clahe_planar_i32(plane.astype(jnp.int32), clip_limit,
                            grid, blend=blend).astype(jnp.uint8)
