"""Batched median filter — TPU-native replacement for ``cv2.medianBlur``.

Reference call sites: src/preprocess/ops/median_derain.py:14 (CPU) and
src/preprocess/ops_cuda/cuda_median_derain.py:27,41 (CUDA) — SURVEY.md §2.3.
Semantics preserved: odd ksize in [3, 9], replicate border (OpenCV's
medianBlur border mode), exact uint8 median (window size is odd so no
averaging is involved).

TPU strategy — planar int16 core (u8-domain values):

  * channels run as full-width (..., H, W) planes (channel-last (..., 3)
    arrays put a 3-wide axis in the 128-lane dimension — measured ~4× slower
    on this backend, tools/profile_preprocess.py);
  * ``k == 3`` (the config default) — shared sorted vertical triples +
    the exact separable identity ``median9 = med3(max3(lows),
    med3(mids), min3(highs))``: each column position sorts once and is
    reused by its three horizontal neighbors, ~20 int ops/pixel vs the
    19-exchange network's 38 (which re-sorted every window's columns);
    pure ``min``/``max``/add VPU ops, no sort, no gather;
  * ``k >= 5`` — k² shifted views stacked on a leading axis and selected via
    ``jnp.sort``'s middle element. Exact and simple; the k=3 default is the
    hot path, larger kernels are the reference's rarely-used "derain"
    placeholder settings.

A Pallas tile kernel for k=3 exists in ops/pallas_median.py (bit-exact vs
this path, tested in interpret mode); it is opt-in via RVT_PALLAS=1 — on
this attach the fused XLA planar form measured faster than the per-tile
DMA kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_spatial(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Replicate-pad the trailing two (H, W) axes."""
    widths = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(x, widths, mode="edge")


def _window_views(xp: jnp.ndarray, k: int, h: int, w: int):
    """The k² window elements as shifted slices of the padded plane."""
    return [xp[..., dy:dy + h, dx:dx + w]
            for dy in range(k) for dx in range(k)]


def _med3(a, b, c):
    """Median of three (4 ops)."""
    return jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c))


def _median3x3_shared(col_rows, w: int, xs=None):
    """3×3 median from SHARED sorted vertical triples.

    ``col_rows`` = (a, b, c): the three vertically-shifted views of the
    padded plane, each (..., rows, w+2). Each column position is sorted
    ONCE (lo/mid/hi; mid as sum−lo−hi — exact for u8-domain int16,
    ≤ 765) and reused by the three horizontal taps that share it, then
    the classic exact identity
    ``median9 = med3(max3(lows), med3(mids), min3(highs))``
    finishes the merge: ~20 int ops per pixel vs the 19-exchange
    network's 38. ``xs(v, dx)`` slices the horizontal taps (defaults to
    the dense ``v[..., dx:dx+w]``; the strided variant samples)."""
    a, b, c = col_rows
    lo = jnp.minimum(jnp.minimum(a, b), c)
    hi = jnp.maximum(jnp.maximum(a, b), c)
    mid = a + b + c - lo - hi
    if xs is None:
        def xs(v, dx):
            return v[..., dx:dx + w]
    mx = jnp.maximum(jnp.maximum(xs(lo, 0), xs(lo, 1)), xs(lo, 2))
    md = _med3(xs(mid, 0), xs(mid, 1), xs(mid, 2))
    mn = jnp.minimum(jnp.minimum(xs(hi, 0), xs(hi, 1)), xs(hi, 2))
    return _med3(mx, md, mn)


def _normalize_ksize(ksize: int) -> int:
    """Reference op's normalization: even → +1, clamp [3, 9]
    (src/preprocess/ops/median_derain.py:11-13)."""
    k = int(ksize)
    if k % 2 == 0:
        k += 1
    return max(3, min(k, 9))


def median_planar_i32(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Median-filter (..., H, W) integer planes, replicate border, odd k∈[3,9].

    Values must be in the uint8 domain [0, 255] (the pipeline contract):
    the exchange network runs in int16, which measured 1.5× faster than
    int32 on TPU (half the VMEM/HBM footprint per lane —
    tools/profile_preprocess.py). Output keeps the input dtype.
    """
    k = _normalize_ksize(ksize)
    h, w = x.shape[-2], x.shape[-1]
    xp = _pad_spatial(x.astype(jnp.int16), k // 2)
    if k == 3:
        cols = (xp[..., 0:h, :], xp[..., 1:h + 1, :], xp[..., 2:h + 2, :])
        return _median3x3_shared(cols, w).astype(x.dtype)
    views = _window_views(xp, k, h, w)
    stack = jnp.stack(views, axis=0)
    return jnp.sort(stack, axis=0)[(k * k) // 2].astype(x.dtype)


def median_planar_strided_i32(x: jnp.ndarray, ksize: int,
                              plan_y, plan_x) -> jnp.ndarray:
    """Median output evaluated only at a strided sample grid.

    ``plan_y``/``plan_x`` are ``(stride, offset, count)``: the output is
    bit-identical to ``median_planar_i32(x)[..., off_y::s_y, off_x::s_x]``
    (count entries per axis) but computes the exchange network at 1/(s_y·s_x)
    of the positions. Used when a pure-slice letterbox immediately
    subsamples the filtered frame (ops/letterbox.py axis_plan) — the
    windows still read every input pixel; only compute and writes drop.
    """
    k = _normalize_ksize(ksize)
    sy, oy, ny = plan_y
    sx, ox, nx = plan_x
    xp = _pad_spatial(x.astype(jnp.int16), k // 2)
    if k == 3:
        cols = tuple(xp[..., oy + dy: oy + dy + sy * ny: sy, :]
                     for dy in range(3))

        def xs(v, dx):
            return v[..., ox + dx: ox + dx + sx * nx: sx]

        return _median3x3_shared(cols, nx, xs=xs).astype(x.dtype)
    views = [xp[..., oy + dy: oy + dy + sy * ny: sy,
                ox + dx: ox + dx + sx * nx: sx]
             for dy in range(k) for dx in range(k)]
    stack = jnp.stack(views, axis=0)
    return jnp.sort(stack, axis=0)[(k * k) // 2].astype(x.dtype)


def _use_pallas() -> bool:
    import os
    return (os.environ.get("RVT_PALLAS", "0") == "1"
            and jax.default_backend() == "tpu")  # Mosaic-only primitives


@functools.partial(jax.jit, static_argnames=("ksize",))
def median_blur_u8(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Median-filter a (..., H, W, C) uint8 array with an odd k in [3, 9].

    Channels are moved to the batch axis and filtered as int32 planes
    (lane-friendly layout), then repacked to channel-last uint8.
    """
    k = _normalize_ksize(ksize)
    if k == 3 and x.ndim >= 3 and _use_pallas():
        from .pallas_median import median3_pallas
        return median3_pallas(x)
    planes = jnp.moveaxis(x, -1, 0).astype(jnp.int32)  # (C, ..., H, W)
    out = median_planar_i32(planes, k)
    return jnp.moveaxis(out, 0, -1).astype(jnp.uint8)
