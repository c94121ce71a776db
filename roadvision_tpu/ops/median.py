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
  * ``k == 3`` (the config default) — the classic 19-comparator median-of-9
    exchange network (Paeth / Graphics Gems) over 9 shifted views: pure
    ``min``/``max`` VPU ops, no sort, no gather; XLA fuses the shifted
    slices into one elementwise chain;
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


def _median9(p):
    """Median of 9 arrays via the 19-exchange network (elementwise)."""
    p = list(p)

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
    views = _window_views(xp, k, h, w)
    if k == 3:
        return _median9(views).astype(x.dtype)
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
    views = [xp[..., oy + dy: oy + dy + sy * ny: sy,
                ox + dx: ox + dx + sx * nx: sx]
             for dy in range(k) for dx in range(k)]
    if k == 3:
        return _median9(views).astype(x.dtype)
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
