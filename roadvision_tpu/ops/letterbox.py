"""Letterbox resize + inverse box mapping (the ultralytics preprocessing).

The reference's detector letterboxes each frame to the model size inside
``model.predict`` (SURVEY.md §3.2): scale by r = min(W/w, H/h), center-pad
with gray 114. Here it is a jit-friendly batched op with a STATIC target
(square 640×640 by default — the ONNX-export convention; static shapes are
what XLA needs), plus ``scale_boxes`` mapping detections back to original
image coordinates with clipping (ultralytics ops.scale_boxes semantics).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def axis_plan(src: int, dst: int):
    """Resize plan for one axis: ("id",) | ("slice", s, off) |
    ("avg2", s, off) | ("general",). "slice" means the half-pixel
    bilinear samples land exactly on input pixels ``off + s*i`` — the
    property the engine's sampled-preprocess fast path keys on."""
    if src == dst:
        return ("id",)
    if src % dst == 0:
        s = src // dst
        # sample center: s*i + (s-1)/2
        if s % 2 == 1:
            return ("slice", s, (s - 1) // 2)
        return ("avg2", s, s // 2 - 1)  # taps at offset and offset+1
    return ("general",)


def _bilinear_resize(x: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """Half-pixel bilinear resize with an exact-stride fast path.

    Takes uint8, returns float32. When the scale is an exact integer
    reciprocal 1/s, the half-pixel sample points land on integer input
    pixels (src = s·i + (s−1)/2 for odd s), so the resize is a pure
    strided slice — and for even s it is a 2-tap average of two strided
    slices. Both are bit-identical to
    ``jax.image.resize(method="linear")`` at those geometries (the
    general gather-based path measured ~0.6 ms/frame at 1080p; the
    strided forms are plain streaming slices).

    Order matters for traffic: pure slices run on the uint8 input FIRST,
    so the float32 conversion touches only the subsampled output — at
    1080p (stride 3 on both axes) that is 9× less convert traffic than
    converting the full frame up front (measured 4.75 → ~1 ms per
    8-frame batch). The avg2 taps are converted to f32 right after
    slicing; ``(a+b)·0.5`` on u8-valued f32 is exact, so the result is
    bit-identical in every ordering.
    """
    h, w = x.shape[1], x.shape[2]
    py, px = axis_plan(h, new_h), axis_plan(w, new_w)
    if "general" in (py[0], px[0]):
        # antialias=False: cv2.resize INTER_LINEAR semantics (2-tap) — the
        # kernel ultralytics letterboxes with; jax's default antialias=True
        # widens the kernel on downscale and breaks box parity
        return jax.image.resize(x.astype(jnp.float32),
                                (x.shape[0], new_h, new_w, 3),
                                method="linear", antialias=False)

    def apply(v, plan, axis):
        if plan[0] == "id":
            return v
        s, off = plan[1], plan[2]
        n = new_h if axis == 1 else new_w
        sl = [slice(None)] * v.ndim
        if plan[0] == "slice":
            sl[axis] = slice(off, off + s * n, s)
            return v[tuple(sl)]
        sl[axis] = slice(off, off + s * n, s)
        a = v[tuple(sl)].astype(jnp.float32)
        sl[axis] = slice(off + 1, off + 1 + s * n, s)
        b = v[tuple(sl)].astype(jnp.float32)
        return (a + b) * 0.5

    # dtype-preserving slices first (uint8 in → uint8 out), averaging
    # axes after — separable taps commute, and the f32 averaging math is
    # exact either way
    plans = sorted(((py, 1), (px, 2)), key=lambda p: p[0][0] != "slice")
    for plan, axis in plans:
        x = apply(x, plan, axis)
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("size",))
def letterbox_u8(frames: jnp.ndarray, size: int = 640):
    """(B, H, W, 3) uint8 BGR → (B, size, size, 3) float32 RGB in [0, 1].

    Returns (images, ratio (), pad (2,) = (dw, dh) in target pixels).
    BGR→RGB flip and /255 normalization folded in (the ultralytics
    pre-transform).
    """
    if frames.ndim == 3:
        frames = frames[None]
    h, w = frames.shape[1], frames.shape[2]
    r = min(size / h, size / w)
    new_h, new_w = round(h * r), round(w * r)
    dw, dh = (size - new_w) / 2, (size - new_h) / 2

    x = _bilinear_resize(frames[..., ::-1], new_h, new_w)  # BGR → RGB
    top, bottom = int(round(dh - 0.1)), size - new_h - int(round(dh - 0.1))
    left, right = int(round(dw - 0.1)), size - new_w - int(round(dw - 0.1))
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=114.0)
    return x / 255.0, jnp.float32(r), jnp.array([left, top], jnp.float32)


def letterbox_meta(h: int, w: int, size: int = 640, rect: bool = True,
                   stride: int = 32) -> Tuple[float, Tuple[float, float]]:
    """Host-side (ratio, (left, top)) for a given source geometry —
    exactly what letterbox_u8 / letterbox_rect_u8 return as device
    scalars, computable without running the transform (the engine uses
    it to paste segment masks without hauling the metadata off-device)."""
    r = min(size / h, size / w)
    new_h, new_w = round(h * r), round(w * r)
    if rect:
        th, tw = rect_target_hw(h, w, size, stride)
    else:
        th, tw = size, size
    dw, dh = (tw - new_w) / 2, (th - new_h) / 2
    return r, (float(int(round(dw - 0.1))), float(int(round(dh - 0.1))))


def rect_target_hw(h: int, w: int, size: int = 640,
                   stride: int = 32) -> Tuple[int, int]:
    """Minimal-rectangle letterbox target: scaled dims padded up to the
    next stride multiple (ultralytics LetterBox(auto=True), the predict
    default — yolo_ultralytics.py:28-35 runs through it). Static per
    source resolution, e.g. 1080p → (384, 640)."""
    r = min(size / h, size / w)
    new_h, new_w = round(h * r), round(w * r)
    return new_h + (-new_h) % stride, new_w + (-new_w) % stride


@functools.partial(jax.jit, static_argnames=("size", "stride"))
def letterbox_rect_u8(frames: jnp.ndarray, size: int = 640,
                      stride: int = 32):
    """Rect-pad variant of :func:`letterbox_u8`: same scale ratio, but the
    canvas is the minimal stride-aligned rectangle instead of a square —
    ultralytics' predict-time convention (``detect.rect: true``).

    Returns (images (B, th, tw, 3) float32 RGB [0,1], ratio, pad (2,)).
    """
    if frames.ndim == 3:
        frames = frames[None]
    h, w = frames.shape[1], frames.shape[2]
    r = min(size / h, size / w)
    new_h, new_w = round(h * r), round(w * r)
    th, tw = rect_target_hw(h, w, size, stride)
    dw, dh = (tw - new_w) / 2, (th - new_h) / 2

    x = _bilinear_resize(frames[..., ::-1], new_h, new_w)  # BGR → RGB
    top, bottom = int(round(dh - 0.1)), th - new_h - int(round(dh - 0.1))
    left, right = int(round(dw - 0.1)), tw - new_w - int(round(dw - 0.1))
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=114.0)
    return x / 255.0, jnp.float32(r), jnp.array([left, top], jnp.float32)


def finish_letterbox(resized_bgr: jnp.ndarray, orig_hw: Tuple[int, int],
                     size: int = 640, stride: int = 32, rect: bool = True):
    """Pad/normalize tail of the letterbox for an ALREADY-resized frame.

    ``resized_bgr`` is uint8 (B, new_h, new_w, 3) — e.g. produced by the
    engine's sampled-preprocess path, where the chain's terminal op
    evaluated directly at the bilinear sample grid. Emits exactly what
    :func:`letterbox_u8` / :func:`letterbox_rect_u8` would for the
    original (h, w) frame: channel flip, gray-114 pad, /255, plus the
    same (ratio, pad) box-mapping metadata.
    """
    h, w = orig_hw
    r = min(size / h, size / w)
    new_h, new_w = round(h * r), round(w * r)
    if rect:
        th, tw = rect_target_hw(h, w, size, stride)
    else:
        th = tw = size
    dw, dh = (tw - new_w) / 2, (th - new_h) / 2
    x = resized_bgr[..., ::-1].astype(jnp.float32)
    top, bottom = int(round(dh - 0.1)), th - new_h - int(round(dh - 0.1))
    left, right = int(round(dw - 0.1)), tw - new_w - int(round(dw - 0.1))
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=114.0)
    return x / 255.0, jnp.float32(r), jnp.array([left, top], jnp.float32)


@functools.partial(jax.jit, static_argnames=("size",))
def resize_stretch_u8(frames: jnp.ndarray, size: int = 640) -> jnp.ndarray:
    """(B, H, W, 3) uint8 BGR → (B, size, size, 3) float32 RGB [0,1].

    Plain aspect-distorting stretch resize (cv2 INTER_LINEAR semantics) —
    the RT-DETR predict convention (``LetterBox(scaleFill=True)``): no
    pad, no ratio; the model's normalized [0,1] outputs map back to the
    source frame by multiplying with (w, h) directly.
    """
    if frames.ndim == 3:
        frames = frames[None]
    x = _bilinear_resize(frames[..., ::-1], size, size)  # BGR → RGB
    return x / 255.0


def scale_boxes(boxes: jnp.ndarray, ratio, pad,
                orig_hw: Tuple[int, int]) -> jnp.ndarray:
    """Boxes in letterboxed space → original image space, clipped."""
    h, w = orig_hw
    x1 = (boxes[..., 0] - pad[0]) / ratio
    y1 = (boxes[..., 1] - pad[1]) / ratio
    x2 = (boxes[..., 2] - pad[0]) / ratio
    y2 = (boxes[..., 3] - pad[1]) / ratio
    return jnp.stack([jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
                      jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)], axis=-1)
