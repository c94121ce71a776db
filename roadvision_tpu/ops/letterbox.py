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

    x = frames[..., ::-1].astype(jnp.float32)  # BGR → RGB
    x = jax.image.resize(x, (frames.shape[0], new_h, new_w, 3),
                         method="linear")
    top, bottom = int(round(dh - 0.1)), size - new_h - int(round(dh - 0.1))
    left, right = int(round(dw - 0.1)), size - new_w - int(round(dw - 0.1))
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=114.0)
    return x / 255.0, jnp.float32(r), jnp.array([left, top], jnp.float32)


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

    x = frames[..., ::-1].astype(jnp.float32)  # BGR → RGB
    x = jax.image.resize(x, (frames.shape[0], new_h, new_w, 3),
                         method="linear")
    top, bottom = int(round(dh - 0.1)), th - new_h - int(round(dh - 0.1))
    left, right = int(round(dw - 0.1)), tw - new_w - int(round(dw - 0.1))
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                constant_values=114.0)
    return x / 255.0, jnp.float32(r), jnp.array([left, top], jnp.float32)


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
