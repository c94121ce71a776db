"""Tiled (sliced) inference for small-object detection.

Beyond-reference addition. The reference letterboxes the whole frame to
the model's input size (src/detect/yolo_ultralytics.py:26-35) — at
1080p→640 a distant vehicle shrinks 3× and falls below the detector's
effective resolution. Tiled inference (the SAHI recipe: "Slicing Aided
Hyper Inference", Akyon et al., 2022) runs the detector over a grid of
overlapping native-resolution crops plus (optionally) the full frame,
and merges the per-tile detections.

TPU-first formulation — the whole thing is three static-shape stages
around the existing detector, with NO new model code and NO
host round-trips:

  1. the tile grid is computed on host from (H, W) alone
     (:func:`tile_plan`) — a fixed tuple of slice offsets, so tile
     extraction is a stack of static slices (:func:`extract_tiles`) and
     every shape downstream is fixed;
  2. all tiles of all frames run as ONE batched forward
     ((B·T, th, tw, 3) — exactly the large-batch regime the MXU wants),
     sharing the compiled graph across tiles;
  3. per-tile anchors are mapped to source coordinates (scale + static
     offset add) and concatenated with the full-frame anchors, then a
     SINGLE class-aware NMS (ops/nms.py — exact greedy via the Jacobi
     fixpoint) merges everything: cross-tile duplicates from the
     overlap region suppress each other exactly like any other
     overlapping candidates, so no separate merge pass exists.

Config (``detect.tiling``): ``enable``, ``tile`` (crop size, defaults
to the model input size), ``overlap`` (fraction, default 0.25),
``full_frame`` (include the whole-frame pass so objects larger than a
tile are still seen, default true). Detect task only — seg/pose/obb
carry per-anchor side outputs whose cross-tile merge is not defined
here (rejected: nearest-tile attribution — silently wrong for masks
spanning tiles).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .letterbox import scale_boxes


class TilePlan(NamedTuple):
    """Static tile grid for one (H, W) geometry."""
    offsets: Tuple[Tuple[int, int], ...]   # (y, x) slice origins
    th: int                                # tile height
    tw: int                                # tile width

    @property
    def num_tiles(self) -> int:
        return len(self.offsets)


def _axis_offsets(dim: int, tile: int, overlap: float) -> Tuple[int, ...]:
    """Evenly spaced slice origins covering [0, dim) with ≥ ``overlap``
    fractional overlap between neighbors (the last tile is flush with
    the edge, so coverage is exact, never padded)."""
    if dim <= tile:
        return (0,)
    stride = max(1, tile - int(round(tile * overlap)))
    n = math.ceil((dim - tile) / stride) + 1
    return tuple(round(i * (dim - tile) / (n - 1)) for i in range(n))


def tile_plan(h: int, w: int, tile: int = 640,
              overlap: float = 0.25) -> TilePlan:
    """Host-side tile grid for an (h, w) frame. Tiles are
    ``min(tile, dim)`` per axis; a frame no larger than the tile yields
    the single full-frame tile."""
    th, tw = min(tile, h), min(tile, w)
    ys = _axis_offsets(h, th, overlap)
    xs = _axis_offsets(w, tw, overlap)
    return TilePlan(tuple((y, x) for y in ys for x in xs), th, tw)


def extract_tiles(frames: jnp.ndarray, plan: TilePlan) -> jnp.ndarray:
    """(B, H, W, C) → (B, T, th, tw, C) by static slicing (XLA fuses
    the stack with the consumer's layout; no gather)."""
    return jnp.stack([frames[:, y:y + plan.th, x:x + plan.tw]
                      for (y, x) in plan.offsets], axis=1)


def tiled_candidates(det, params, frames_u8: jnp.ndarray, plan: TilePlan,
                     full_frame: bool = True):
    """All pre-NMS detection candidates of a tiled pass, in SOURCE
    coordinates: (boxes (B, N, 4), scores (B, N, nc)) with
    N = T·A (+ A for the full-frame pass). Feed straight into
    ops.nms.nms_batch — one global NMS merges tiles and full frame.

    ``det`` is the detector surface (YOLOJax or a twin): needs
    ``.letterbox`` and ``.forward_fn``. Detect task only.
    """
    if frames_u8.ndim == 3:
        frames_u8 = frames_u8[None]
    b, h, w = frames_u8.shape[:3]
    t = plan.num_tiles

    tiles = extract_tiles(frames_u8, plan)
    flat = tiles.reshape((b * t, plan.th, plan.tw) + tiles.shape[4:])
    imgs, ratio, pad = det.letterbox(flat)
    boxes_lb, scores = det.forward_fn(params, imgs)
    # letterbox space → tile space (clipped to the tile), then the
    # static offset add into source space
    boxes_tile = scale_boxes(boxes_lb, ratio, pad, (plan.th, plan.tw))
    a = boxes_tile.shape[1]
    off = jnp.asarray([(x, y, x, y) for (y, x) in plan.offsets],
                      jnp.float32)                        # (T, 4) xyxy
    boxes_src = boxes_tile.reshape(b, t, a, 4) + off[None, :, None, :]
    boxes_all = boxes_src.reshape(b, t * a, 4)
    scores_all = scores.reshape(b, t * a, scores.shape[-1])

    if full_frame and (h > plan.th or w > plan.tw):
        imgs_f, ratio_f, pad_f = det.letterbox(frames_u8)
        boxes_f, scores_f = det.forward_fn(params, imgs_f)
        boxes_f = scale_boxes(boxes_f, ratio_f, pad_f, (h, w))
        boxes_all = jnp.concatenate([boxes_all, boxes_f], axis=1)
        scores_all = jnp.concatenate([scores_all, scores_f], axis=1)
    return boxes_all, scores_all
