"""Test-time augmentation: the ultralytics ``predict(augment=True)`` surface.

The reference reaches detection through the ultralytics wrapper
(/root/reference/src/detect/yolo_ultralytics.py:28-35), whose model class
also serves augmented inference: three forwards at scales 1 / 0.83 / 0.67
with flips none / horizontal / none (DetectionModel._predict_augment),
each canvas bilinear-resized then zero-phase padded bottom-right to a
stride-32 multiple with fill 0.447 (torch_utils.scale_img), predictions
un-scaled and un-flipped back to the base canvas (_descale_pred), the
full-scale pass's stride-32 tail and the smallest pass's stride-8 head
trimmed (_clip_augmented), all candidates concatenated into ONE NMS.

TPU-native formulation: every augmented canvas size is static (scales
are compile-time constants), so the three forwards fuse into the same
jitted step as the base pass — no dynamic shapes, and XLA schedules the
three graphs back-to-back on the MXU. Accuracy-over-speed knob
(`detect.tta: true`): ~2.1x the forward FLOPs of a single pass.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# (scale, horizontal_flip) triples — ultralytics DetectionModel semantics
# (flip code 3 = mirror along W). Order matters for _clip_augmented.
TTA_SCALES: Tuple[float, ...] = (1.0, 0.83, 0.67)
TTA_HFLIP: Tuple[bool, ...] = (False, True, False)
_PAD_VALUE = 0.447  # imagenet-mean gray, the ultralytics scale_img fill
_NL = 3             # detection levels (strides 8/16/32)


def scale_img(x: jnp.ndarray, ratio: float, gs: int = 32) -> jnp.ndarray:
    """(B, H, W, C) float canvas → bilinear resize by ``ratio`` then pad
    bottom/right to a ``gs`` multiple with the 0.447 fill (ultralytics
    torch_utils.scale_img, same_shape=False). Static output shape."""
    if ratio == 1.0:
        return x
    b, h, w, c = x.shape
    sh, sw = int(h * ratio), int(w * ratio)
    # half-pixel-center bilinear without antialias == F.interpolate's
    # align_corners=False default
    y = jax.image.resize(x, (b, sh, sw, c), method="bilinear",
                         antialias=False)
    ph = math.ceil(h * ratio / gs) * gs - sh
    pw = math.ceil(w * ratio / gs) * gs - sw
    return jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)),
                   constant_values=_PAD_VALUE)


def clip_bounds(n_anchors: int, aug_index: int, n_augs: int,
                nl: int = _NL) -> Tuple[int, int]:
    """Kept anchor range [start, stop) for one augmentation's candidates
    (ultralytics _clip_augmented): the first (full-scale) pass drops its
    last n//g anchors — the ENTIRE stride-32 level (n = 21·hw32 on a
    stride-32 canvas, so n//g = hw32), whose large-object
    duplicates the downscaled passes cover better — and the last
    (smallest-scale) pass drops its first (n//g)·4^(nl-1) anchors — the
    whole stride-8 level, whose small objects downscaling destroyed.
    Valid when the canvas is a stride-32 multiple (levels are then in
    exact 16:4:1 anchor proportion, so g = 21 divides n)."""
    g = sum(4 ** k for k in range(nl))
    start, stop = 0, n_anchors
    if aug_index == 0:
        stop = n_anchors - n_anchors // g
    if aug_index == n_augs - 1:
        start = (n_anchors // g) * 4 ** (nl - 1)
    return start, stop


def tta_candidates(fwd, params, imgs: jnp.ndarray):
    """Augmented candidate set for a letterboxed float canvas.

    Args:
      fwd: ``fwd(params, imgs) -> (boxes_xyxy_px, scores)`` — the
        detector's forward+decode (YOLOJax.forward_fn).
      imgs: (B, H, W, 3) float in [0, 1], H and W stride-32 multiples.

    Returns:
      (boxes (B, N', 4) in the BASE canvas pixel space, scores
      (B, N', nc)) concatenated over the three augmented passes, tails
      trimmed per clip_bounds — feed straight into one nms_batch.
    """
    w_base = imgs.shape[2]
    boxes_out, scores_out = [], []
    for i, (s, hflip) in enumerate(zip(TTA_SCALES, TTA_HFLIP)):
        xi = imgs[:, :, ::-1, :] if hflip else imgs
        xi = scale_img(xi, s)
        boxes, scores = fwd(params, xi)
        boxes = boxes / s
        if hflip:
            # mirrored center, same width: x1' = W - x2, x2' = W - x1
            boxes = jnp.concatenate(
                [w_base - boxes[..., 2:3], boxes[..., 1:2],
                 w_base - boxes[..., 0:1], boxes[..., 3:4]], axis=-1)
        start, stop = clip_bounds(boxes.shape[1], i, len(TTA_SCALES))
        boxes_out.append(boxes[:, start:stop])
        scores_out.append(scores[:, start:stop])
    return (jnp.concatenate(boxes_out, axis=1),
            jnp.concatenate(scores_out, axis=1))


def tta_nms(fwd, params, imgs: jnp.ndarray, *, conf: float, iou: float,
            max_det: int, classes_keep=None):
    """Augmented candidate set → ONE merged NMS: (boxes, conf, cls,
    valid) in the letterbox canvas pixel space (callers apply their own
    ``scale_boxes``). The single implementation is shared by
    ``YOLOJax``'s standalone TTA executable and the engine's fused
    raw_step so the pre_topk / clip rules cannot drift between paths."""
    from .nms import nms_batch
    boxes640, scores = tta_candidates(fwd, params, imgs)
    # 3 augmented passes → up to 3 overlap duplicates per object
    # pre-merge; pre_topk doubled vs the single-pass 300
    return nms_batch(boxes640, scores, conf_thres=conf, iou_thres=iou,
                     max_det=max_det, pre_topk=600,
                     classes_keep=classes_keep)
