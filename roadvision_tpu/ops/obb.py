"""Rotated-box (OBB) geometry + fixed-shape rotated NMS as XLA ops.

Beyond-reference model family support (the reference wrapper serves
axis-aligned detection only, src/detect/yolo_ultralytics.py:16): the
YOLOv8-OBB task needs a rotated-box overlap measure and an NMS over it.

Overlap is ProbIoU (Murrugarra-Llerena et al., "ProbIoU: probabilistic
IoU for oriented object detection" — the similarity ultralytics' OBB
pipeline suppresses with): each rotated box (cx, cy, w, h, θ) is viewed
as a Gaussian with covariance diag(w²/12, h²/12) rotated by θ, and
1 − Hellinger distance between the two Gaussians (via the Bhattacharyya
coefficient) is the IoU surrogate. Closed-form, elementwise, batched —
no polygon clipping, which would be branch-heavy and hostile to XLA.

The NMS reuses the Jacobi-fixpoint EXACT greedy of ops/nms.py (score-
descending suppression) with the ProbIoU matrix and the same
center-offset class trick. Documented divergence: ultralytics'
``nms_rotated`` uses a one-pass upper-triangular approximation
(a box suppressed by an already-suppressed box stays suppressed);
this implementation is the exact greedy chain — strictly the
textbook NMS semantics, matching our axis-aligned kernel.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .nms import MAX_WH

_EPS = 1e-7


def rbox_covariance(rb: jnp.ndarray):
    """(..., 5) cx,cy,w,h,θ → the Gaussian covariance terms (a, b, c):
    cov = [[a, c], [c, b]] of the rotated diag(w²/12, h²/12)."""
    a = rb[..., 2] ** 2 / 12.0
    b = rb[..., 3] ** 2 / 12.0
    cos = jnp.cos(rb[..., 4])
    sin = jnp.sin(rb[..., 4])
    return (a * cos ** 2 + b * sin ** 2,
            a * sin ** 2 + b * cos ** 2,
            (a - b) * cos * sin)


def probiou_pairs(rb1: jnp.ndarray, rb2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (broadcastable) ProbIoU between (..., 5) rboxes:
    1 − √(1 − exp(−B_d)) with B_d the Bhattacharyya distance of the two
    box Gaussians."""
    x1, y1 = rb1[..., 0], rb1[..., 1]
    x2, y2 = rb2[..., 0], rb2[..., 1]
    a1, b1, c1 = rbox_covariance(rb1)
    a2, b2, c2 = rbox_covariance(rb2)

    den = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) \
        / (den + _EPS) * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / (den + _EPS) * 0.5
    det1 = jnp.maximum(a1 * b1 - c1 ** 2, 0.0)
    det2 = jnp.maximum(a2 * b2 - c2 ** 2, 0.0)
    t3 = jnp.log(den / (4.0 * jnp.sqrt(det1 * det2) + _EPS) + _EPS) * 0.5
    bd = jnp.clip(t1 + t2 + t3, _EPS, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + _EPS)
    return 1.0 - hd


def probiou_matrix(rb: jnp.ndarray) -> jnp.ndarray:
    """(K, 5) → (K, K) pairwise ProbIoU."""
    return probiou_pairs(rb[:, None, :], rb[None, :, :])


def rbox_corners(rb: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) → (..., 4, 2) corner coordinates (xy), in box order
    (+w+h, +w−h, −w−h, −w+h rotated by θ about the center)."""
    cx, cy, w, h, th = (rb[..., i] for i in range(5))
    cos, sin = jnp.cos(th), jnp.sin(th)
    dx = jnp.stack([w, w, -w, -w], axis=-1) / 2.0
    dy = jnp.stack([h, -h, -h, h], axis=-1) / 2.0
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], axis=-1)


def rbox_to_aabb(rb: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) → (..., 4) enclosing axis-aligned xyxy (the compatible
    Detection.x1y1x2y2 surface — trackers/vis stay unchanged)."""
    c = rbox_corners(rb)
    return jnp.concatenate([c.min(axis=-2), c.max(axis=-2)], axis=-1)


def scale_rboxes(rb: jnp.ndarray, ratio, pad, orig_hw) -> jnp.ndarray:
    """Letterbox-space rboxes → source-frame pixels (the rotated
    analogue of ops.letterbox.scale_boxes): un-pad + un-scale the
    center and size, clamp the center into the frame; θ unchanged."""
    h, w = orig_hw
    cx = jnp.clip((rb[..., 0] - pad[0]) / ratio, 0, w)
    cy = jnp.clip((rb[..., 1] - pad[1]) / ratio, 0, h)
    return jnp.stack([cx, cy, rb[..., 2] / ratio, rb[..., 3] / ratio,
                      rb[..., 4]], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("conf_thres", "iou_thres", "max_det",
                                    "pre_topk", "classes_keep",
                                    "return_idx"))
def nms_rotated_single(rboxes: jnp.ndarray, scores: jnp.ndarray,
                       conf_thres: float = 0.25, iou_thres: float = 0.7,
                       max_det: int = 100, pre_topk: int = 300,
                       classes_keep: Optional[Tuple[int, ...]] = None,
                       return_idx: bool = False):
    """One image. rboxes (N, 5) cx,cy,w,h,θ; scores (N, nc).

    Same contract as ops.nms.nms_single with rboxes in place of xyxy:
    returns (rboxes (max_det, 5), conf, cls, valid[, src_idx]),
    score-descending, exact-greedy ProbIoU suppression, class-aware via
    center offsets, classes_keep applied after."""
    conf = jnp.max(scores, axis=-1)
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    cand = conf > conf_thres

    k = min(pre_topk, rboxes.shape[0])
    sel_scores, sel_idx = jax.lax.top_k(jnp.where(cand, conf, -1.0), k)
    sel_rb = rboxes[sel_idx]
    sel_cls = cls[sel_idx]
    sel_valid = sel_scores > 0.0

    offset = sel_cls.astype(jnp.float32)[:, None] * MAX_WH
    shifted = sel_rb.at[:, :2].add(offset)
    iou = probiou_matrix(shifted)

    lower = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])
    suppress_pair = (iou > iou_thres) & lower \
        & sel_valid[:, None] & sel_valid[None, :]

    def fix_cond(carry):
        _, prev_changed = carry
        return prev_changed

    def fix_body(carry):
        keep, _ = carry
        new = sel_valid & ~jnp.any(suppress_pair & keep[:, None], axis=0)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(fix_cond, fix_body,
                                 (sel_valid, jnp.bool_(True)))

    order = jnp.argsort(~keep, stable=True)
    kept_rb = sel_rb[order][:max_det]
    kept_conf = sel_scores[order][:max_det]
    kept_cls = sel_cls[order][:max_det]
    kept_valid = keep[order][:max_det]

    if classes_keep:
        allowed = jnp.zeros((scores.shape[-1],), bool)
        for c in classes_keep:
            allowed = allowed.at[int(c)].set(True)
        kept_valid = kept_valid & allowed[kept_cls]

    if return_idx:
        kept_idx = sel_idx[order][:max_det].astype(jnp.int32)
        return kept_rb, kept_conf, kept_cls, kept_valid, kept_idx
    return kept_rb, kept_conf, kept_cls, kept_valid


def nms_rotated_batch(rboxes: jnp.ndarray, scores: jnp.ndarray, **kw):
    """vmapped rotated NMS over a leading batch axis."""
    fn = lambda b, s: nms_rotated_single(b, s, **kw)  # noqa: E731
    return jax.vmap(fn)(rboxes, scores)
