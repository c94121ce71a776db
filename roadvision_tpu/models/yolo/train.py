"""YOLOv8 training: task-aligned assignment + CIoU/DFL/BCE loss in JAX.

The reference is inference-only (no training loop anywhere — SURVEY.md §5),
but a production framework must fine-tune its detector (e.g. on fog-
augmented data from tools/fog_batch.py). This implements the standard
YOLOv8 detection objective natively:

  * TaskAlignedAssigner: per-gt alignment metric cls^α · IoU^β (α=0.5,
    β=6), top-k (10) candidates among anchors whose center lies inside the
    gt box, conflicts resolved by highest metric — all with fixed-shape
    masked tensors (gt boxes padded to M slots);
  * losses: BCE on class scores with normalized aligned targets, CIoU box
    loss, and distribution-focal loss on the ltrb bin distributions;
    weighted 7.5 / 0.5 / 1.5 (box/cls/dfl, the v8 defaults);
  * everything batched and jit-compatible; gradients flow through the
    forward graph of yolov8.py.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .yolov8 import REG_MAX, anchor_points, arch_spec, forward_features, \
    forward_head

EPS = 1e-9


def ciou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU between broadcastable (..., 4) xyxy boxes."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    w1 = jnp.clip(box1[..., 2] - box1[..., 0], 0)
    h1 = jnp.clip(box1[..., 3] - box1[..., 1], 0)
    w2 = jnp.clip(box2[..., 2] - box2[..., 0], 0)
    h2 = jnp.clip(box2[..., 3] - box2[..., 1], 0)
    union = w1 * h1 + w2 * h2 - inter
    iou = inter / (union + EPS)
    # enclosing box diagonal
    cw = jnp.maximum(box1[..., 2], box2[..., 2]) \
        - jnp.minimum(box1[..., 0], box2[..., 0])
    ch = jnp.maximum(box1[..., 3], box2[..., 3]) \
        - jnp.minimum(box1[..., 1], box2[..., 1])
    c2 = cw * cw + ch * ch + EPS
    # center distance
    dx = (box1[..., 0] + box1[..., 2] - box2[..., 0] - box2[..., 2]) * 0.5
    dy = (box1[..., 1] + box1[..., 3] - box2[..., 1] - box2[..., 3]) * 0.5
    rho2 = dx * dx + dy * dy
    # aspect term
    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / (h2 + EPS))
                             - jnp.arctan(w1 / (h1 + EPS))) ** 2
    alpha = v / (v - iou + 1 + EPS)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def task_aligned_assign(scores: jnp.ndarray, pred_boxes: jnp.ndarray,
                        anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                        gt_cls: jnp.ndarray, gt_mask: jnp.ndarray,
                        topk: int = 10, alpha: float = 0.5,
                        beta: float = 6.0):
    """Fixed-shape task-aligned assignment.

    scores (B,N,nc) sigmoid; pred_boxes (B,N,4) in input pixels; anchors
    (N,2) pixel centers; gt_boxes (B,M,4); gt_cls (B,M) i32; gt_mask (B,M).

    Returns (fg_mask (B,N), target_gt (B,N) i32, target_scores (B,N,nc),
    target_boxes (B,N,4)).
    """
    b, n, nc = scores.shape
    m = gt_boxes.shape[1]

    # anchor centers inside gt (B, M, N)
    ax, ay = anchors[:, 0], anchors[:, 1]
    inside = ((ax[None, None, :] > gt_boxes[..., 0:1])
              & (ax[None, None, :] < gt_boxes[..., 2:3])
              & (ay[None, None, :] > gt_boxes[..., 1:2])
              & (ay[None, None, :] < gt_boxes[..., 3:4]))
    inside = inside & gt_mask[..., None]

    overlaps = jnp.clip(
        ciou(gt_boxes[:, :, None, :], pred_boxes[:, None, :, :]), 0.0)
    cls_score = jnp.take_along_axis(
        scores.transpose(0, 2, 1),                      # (B, nc, N)
        jnp.clip(gt_cls, 0, nc - 1)[:, :, None], axis=1)  # (B, M, N)
    align = (cls_score ** alpha) * (overlaps ** beta)
    align = jnp.where(inside, align, 0.0)

    # top-k anchors per gt
    k = min(topk, n)
    topk_vals, _ = jax.lax.top_k(align, k)          # (B, M, k)
    kth = topk_vals[..., -1:]                        # smallest kept value
    cand = inside & (align >= kth) & (align > 0)

    # conflicts: anchor claimed by the gt with the highest metric
    masked_align = jnp.where(cand, align, -1.0)
    best_gt = jnp.argmax(masked_align, axis=1)       # (B, N)
    best_val = jnp.max(masked_align, axis=1)         # (B, N)
    fg = best_val > 0

    target_gt = jnp.where(fg, best_gt, 0).astype(jnp.int32)
    tb = jnp.take_along_axis(gt_boxes, target_gt[..., None], axis=1)
    tc = jnp.take_along_axis(gt_cls, target_gt, axis=1)

    # normalized target scores (ultralytics norm_align_metric):
    # per-gt: align * max_overlap / max_align
    pos_align = jnp.where(cand, align, 0.0)
    pos_overlap = jnp.where(cand, overlaps, 0.0)
    max_align = pos_align.max(axis=-1, keepdims=True)     # (B, M, 1)
    max_olap = pos_overlap.max(axis=-1, keepdims=True)
    norm = pos_align * max_olap / (max_align + EPS)       # (B, M, N)
    anchor_score = norm.max(axis=1)                        # (B, N)
    onehot = jax.nn.one_hot(jnp.clip(tc, 0, nc - 1), nc, dtype=scores.dtype)
    target_scores = onehot * (anchor_score * fg)[..., None]

    return fg, target_gt, target_scores, tb


def detection_loss(params, images, gt_boxes, gt_cls, gt_mask,
                   size: str = "n", nc: int = 80,
                   dtype=jnp.float32, arch: str = "v8"
                   ) -> Tuple[jnp.ndarray, Dict]:
    """Total v8/v11 loss for a batch (the TAL objective is shared — the
    two generations differ only in the feature/head graphs).

    images (B,H,W,3) float [0,1]; gt_boxes (B,M,4) xyxy input pixels;
    gt_cls (B,M) i32; gt_mask (B,M) bool.
    """
    if arch == "11":
        from .yolo11 import (arch_spec_11, forward_features_11,
                             forward_head_11)
        spec = arch_spec_11(size, nc)
        feats = forward_features_11(params, images, spec, dtype)
        outs = forward_head_11(params, feats, spec, dtype)
    else:
        spec = arch_spec(size, nc)
        feats = forward_features(params, images, spec, dtype)
        outs = forward_head(params, feats, spec, dtype)

    hw = [(o[0].shape[1], o[0].shape[2]) for o in outs]
    pts, strides = anchor_points(hw)                 # grid units / (N,)
    bs = images.shape[0]
    box_logits = jnp.concatenate(
        [o[0].reshape(bs, -1, 4 * REG_MAX) for o in outs], axis=1)
    cls_logits = jnp.concatenate(
        [o[1].reshape(bs, -1, nc) for o in outs], axis=1)

    probs = jax.nn.softmax(box_logits.reshape(bs, -1, 4, REG_MAX), axis=-1)
    ltrb = jnp.sum(probs * jnp.arange(REG_MAX, dtype=jnp.float32), axis=-1)
    anchors_px = pts * strides[:, None]
    x1y1 = (pts[None] - ltrb[..., :2]) * strides[None, :, None]
    x2y2 = (pts[None] + ltrb[..., 2:]) * strides[None, :, None]
    pred_boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    scores = jax.nn.sigmoid(cls_logits)

    fg, target_gt, target_scores, target_boxes = task_aligned_assign(
        jax.lax.stop_gradient(scores),
        jax.lax.stop_gradient(pred_boxes),
        anchors_px, gt_boxes, gt_cls, gt_mask)

    score_sum = jnp.maximum(target_scores.sum(), 1.0)

    # --- cls: BCE over all anchors ---
    bce = optax_sigmoid_bce(cls_logits, target_scores)
    loss_cls = bce.sum() / score_sum

    # --- box: CIoU on fg, weighted by target score ---
    weight = target_scores.sum(-1) * fg                   # (B, N)
    iou_term = ciou(pred_boxes, target_boxes)
    loss_box = ((1.0 - iou_term) * weight).sum() / score_sum

    # --- dfl on fg ---
    # target distances in grid units, clamped to reg_max - 1 - eps
    t_ltrb = jnp.concatenate([
        pts[None] - target_boxes[..., :2] / strides[None, :, None],
        target_boxes[..., 2:] / strides[None, :, None] - pts[None],
    ], axis=-1)
    t_ltrb = jnp.clip(t_ltrb, 0, REG_MAX - 1 - 0.01)
    tl = jnp.floor(t_ltrb).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - t_ltrb
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(box_logits.reshape(bs, -1, 4, REG_MAX), axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tr, 0, REG_MAX - 1)[..., None], axis=-1)[..., 0]
    dfl = (ce_l * wl + ce_r * wr).mean(-1)                # (B, N)
    loss_dfl = (dfl * weight).sum() / score_sum

    total = 7.5 * loss_box + 0.5 * loss_cls + 1.5 * loss_dfl
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl,
                   "num_fg": fg.sum()}


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable sigmoid binary cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def make_train_step(size: str = "n", nc: int = 80, lr: float = 1e-3,
                    dtype=jnp.float32, clip_norm: float = 10.0,
                    arch: str = "v8"):
    """SGD-with-momentum train step (pure jax — no optax state pytree
    surprises under sharding), with global-norm gradient clipping and a
    non-finite guard (a NaN batch is skipped rather than poisoning the
    momentum). Returns step(params, momentum, batch)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, momentum, images, gt_boxes, gt_cls, gt_mask,
             lr_scale=1.0):
        def loss_fn(p):
            return detection_loss(p, images, gt_boxes, gt_cls, gt_mask,
                                  size=size, nc=nc, dtype=dtype,
                                  arch=arch)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree_util.tree_leaves(grads)))
        ok = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        scale = jnp.where(ok, jnp.minimum(1.0, clip_norm / (gnorm + 1e-9)),
                          0.0)
        new_mom = jax.tree_util.tree_map(
            # jnp.where (not scale*g): 0*NaN is NaN, which would
            # poison the momentum forever on a skipped batch
            lambda m, g: 0.9 * m + jnp.where(ok, scale * g, 0.0),
            momentum, grads)
        new_params = jax.tree_util.tree_map(
            lambda p, m: p - (lr * lr_scale) * m, params, new_mom)
        aux = dict(aux, grad_norm=gnorm)
        return new_params, new_mom, loss, aux

    return step


def init_momentum(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def make_ema_update(decay: float = 0.9990, tau: float = 2000.0):
    """Exponential-moving-average weight tracker (the ultralytics
    convention: decay ramps in as ``decay · (1 − e^(−step/tau))`` so
    early steps, where raw weights move fastest, are averaged lightly).
    EMA weights are what get exported for eval/deploy."""

    @jax.jit
    def update(ema, params, step):
        d = decay * (1.0 - jnp.exp(-step.astype(jnp.float32) / tau))
        return jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, ema, params)

    return update
