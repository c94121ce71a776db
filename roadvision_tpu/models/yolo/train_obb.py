"""YOLOv8-OBB training: rotated-box objective (ProbIoU TAL + DFL).

The reference is inference-only (SURVEY.md §5); this extends the native
v8 trainer (models/yolo/train.py — TAL + CIoU/DFL/BCE) to the OBB head
so the rotated-box family is trainable end-to-end, like ultralytics'
``v8OBBLoss``:

  * task-aligned assignment with ROTATED geometry: the candidate gate
    tests the anchor center inside the rotated gt box (rotate the
    anchor into the box frame — branch-free, batched) and the overlap
    metric is ProbIoU (ops/obb.py) instead of CIoU;
  * box term: ``1 − ProbIoU(pred_rbox, target_rbox)`` — the angle
    branch (cv4) receives its gradient through ProbIoU, exactly the
    ultralytics convention (no separate angle loss);
  * DFL term: distribution loss on the ltrb distances of the target
    rbox's UNROTATED (cx, cy, w, h) extent — ultralytics'
    ``bbox2dist(anchors, xywh2xyxy(target[..., :4]))`` semantics (the
    rotation is carried entirely by the angle branch, so the DFL
    regression target stays axis-aligned about the anchor);
  * cls BCE unchanged.

Gains follow the ultralytics defaults: box 7.5, cls 0.5, dfl 1.5.

GT rotated boxes are supplied as (B, M, 5): cx, cy, w, h in INPUT
pixels, θ radians in [−π/4, 3π/4) (the convention of
detect.dataset.synthetic_obb_batches and of yolov8_obb.decode_angle).

TPU-first note: everything is fixed-shape — the assignment runs over
all anchors (no dynamic fg gather anywhere in this objective; unlike
the pose/seg heads there is no per-anchor side payload to sample, so
no top-K stage is needed either).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.obb import probiou_pairs
from .train import EPS, optax_sigmoid_bce
from .yolov8 import REG_MAX, anchor_points, backbone_head_forward
from .yolov8_obb import decode_angle, decode_rbox, forward_angle_raw, obb_spec


def rotated_inside(anchors: jnp.ndarray, gt_rb: jnp.ndarray,
                   gt_mask: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) anchor centers × (B, M, 5) gt rboxes → (B, M, N) bool:
    anchor center strictly inside the rotated box (the rotated analogue
    of the axis-aligned gate in train.task_aligned_assign)."""
    dx = anchors[None, None, :, 0] - gt_rb[..., 0:1]
    dy = anchors[None, None, :, 1] - gt_rb[..., 1:2]
    cos = jnp.cos(gt_rb[..., 4:5])
    sin = jnp.sin(gt_rb[..., 4:5])
    lx = dx * cos + dy * sin          # anchor in the box frame
    ly = -dx * sin + dy * cos
    inside = (jnp.abs(lx) < gt_rb[..., 2:3] / 2.0) \
        & (jnp.abs(ly) < gt_rb[..., 3:4] / 2.0)
    return inside & gt_mask[..., None]


def task_aligned_assign_rotated(scores: jnp.ndarray, pred_rb: jnp.ndarray,
                                anchors: jnp.ndarray, gt_rb: jnp.ndarray,
                                gt_cls: jnp.ndarray, gt_mask: jnp.ndarray,
                                topk: int = 10, alpha: float = 0.5,
                                beta: float = 6.0):
    """Fixed-shape rotated task-aligned assignment — the same selection
    logic as train.task_aligned_assign with the rotated inside-gate and
    ProbIoU overlaps.

    scores (B,N,nc) sigmoid; pred_rb (B,N,5) input px; anchors (N,2)
    pixel centers; gt_rb (B,M,5); gt_cls (B,M) i32; gt_mask (B,M).

    Returns (fg_mask (B,N), target_gt (B,N) i32, target_scores (B,N,nc),
    target_rb (B,N,5)).
    """
    b, n, nc = scores.shape

    inside = rotated_inside(anchors, gt_rb, gt_mask)
    overlaps = jnp.clip(
        probiou_pairs(gt_rb[:, :, None, :], pred_rb[:, None, :, :]), 0.0)
    cls_score = jnp.take_along_axis(
        scores.transpose(0, 2, 1),
        jnp.clip(gt_cls, 0, nc - 1)[:, :, None], axis=1)   # (B, M, N)
    align = (cls_score ** alpha) * (overlaps ** beta)
    align = jnp.where(inside, align, 0.0)

    k = min(topk, n)
    topk_vals, _ = jax.lax.top_k(align, k)
    kth = topk_vals[..., -1:]
    cand = inside & (align >= kth) & (align > 0)

    masked_align = jnp.where(cand, align, -1.0)
    best_gt = jnp.argmax(masked_align, axis=1)
    best_val = jnp.max(masked_align, axis=1)
    fg = best_val > 0

    target_gt = jnp.where(fg, best_gt, 0).astype(jnp.int32)
    tb = jnp.take_along_axis(gt_rb, target_gt[..., None], axis=1)
    tc = jnp.take_along_axis(gt_cls, target_gt, axis=1)

    pos_align = jnp.where(cand, align, 0.0)
    pos_overlap = jnp.where(cand, overlaps, 0.0)
    max_align = pos_align.max(axis=-1, keepdims=True)
    max_olap = pos_overlap.max(axis=-1, keepdims=True)
    norm = pos_align * max_olap / (max_align + EPS)
    anchor_score = norm.max(axis=1)
    onehot = jax.nn.one_hot(jnp.clip(tc, 0, nc - 1), nc, dtype=scores.dtype)
    target_scores = onehot * (anchor_score * fg)[..., None]

    return fg, target_gt, target_scores, tb


def obb_loss(params, images, gt_rboxes, gt_cls, gt_mask,
             size: str = "n", nc: int = 15,
             dtype=jnp.float32, arch: str = "v8"
             ) -> Tuple[jnp.ndarray, Dict]:
    """Total v8-obb loss for a batch.

    images (B,H,W,3) float [0,1]; gt_rboxes (B,M,5) cx,cy,w,h input px
    + θ rad; gt_cls (B,M) i32; gt_mask (B,M) bool (slot validity).
    """
    spec = obb_spec(size, nc, arch)
    feats, outs = backbone_head_forward(params, images, spec, dtype)
    angle = decode_angle(forward_angle_raw(params, feats, spec, dtype))

    hw = [(o[0].shape[1], o[0].shape[2]) for o in outs]
    pts, strides = anchor_points(hw)
    bs = images.shape[0]
    box_logits = jnp.concatenate(
        [o[0].reshape(bs, -1, 4 * REG_MAX) for o in outs], axis=1)
    cls_logits = jnp.concatenate(
        [o[1].reshape(bs, -1, nc) for o in outs], axis=1)

    pred_rb = decode_rbox(box_logits, angle, hw)        # (B,N,5) input px
    anchors_px = pts * strides[:, None]
    scores = jax.nn.sigmoid(cls_logits)

    fg, _target_gt, target_scores, target_rb = task_aligned_assign_rotated(
        jax.lax.stop_gradient(scores),
        jax.lax.stop_gradient(pred_rb),
        anchors_px, gt_rboxes, gt_cls, gt_mask)
    score_sum = jnp.maximum(target_scores.sum(), 1.0)

    bce = optax_sigmoid_bce(cls_logits, target_scores)
    loss_cls = bce.sum() / score_sum

    weight = target_scores.sum(-1) * fg
    iou = probiou_pairs(pred_rb, target_rb)
    loss_box = ((1.0 - iou) * weight).sum() / score_sum

    # DFL on the unrotated extent of the target rbox (ultralytics
    # bbox2dist(xywh2xyxy(target[..., :4])) — the angle carries the
    # rotation, the distribution regresses the axis-aligned distances)
    cxy, wh2 = target_rb[..., :2], target_rb[..., 2:4] / 2.0
    t_ltrb = jnp.concatenate([
        pts[None] - (cxy - wh2) / strides[None, :, None],
        (cxy + wh2) / strides[None, :, None] - pts[None],
    ], axis=-1)
    t_ltrb = jnp.clip(t_ltrb, 0, REG_MAX - 1 - 0.01)
    tl = jnp.floor(t_ltrb).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - t_ltrb
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(box_logits.reshape(bs, -1, 4, REG_MAX),
                              axis=-1)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tr, 0, REG_MAX - 1)[..., None], axis=-1)[..., 0]
    loss_dfl = (((ce_l * wl + ce_r * wr).mean(-1)) * weight).sum() \
        / score_sum

    total = 7.5 * loss_box + 0.5 * loss_cls + 1.5 * loss_dfl
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl,
                   "num_fg": fg.sum()}


def make_train_step_obb(size: str = "n", nc: int = 15, lr: float = 1e-3,
                        dtype=jnp.float32, clip_norm: float = 10.0,
                        arch: str = "v8"):
    """SGD-momentum step for the OBB objective — same contract as
    train.make_train_step with gt_rboxes (B,M,5) in place of gt_boxes."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, momentum, images, gt_rboxes, gt_cls, gt_mask,
             lr_scale=1.0):
        def loss_fn(p):
            return obb_loss(p, images, gt_rboxes, gt_cls, gt_mask,
                            size=size, nc=nc, dtype=dtype, arch=arch)
        (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
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
        return new_params, new_mom, loss, dict(aux, grad_norm=gnorm)

    return step
