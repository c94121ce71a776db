"""YOLOv8-pose training: detection objective + OKS keypoint loss.

The reference is inference-only (SURVEY.md §5); this extends the native
v8 trainer (models/yolo/train.py — TAL + CIoU/DFL/BCE) to the Pose head
so the keypoint family is trainable end-to-end, like ultralytics'
``v8PoseLoss``:

  * detection terms unchanged (shared TAL assignment);
  * location term (ultralytics ``KeypointLoss``): for anchors assigned
    to a gt, OKS-shaped ``1 − exp(−d² / (2σ)² / (2·area))`` per COCO
    keypoint, masked to labelled joints and re-weighted by
    ``nk / #labelled`` — both distances and the gt-box area are taken
    in input pixels, so the ratio matches ultralytics' grid-unit math
    exactly (both divide out the stride);
  * visibility term (``kobj``): BCE between the raw visibility logit
    and the labelled-joint mask.

Gains follow the ultralytics defaults: pose 12.0, kobj 1.0 on top of
the detection 7.5/0.5/1.5.

TPU-first divergence, documented (same as train_seg.py): ultralytics
gathers the dynamic fg-anchor set; XLA needs static shapes, so the
keypoint terms sample the TOP-K fg anchors by assignment weight
(K=64 default — fg count per image is ~10·#gt).

GT keypoints are supplied as (B, M, 17, 3): x, y in INPUT pixels,
v > 0 marks a labelled joint (the convention of
detect.dataset.synthetic_pose_batches).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .train import EPS, ciou, optax_sigmoid_bce, task_aligned_assign
from .yolov8 import REG_MAX, anchor_points, backbone_head_forward
from .yolov8_pose import KPT_SHAPE, forward_kpts_raw, pose_spec

# COCO OKS per-keypoint falloff constants (cocoeval.py convention)
OKS_SIGMAS = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72,
                       .62, .62, 1.07, 1.07, .87, .87, .89, .89],
                      np.float32) / 10.0


def pose_loss(params, images, gt_boxes, gt_cls, gt_mask, gt_kpts,
              size: str = "n", nc: int = 1, kpt_topk: int = 64,
              dtype=jnp.float32, arch: str = "v8"
              ) -> Tuple[jnp.ndarray, Dict]:
    """Total v8-pose loss for a batch.

    images (B,H,W,3) float [0,1]; gt_boxes (B,M,4) xyxy input px;
    gt_cls (B,M) i32; gt_mask (B,M) bool (slot validity);
    gt_kpts (B,M,17,3) float — x, y input px, v>0 labelled.
    """
    spec = pose_spec(size, nc, arch)
    feats, outs = backbone_head_forward(params, images, spec, dtype)
    kraw = forward_kpts_raw(params, feats, spec, dtype)     # (B,N,51)

    hw = [(o[0].shape[1], o[0].shape[2]) for o in outs]
    pts, strides = anchor_points(hw)
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

    # --- detection terms (identical math to train.detection_loss) ---
    bce = optax_sigmoid_bce(cls_logits, target_scores)
    loss_cls = bce.sum() / score_sum
    weight = target_scores.sum(-1) * fg
    loss_box = ((1.0 - ciou(pred_boxes, target_boxes)) * weight).sum() \
        / score_sum
    t_ltrb = jnp.concatenate([
        pts[None] - target_boxes[..., :2] / strides[None, :, None],
        target_boxes[..., 2:] / strides[None, :, None] - pts[None],
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

    # --- keypoint terms: top-K fg anchors, fixed shape ---
    k = min(int(kpt_topk), weight.shape[1])
    sel_w, sel_idx = jax.lax.top_k(weight, k)               # (B,K)
    sel_fg = (sel_w > 0).astype(jnp.float32)
    kgt = jnp.take_along_axis(target_gt, sel_idx, axis=1)   # (B,K)
    tkpts = jnp.take_along_axis(
        gt_kpts, kgt[..., None, None], axis=1)              # (B,K,17,3)
    kboxes = jnp.take_along_axis(target_boxes, sel_idx[..., None], axis=1)

    kr = jnp.take_along_axis(kraw, sel_idx[..., None], axis=1) \
        .reshape(bs, k, *KPT_SHAPE).astype(jnp.float32)     # (B,K,17,3)
    spts = jnp.take(pts, sel_idx, axis=0)                   # (B,K,2)
    sstr = jnp.take(strides, sel_idx, axis=0)               # (B,K)
    pred_xy = (kr[..., :2] * 2.0 + (spts[:, :, None, :] - 0.5)) \
        * sstr[..., None, None]                             # input px

    kpt_vis = (tkpts[..., 2] > 0).astype(jnp.float32)       # (B,K,17)
    d2 = jnp.sum((pred_xy - tkpts[..., :2]) ** 2, axis=-1)  # (B,K,17)
    area = jnp.clip((kboxes[..., 2] - kboxes[..., 0])
                    * (kboxes[..., 3] - kboxes[..., 1]), 1.0)
    sig = jnp.asarray(OKS_SIGMAS)[None, None, :]
    e = d2 / (2.0 * sig) ** 2 / (area[..., None] + EPS) / 2.0
    factor = KPT_SHAPE[0] / (kpt_vis.sum(-1, keepdims=True) + EPS)
    per_anchor = (factor * (1.0 - jnp.exp(-e)) * kpt_vis).mean(-1)
    fg_n = jnp.maximum(sel_fg.sum(), 1.0)
    loss_pose = (per_anchor * sel_fg).sum() / fg_n

    kobj = optax_sigmoid_bce(kr[..., 2], kpt_vis).mean(-1)
    loss_kobj = (kobj * sel_fg).sum() / fg_n

    total = 7.5 * loss_box + 0.5 * loss_cls + 1.5 * loss_dfl \
        + 12.0 * loss_pose + 1.0 * loss_kobj
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl,
                   "pose": loss_pose, "kobj": loss_kobj,
                   "num_fg": fg.sum()}


def make_train_step_pose(size: str = "n", nc: int = 1, lr: float = 1e-3,
                         kpt_topk: int = 64, dtype=jnp.float32,
                         clip_norm: float = 10.0, arch: str = "v8"):
    """SGD-momentum step for the pose objective — same contract as
    train.make_train_step with a trailing gt_kpts batch argument."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, momentum, images, gt_boxes, gt_cls, gt_mask,
             gt_kpts, lr_scale=1.0):
        def loss_fn(p):
            return pose_loss(p, images, gt_boxes, gt_cls, gt_mask,
                             gt_kpts, size=size, nc=nc,
                             kpt_topk=kpt_topk, dtype=dtype, arch=arch)
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
