"""YOLOv8-seg training: detection objective + prototype mask loss.

The reference is inference-only (SURVEY.md §5); this extends the native
v8 trainer (models/yolo/train.py — TAL + CIoU/DFL/BCE) to the Segment
head so the seg family is trainable end-to-end, like ultralytics'
``v8SegmentationLoss``:

  * detection terms unchanged (shared TAL assignment);
  * mask term: for anchors assigned to a gt, BCE between the predicted
    instance mask (coeffs · protos, at prototype resolution = input/4)
    and the gt instance mask, cropped to the gt box and normalized by
    the box area; gain 7.5 (the box gain, the ultralytics convention).

TPU-first divergence, documented: ultralytics gathers the dynamic set of
fg anchors; XLA needs static shapes, so the mask term samples the TOP-K
fg anchors by assignment weight (K=64 default — fg count per image is
~10·#gt, so K covers typical scenes; the cap is a bound, not a bias,
because anchors are ranked by the same weight that scales their loss).
Memory stays O(B·K·mh·mw) instead of O(B·N·mh·mw) — at 640² that is
52 MB vs 860 MB.

GT masks are supplied at PROTOTYPE resolution (B, M, H/4, W/4) float
(downsample full-res instance masks with [::4, ::4] nearest — the
convention of detect.dataset.synthetic_seg_batches).
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .train import (EPS, ciou, optax_sigmoid_bce, task_aligned_assign)
from .yolov8 import REG_MAX, anchor_points, backbone_head_forward
from .yolov8_seg import _proto_forward, forward_coeffs, seg_spec


def segmentation_loss(params, images, gt_boxes, gt_cls, gt_mask,
                      gt_masks, size: str = "n", nc: int = 80,
                      mask_topk: int = 64,
                      dtype=jnp.float32, arch: str = "v8"
                      ) -> Tuple[jnp.ndarray, Dict]:
    """Total v8-seg loss for a batch.

    images (B,H,W,3) float [0,1]; gt_boxes (B,M,4) xyxy input px;
    gt_cls (B,M) i32; gt_mask (B,M) bool (slot validity);
    gt_masks (B,M,H/4,W/4) float instance masks at prototype resolution.
    """
    spec = seg_spec(size, nc, arch)
    feats, outs = backbone_head_forward(params, images, spec, dtype)
    coeffs = forward_coeffs(params, feats, spec, dtype)     # (B,N,nm)
    protos = _proto_forward(params[spec["head"]]["proto"], feats[0],
                            dtype)

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

    # --- mask term: top-K fg anchors, fixed shape ---
    k = min(int(mask_topk), weight.shape[1])
    sel_w, sel_idx = jax.lax.top_k(weight, k)               # (B,K)
    sel_fg = sel_w > 0
    kc = jnp.take_along_axis(coeffs, sel_idx[..., None], axis=1)
    kgt = jnp.take_along_axis(target_gt, sel_idx, axis=1)   # (B,K)
    kboxes = jnp.take_along_axis(target_boxes, sel_idx[..., None],
                                 axis=1) / 4.0              # proto px
    tmasks = jnp.take_along_axis(
        gt_masks, kgt[..., None, None], axis=1)             # (B,K,mh,mw)

    mlogits = jnp.einsum("bkn,bhwn->bkhw", kc.astype(jnp.float32),
                         protos.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    mbce = optax_sigmoid_bce(mlogits, tmasks.astype(jnp.float32))
    mh, mw = mlogits.shape[2], mlogits.shape[3]
    col = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
    row = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
    inside = ((col >= kboxes[..., 0][..., None, None])
              & (col < kboxes[..., 2][..., None, None])
              & (row >= kboxes[..., 1][..., None, None])
              & (row < kboxes[..., 3][..., None, None]))
    area = jnp.clip((kboxes[..., 2] - kboxes[..., 0])
                    * (kboxes[..., 3] - kboxes[..., 1]), 1.0)
    per_anchor = (mbce * inside).sum((-2, -1)) / area       # (B,K)
    loss_mask = (per_anchor * sel_fg).sum() \
        / jnp.maximum(sel_fg.sum(), 1.0)

    total = 7.5 * loss_box + 0.5 * loss_cls + 1.5 * loss_dfl \
        + 7.5 * loss_mask
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl,
                   "mask": loss_mask, "num_fg": fg.sum()}


def make_train_step_seg(size: str = "n", nc: int = 80, lr: float = 1e-3,
                        mask_topk: int = 64, dtype=jnp.float32,
                        clip_norm: float = 10.0, arch: str = "v8"):
    """SGD-momentum step for the seg objective — same contract as
    train.make_train_step with a trailing gt_masks batch argument."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, momentum, images, gt_boxes, gt_cls, gt_mask,
             gt_masks, lr_scale=1.0):
        def loss_fn(p):
            return segmentation_loss(p, images, gt_boxes, gt_cls,
                                     gt_mask, gt_masks, size=size, nc=nc,
                                     mask_topk=mask_topk, dtype=dtype,
                                     arch=arch)
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
