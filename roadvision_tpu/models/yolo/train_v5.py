"""YOLOv5 training: anchor-based build-targets + CIoU/obj/cls BCE in JAX.

Completes the training story for the alternate detector family the
reference config offers (configs/default.yaml:39 comment — yolov5*.pt is
a drop-in weight): the classic v5 (v6.0) objective, re-designed with
fixed shapes for XLA:

  * build_targets: per level, a gt is assigned to an anchor when
    max(wh_ratio, 1/wh_ratio) < anchor_t (4.0), and to THREE grid cells —
    the center cell plus the two nearest neighbors chosen by the center's
    fractional position (the ±0.5 offset rule). Expressed as a dense
    (B, M, A, 5-candidate-cells) mask instead of the reference
    implementation's variable-length index lists;
  * box: CIoU on positives with the v5 decode
    (xy = 2σ−0.5 + cell, wh = (2σ)²·anchor, grid units);
  * objectness: BCE over ALL anchors; positive targets are the detached
    CIoU (gr = 1.0), per-level balance weights (4.0, 1.0, 0.4);
  * cls: BCE one-hot on positives;
  * weights box 0.05, obj 1.0, cls 0.5·nc/80; total scaled by batch size
    (the v5 convention).

Positives are gathered/scattered with flat masked indices (`mode="drop"`)
— training runs a handful of scatters per level over ≤ B·M·A·3 slots,
which is fine off the latency-critical inference path.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .train import ciou, init_momentum, optax_sigmoid_bce
from .yolov5 import ANCHORS, NUM_ANCHORS, STRIDES, arch_spec, \
    forward_features, forward_head

ANCHOR_T = 4.0
BALANCE = (4.0, 1.0, 0.4)
# candidate cell offsets: center, left, up, right, down (grid units)
_OFFSETS = jnp.array([[0, 0], [-1, 0], [0, -1], [1, 0], [0, 1]], jnp.float32)
G = 0.5  # neighbor-cell reach


def _level_targets(gt_boxes, gt_mask, anchors_grid, hw):
    """Positive (cell, anchor) assignments for one level, fixed shapes.

    gt_boxes (B,M,4) xyxy in input pixels; anchors_grid (A,2) in grid
    units; hw = (h, w) of this level's grid.

    Returns (mask (B,M,A,5), cell_x, cell_y (B,M,5) i32, txy (B,M,A,5,2)
    center offset from the cell origin, twh (B,M,A,5,2) wh in grid units).
    """
    h, w = hw
    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) * 0.5
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) * 0.5
    gw = gt_boxes[..., 2] - gt_boxes[..., 0]
    gh = gt_boxes[..., 3] - gt_boxes[..., 1]
    gxy = jnp.stack([cx, cy], -1)                      # (B, M, 2) px
    gwh = jnp.stack([gw, gh], -1)

    # anchor ratio filter (B, M, A)
    r = gwh[:, :, None, :] / anchors_grid[None, None, :, :]
    ratio_ok = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1) < ANCHOR_T
    ratio_ok = ratio_ok & gt_mask[..., None] & (gwh.min(-1) > 0)[..., None]

    # candidate cells from the ±0.5 rule (B, M, 5)
    gx, gy = gxy[..., 0], gxy[..., 1]
    fx, fy = gx % 1.0, gy % 1.0
    cand_ok = jnp.stack([
        jnp.ones_like(fx, bool),                       # center always
        (fx < G) & (gx > 1.0),                         # left
        (fy < G) & (gy > 1.0),                         # up
        (fx > 1.0 - G) & (gx < w - 1.0),               # right
        (fy > 1.0 - G) & (gy < h - 1.0),               # down
    ], axis=-1)

    # the neighbor cell is floor(center ± 0.5) along the chosen axis
    cell = jnp.floor(gxy[:, :, None, :]
                     + _OFFSETS[None, None, :, :] * G).astype(jnp.int32)
    cell_x = jnp.clip(cell[..., 0], 0, w - 1)          # (B, M, 5)
    cell_y = jnp.clip(cell[..., 1], 0, h - 1)

    mask = ratio_ok[:, :, :, None] & cand_ok[:, :, None, :]  # (B,M,A,5)
    txy = gxy[:, :, None, None, :] \
        - jnp.stack([cell_x, cell_y], -1)[:, :, None, :, :].astype(jnp.float32)
    txy = jnp.broadcast_to(txy, mask.shape + (2,))
    twh = jnp.broadcast_to(gwh[:, :, None, None, :], mask.shape + (2,))
    return mask, cell_x, cell_y, txy, twh


def detection_loss_v5(params, images, gt_boxes, gt_cls, gt_mask,
                      size: str = "n", nc: int = 80,
                      dtype=jnp.float32) -> Tuple[jnp.ndarray, Dict]:
    """Total v5 loss for a batch (same I/O contract as the v8 loss)."""
    spec = arch_spec(size, nc)
    feats = forward_features(params, images, spec, dtype)
    raws = forward_head(params, feats, spec, dtype)   # 3× (B,h,w,A*(5+nc))

    bsz, m = gt_cls.shape
    a = NUM_ANCHORS
    loss_box = 0.0
    loss_obj = 0.0
    loss_cls = 0.0
    num_pos_total = jnp.int32(0)

    for lvl, raw in enumerate(raws):
        _, h, w, _ = raw.shape
        stride = float(STRIDES[lvl])
        raw = raw.reshape(bsz, h, w, a, 5 + nc)
        anchors_grid = jnp.asarray(ANCHORS[lvl]) / stride  # (A, 2)

        # targets in this level's grid units
        gb = gt_boxes / stride
        mask, cell_x, cell_y, txy, twh_px = _level_targets(
            gb, gt_mask, anchors_grid, (h, w))
        twh = twh_px  # already grid units (gb was scaled)

        # gather predictions at positive (b, cy, cx, a)
        bidx = jnp.broadcast_to(
            jnp.arange(bsz)[:, None, None, None], mask.shape)
        aidx = jnp.broadcast_to(
            jnp.arange(a)[None, None, :, None], mask.shape)
        cxb = jnp.broadcast_to(cell_x[:, :, None, :], mask.shape)
        cyb = jnp.broadcast_to(cell_y[:, :, None, :], mask.shape)
        flat = ((bidx * h + cyb) * w + cxb) * a + aidx   # (B,M,A,5)
        preds = raw.reshape(-1, 5 + nc)[flat.reshape(-1)]  # (P, 5+nc)
        pmask = mask.reshape(-1)

        sig = jax.nn.sigmoid(preds)
        pxy = sig[:, 0:2] * 2.0 - 0.5                     # cell offset
        anch = anchors_grid[aidx.reshape(-1)]
        pwh = (sig[:, 2:4] * 2.0) ** 2 * anch
        # boxes in grid units around the assigned cell
        cellf = jnp.stack([cxb.reshape(-1), cyb.reshape(-1)],
                          -1).astype(jnp.float32)
        pred_box = jnp.concatenate(
            [pxy + cellf - pwh / 2, pxy + cellf + pwh / 2], -1)
        tcen = txy.reshape(-1, 2) + cellf
        twh_f = twh.reshape(-1, 2)
        tgt_box = jnp.concatenate([tcen - twh_f / 2, tcen + twh_f / 2], -1)

        iou = ciou(pred_box, tgt_box)                     # (P,)
        n_pos = jnp.maximum(pmask.sum(), 1)
        loss_box = loss_box + (jnp.where(pmask, 1.0 - iou, 0.0).sum()
                               / n_pos.astype(jnp.float32))

        # objectness target: detached clamped CIoU scattered into the grid
        tobj = jnp.zeros((bsz * h * w * a,), jnp.float32)
        iou_d = jax.lax.stop_gradient(jnp.clip(iou, 0.0))
        tobj = tobj.at[jnp.where(pmask, flat.reshape(-1),
                                 bsz * h * w * a)].max(
            jnp.where(pmask, iou_d, 0.0), mode="drop")
        obj_logits = raw[..., 4].reshape(-1)
        loss_obj = loss_obj + BALANCE[lvl] * optax_sigmoid_bce(
            obj_logits, tobj).mean()

        # cls BCE on positives
        if nc > 1:
            tcls = jnp.broadcast_to(gt_cls[:, :, None, None], mask.shape)
            onehot = jax.nn.one_hot(jnp.clip(tcls.reshape(-1), 0, nc - 1),
                                    nc, dtype=jnp.float32)
            bce = optax_sigmoid_bce(preds[:, 5:], onehot).sum(-1)
            loss_cls = loss_cls + (jnp.where(pmask, bce, 0.0).sum()
                                   / (n_pos.astype(jnp.float32) * nc))
        num_pos_total = num_pos_total + pmask.sum()

    total = (0.05 * loss_box + 1.0 * loss_obj
             + 0.5 * nc / 80.0 * loss_cls) * bsz
    return total, {"box": loss_box, "obj": loss_obj, "cls": loss_cls,
                   "num_fg": num_pos_total}


def make_train_step_v5(size: str = "n", nc: int = 80, lr: float = 1e-3,
                       dtype=jnp.float32, clip_norm: float = 10.0):
    """SGD-with-momentum step for the v5 objective (same contract as the
    v8 make_train_step)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, momentum, images, gt_boxes, gt_cls, gt_mask,
             lr_scale=1.0):
        def loss_fn(p):
            return detection_loss_v5(p, images, gt_boxes, gt_cls, gt_mask,
                                     size=size, nc=nc, dtype=dtype)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                             for g in jax.tree_util.tree_leaves(grads)))
        ok = jnp.isfinite(gnorm) & jnp.isfinite(loss)
        scale = jnp.where(ok, jnp.minimum(1.0, clip_norm / (gnorm + 1e-9)),
                          0.0)
        new_mom = jax.tree_util.tree_map(
            # jnp.where (not scale*g): 0*NaN is NaN, which would
            # poison the momentum forever on a skipped batch
            lambda mom, g: 0.9 * mom + jnp.where(ok, scale * g, 0.0),
            momentum, grads)
        new_params = jax.tree_util.tree_map(
            lambda p, mom: p - (lr * lr_scale) * mom, params, new_mom)
        return new_params, new_mom, loss, dict(aux, grad_norm=gnorm)

    return step


__all__ = ["detection_loss_v5", "make_train_step_v5", "init_momentum"]
