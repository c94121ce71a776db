"""YOLOv8-seg training objective: finiteness, gradient flow through the
mask term, loss descent, dataset generator, CLI smoke.

Mirrors the detect-trainer tests (tests/test_train_parallel.py) for the
segment family (models/yolo/train_seg.py — the reference has no training
at all, SURVEY.md §5).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo.train import init_momentum
from roadvision_tpu.models.yolo.train_seg import (make_train_step_seg,
                                                  segmentation_loss)
from roadvision_tpu.models.yolo.yolov8_seg import init_params_seg


def _tiny_seg_batch(bs=2, hw=64, m=3, nc=80, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(bs, hw, hw, 3).astype(np.float32)
    boxes = []
    for _ in range(bs):
        xy = rng.uniform(5, hw - 30, (m, 2))
        wh = rng.uniform(12, 24, (m, 2))
        boxes.append(np.concatenate([xy, xy + wh], -1))
    gt_boxes = np.stack(boxes).astype(np.float32)
    gt_cls = rng.randint(0, nc, (bs, m)).astype(np.int32)
    gt_mask = np.ones((bs, m), bool)
    gt_mask[:, -1] = False
    # instance masks at proto res: filled gt-box interiors
    m4 = hw // 4
    gmasks = np.zeros((bs, m, m4, m4), np.float32)
    for b in range(bs):
        for j in range(m):
            x1, y1, x2, y2 = (gt_boxes[b, j] / 4).astype(int)
            gmasks[b, j, y1:y2, x1:x2] = 1.0
    return images, gt_boxes, gt_cls, gt_mask, gmasks


def test_seg_loss_finite_and_mask_grads_flow():
    params = init_params_seg(jax.random.PRNGKey(0), "n")
    batch = _tiny_seg_batch()
    loss, aux = segmentation_loss(params, *(jnp.asarray(a) for a in batch))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "mask" in aux and np.isfinite(float(aux["mask"]))
    assert int(aux["num_fg"]) > 0

    # gradients reach the seg-only subtrees (cv4 + proto)
    grads = jax.grad(lambda p: segmentation_loss(
        p, *(jnp.asarray(a) for a in batch))[0])(params)
    cv4_norm = sum(float(jnp.sum(g * g)) for g in
                   jax.tree_util.tree_leaves(grads["22"]["cv4"]))
    proto_norm = sum(float(jnp.sum(g * g)) for g in
                     jax.tree_util.tree_leaves(grads["22"]["proto"]))
    assert cv4_norm > 0 and proto_norm > 0


def test_seg_train_step_reduces_loss():
    params = init_params_seg(jax.random.PRNGKey(0), "n")
    mom = init_momentum(params)
    step = make_train_step_seg("n", lr=5e-4)
    args = tuple(jnp.asarray(a) for a in _tiny_seg_batch())
    losses = []
    for _ in range(4):
        params, mom, loss, aux = step(params, mom, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_mask_term_prefers_correct_masks():
    """The mask loss is lower when gt masks match what the (stop-grad)
    assignment crops — sanity that the term measures mask agreement,
    not noise: compare against inverted gt masks."""
    params = init_params_seg(jax.random.PRNGKey(3), "n")
    images, gt_boxes, gt_cls, gt_mask, gmasks = _tiny_seg_batch(seed=5)
    args = (jnp.asarray(images), jnp.asarray(gt_boxes),
            jnp.asarray(gt_cls), jnp.asarray(gt_mask))
    _, aux_good = segmentation_loss(params, *args, jnp.asarray(gmasks))
    # random init predicts ~0.5 everywhere: good and inverted masks give
    # nearly equal BCE; instead train briefly toward the true masks,
    # then the true-mask loss must be clearly lower than inverted
    step = make_train_step_seg("n", lr=2e-3)
    mom = init_momentum(params)
    for _ in range(6):
        params, mom, _, _ = step(params, mom, *args, jnp.asarray(gmasks))
    _, aux_t = segmentation_loss(params, *args, jnp.asarray(gmasks))
    _, aux_inv = segmentation_loss(params, *args,
                                   jnp.asarray(1.0 - gmasks))
    assert float(aux_t["mask"]) < float(aux_inv["mask"])
    assert float(aux_t["mask"]) < float(aux_good["mask"])


def test_synthetic_seg_batches_shapes():
    from roadvision_tpu.detect.dataset import synthetic_seg_batches

    it = synthetic_seg_batches(2, imgsz=96, max_boxes=6)
    imgs, boxes, cls, valid, masks = next(it)
    assert imgs.shape == (2, 96, 96, 3) and imgs.dtype == np.uint8
    assert masks.shape == (2, 6, 24, 24)
    # each valid instance's mask lives inside its box (proto coords)
    for b in range(2):
        for m in range(6):
            if not valid[b, m]:
                assert masks[b, m].sum() == 0
                continue
            ys, xs = np.nonzero(masks[b, m])
            if len(ys) == 0:
                continue
            x1, y1, x2, y2 = boxes[b, m] / 4
            assert xs.min() >= np.floor(x1) - 1
            assert xs.max() <= np.ceil(x2) + 1
            assert ys.min() >= np.floor(y1) - 1
            assert ys.max() <= np.ceil(y2) + 1
            # ellipse, not the full box: some interior corner pixels off
            assert masks[b, m].sum() < (x2 - x1 + 2) * (y2 - y1 + 2)


def test_train_cli_seg_smoke(tmp_path):
    from tools.train import main as train_main

    out = tmp_path / "seg_run.npz"
    rc = train_main(["--data", "synthetic", "--steps", "2",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "none-seg.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    saved = np.load(out.with_suffix(".weights.npz"))
    assert any(".cv4." in k or ".proto." in k for k in saved)
