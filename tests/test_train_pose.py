"""YOLOv8-pose training objective: finiteness, gradient flow through the
keypoint terms, loss descent, dataset generator, CLI smoke.

Mirrors the seg-trainer tests (tests/test_train_seg.py) for the pose
family (models/yolo/train_pose.py — the reference has no training at
all, SURVEY.md §5).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo.train import init_momentum
from roadvision_tpu.models.yolo.train_pose import (make_train_step_pose,
                                                   pose_loss)
from roadvision_tpu.models.yolo.yolov8_pose import init_params_pose


def _tiny_pose_batch(bs=2, hw=64, m=3, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(bs, hw, hw, 3).astype(np.float32)
    boxes, kpts = [], []
    for _ in range(bs):
        xy = rng.uniform(5, hw - 30, (m, 2))
        wh = rng.uniform(14, 24, (m, 2))
        b = np.concatenate([xy, xy + wh], -1)
        boxes.append(b)
        # keypoints spread inside each box, two joints unlabelled
        kk = np.zeros((m, 17, 3), np.float32)
        u = rng.uniform(0.1, 0.9, (m, 17, 2))
        kk[..., 0] = b[:, None, 0] + u[..., 0] * wh[:, None, 0]
        kk[..., 1] = b[:, None, 1] + u[..., 1] * wh[:, None, 1]
        kk[..., 2] = 1.0
        kk[:, [3, 11], 2] = 0.0
        kpts.append(kk)
    gt_boxes = np.stack(boxes).astype(np.float32)
    gt_cls = np.zeros((bs, m), np.int32)
    gt_mask = np.ones((bs, m), bool)
    gt_mask[:, -1] = False
    return images, gt_boxes, gt_cls, gt_mask, np.stack(kpts)


def test_pose_loss_finite_and_kpt_grads_flow():
    params = init_params_pose(jax.random.PRNGKey(0), "n", nc=1)
    batch = _tiny_pose_batch()
    loss, aux = pose_loss(params, *(jnp.asarray(a) for a in batch))
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("pose", "kobj"):
        assert k in aux and np.isfinite(float(aux[k]))
    assert int(aux["num_fg"]) > 0

    # gradients reach the pose-only subtree (cv4)
    grads = jax.grad(lambda p: pose_loss(
        p, *(jnp.asarray(a) for a in batch))[0])(params)
    cv4_norm = sum(float(jnp.sum(g * g)) for g in
                   jax.tree_util.tree_leaves(grads["22"]["cv4"]))
    assert cv4_norm > 0


def test_pose_train_step_reduces_loss():
    params = init_params_pose(jax.random.PRNGKey(0), "n", nc=1)
    mom = init_momentum(params)
    step = make_train_step_pose("n", nc=1, lr=5e-4)
    args = tuple(jnp.asarray(a) for a in _tiny_pose_batch())
    losses = []
    for _ in range(4):
        params, mom, loss, aux = step(params, mom, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_pose_term_prefers_correct_keypoints():
    """After brief training toward the true keypoints, the pose term is
    clearly lower for the true layout than for a shuffled one — sanity
    that the term measures keypoint agreement, not noise."""
    params = init_params_pose(jax.random.PRNGKey(3), "n", nc=1)
    images, gt_boxes, gt_cls, gt_mask, kpts = _tiny_pose_batch(seed=5)
    args = (jnp.asarray(images), jnp.asarray(gt_boxes),
            jnp.asarray(gt_cls), jnp.asarray(gt_mask))
    step = make_train_step_pose("n", nc=1, lr=2e-3)
    mom = init_momentum(params)
    for _ in range(6):
        params, mom, _, _ = step(params, mom, *args, jnp.asarray(kpts))
    _, aux_t = pose_loss(params, *args, jnp.asarray(kpts))
    wrong = kpts.copy()
    wrong[..., :2] = kpts[..., ::-1, :2]   # reverse the joint order
    _, aux_w = pose_loss(params, *args, jnp.asarray(wrong))
    assert float(aux_t["pose"]) < float(aux_w["pose"])


def test_unlabelled_joints_do_not_contribute():
    """Moving an unlabelled (v=0) joint's coordinates must not change
    the pose term."""
    params = init_params_pose(jax.random.PRNGKey(1), "n", nc=1)
    images, gt_boxes, gt_cls, gt_mask, kpts = _tiny_pose_batch(seed=2)
    args = (jnp.asarray(images), jnp.asarray(gt_boxes),
            jnp.asarray(gt_cls), jnp.asarray(gt_mask))
    _, aux1 = pose_loss(params, *args, jnp.asarray(kpts))
    moved = kpts.copy()
    moved[:, :, 3, :2] += 500.0   # joint 3 is unlabelled in the batch
    _, aux2 = pose_loss(params, *args, jnp.asarray(moved))
    np.testing.assert_allclose(float(aux1["pose"]), float(aux2["pose"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(aux1["kobj"]), float(aux2["kobj"]),
                               rtol=1e-6)


def test_synthetic_pose_batches_shapes():
    from roadvision_tpu.detect.dataset import synthetic_pose_batches

    it = synthetic_pose_batches(2, imgsz=96, max_boxes=4, num_people=2)
    imgs, boxes, cls, valid, kpts = next(it)
    assert imgs.shape == (2, 96, 96, 3) and imgs.dtype == np.uint8
    assert kpts.shape == (2, 4, 17, 3)
    assert (cls == 0).all()
    for b in range(2):
        for m in range(4):
            if not valid[b, m]:
                assert kpts[b, m].sum() == 0
                continue
            x1, y1, x2, y2 = boxes[b, m]
            lab = kpts[b, m, :, 2] > 0
            assert lab.sum() == 15   # 2 joints dropped per figure
            assert (kpts[b, m, lab, 0] >= x1 - 3).all()
            assert (kpts[b, m, lab, 0] <= x2 + 3).all()
            assert (kpts[b, m, lab, 1] >= y1 - 3).all()
            assert (kpts[b, m, lab, 1] <= y2 + 3).all()
    # drawn evidence: white joint markers exist
    assert (imgs == 255).any()


def test_train_cli_pose_smoke(tmp_path):
    from tools.train import main as train_main

    out = tmp_path / "pose_run.npz"
    rc = train_main(["--data", "synthetic", "--steps", "2",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "none-pose.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    saved = np.load(out.with_suffix(".weights.npz"))
    assert any(".cv4." in k for k in saved)
    assert not any(".proto." in k for k in saved)
