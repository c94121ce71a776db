"""YOLOv8-OBB training objective: finiteness, gradient flow through the
angle branch, loss descent, rotated assignment geometry, rotated mAP,
dataset generator, CLI smoke.

Mirrors the seg/pose-trainer tests for the rotated-box family
(models/yolo/train_obb.py — the reference has no training at all,
SURVEY.md §5).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo.train import init_momentum
from roadvision_tpu.models.yolo.train_obb import (make_train_step_obb,
                                                  obb_loss, rotated_inside,
                                                  task_aligned_assign_rotated)
from roadvision_tpu.models.yolo.yolov8_obb import init_params_obb


def _tiny_obb_batch(bs=2, hw=64, m=3, seed=0, nc=15):
    rng = np.random.RandomState(seed)
    images = rng.rand(bs, hw, hw, 3).astype(np.float32)
    rb = np.zeros((bs, m, 5), np.float32)
    rb[..., :2] = rng.uniform(16, hw - 16, (bs, m, 2))
    rb[..., 2] = rng.uniform(18, 28, (bs, m))
    rb[..., 3] = rng.uniform(8, 14, (bs, m))
    rb[..., 4] = rng.uniform(-np.pi / 4, 3 * np.pi / 4, (bs, m))
    gt_cls = rng.randint(0, nc, (bs, m)).astype(np.int32)
    gt_mask = np.ones((bs, m), bool)
    gt_mask[:, -1] = False
    return images, rb, gt_cls, gt_mask


def test_rotated_inside_geometry():
    """The candidate gate rotates anchors into the box frame: a point
    inside the unrotated extent leaves it after 90° rotation of a
    non-square box, and vice versa."""
    anchors = jnp.asarray([[30.0, 20.0],    # on the long axis, x offset
                           [20.0, 29.0]])   # on the short axis... outside
    # box at (20, 20), w=24 (x extent ±12), h=6 (y extent ±3), θ=0
    rb0 = jnp.asarray([[[20.0, 20.0, 24.0, 6.0, 0.0]]])
    rb90 = rb0.at[..., 4].set(jnp.pi / 2)
    mask = jnp.ones((1, 1), bool)
    in0 = np.asarray(rotated_inside(anchors, rb0, mask))[0, 0]
    in90 = np.asarray(rotated_inside(anchors, rb90, mask))[0, 0]
    assert in0.tolist() == [True, False]    # (30,20): |dx|=10<12, |dy|=0<3
    assert in90.tolist() == [False, True]   # rotated: extents swap


def test_rotated_assign_picks_matching_angle():
    """With two gts at the same center but perpendicular angles, an
    elongated prediction is assigned to the gt whose angle it matches
    (ProbIoU drives the alignment metric)."""
    n, nc = 4, 3
    anchors = jnp.asarray([[20.0, 20.0], [60.0, 60.0],
                           [40.0, 40.0], [10.0, 50.0]])
    pred_rb = jnp.zeros((1, n, 5)).at[0, 0].set(
        jnp.asarray([20.0, 20.0, 30.0, 8.0, 0.0]))
    scores = jnp.full((1, n, nc), 0.9)
    gt_rb = jnp.asarray([[[20.0, 20.0, 30.0, 8.0, 0.0],
                          [20.0, 20.0, 30.0, 8.0, np.pi / 2]]])
    gt_cls = jnp.asarray([[1, 2]], jnp.int32)
    gt_mask = jnp.ones((1, 2), bool)
    fg, tgt, tscores, trb = task_aligned_assign_rotated(
        scores, pred_rb, anchors, gt_rb, gt_cls, gt_mask)
    assert bool(fg[0, 0])
    assert int(tgt[0, 0]) == 0              # the aligned-angle gt wins
    assert float(trb[0, 0, 4]) == 0.0


def test_obb_loss_finite_and_angle_grads_flow():
    params = init_params_obb(jax.random.PRNGKey(0), "n", nc=15)
    batch = _tiny_obb_batch()
    loss, aux = obb_loss(params, *(jnp.asarray(a) for a in batch))
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("box", "cls", "dfl"):
        assert k in aux and np.isfinite(float(aux[k]))
    assert int(aux["num_fg"]) > 0

    # gradients reach the obb-only subtree (cv4 angle branch)
    grads = jax.grad(lambda p: obb_loss(
        p, *(jnp.asarray(a) for a in batch))[0])(params)
    cv4_norm = sum(float(jnp.sum(g * g)) for g in
                   jax.tree_util.tree_leaves(grads["22"]["cv4"]))
    assert cv4_norm > 0


def test_obb_train_step_reduces_loss():
    params = init_params_obb(jax.random.PRNGKey(0), "n", nc=15)
    mom = init_momentum(params)
    step = make_train_step_obb("n", nc=15, lr=5e-4)
    args = tuple(jnp.asarray(a) for a in _tiny_obb_batch())
    losses = []
    for _ in range(4):
        params, mom, loss, aux = step(params, mom, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_box_term_prefers_correct_angle():
    """After brief training toward the true rboxes, the box term is
    clearly lower for the true angles than for perpendicular ones —
    the angle branch's gradient path (ProbIoU) measures orientation."""
    params = init_params_obb(jax.random.PRNGKey(3), "n", nc=15)
    images, rb, gt_cls, gt_mask = _tiny_obb_batch(seed=5)
    step = make_train_step_obb("n", nc=15, lr=2e-3)
    mom = init_momentum(params)
    args = tuple(jnp.asarray(a) for a in (images, rb, gt_cls, gt_mask))
    for _ in range(6):
        params, mom, _, _ = step(params, mom, *args)
    _, aux_t = obb_loss(params, *args)
    wrong = rb.copy()
    wrong[..., 4] += np.pi / 2      # rotate every gt 90°
    _, aux_w = obb_loss(params, jnp.asarray(images), jnp.asarray(wrong),
                        jnp.asarray(gt_cls), jnp.asarray(gt_mask))
    assert float(aux_t["box"]) < float(aux_w["box"])


def test_synthetic_obb_batches_shapes():
    from roadvision_tpu.detect.dataset import synthetic_obb_batches
    from roadvision_tpu.ops.obb import rbox_to_aabb

    it = synthetic_obb_batches(2, imgsz=96, max_boxes=4, num_objects=2)
    imgs, rboxes, cls, valid = next(it)
    assert imgs.shape == (2, 96, 96, 3) and imgs.dtype == np.uint8
    assert rboxes.shape == (2, 4, 5)
    assert (cls[valid] == 9).all()
    assert valid.sum() == 4                  # 2 objects × 2 images
    th = rboxes[valid][:, 4]
    assert (th >= -np.pi / 4).all() and (th < 3 * np.pi / 4).all()
    # elongated (angle observable) and inside the frame
    assert (rboxes[valid][:, 2] > rboxes[valid][:, 3]).all()
    ab = np.asarray(rbox_to_aabb(jnp.asarray(rboxes[valid])))
    assert (ab[:, :2] >= 0).all() and (ab[:, 2:] <= 96).all()
    # drawn evidence: bright body pixels exist
    assert (imgs >= 150).any()


def test_evaluate_obb_perfect_predictions():
    """A stub detector echoing the ground truth scores rbox_mAP 1.0;
    shuffled angles score lower."""
    from roadvision_tpu.detect.eval import (average_precision_rboxes,
                                            evaluate_obb, rbox_iou_matrix)

    rng = np.random.RandomState(7)
    n_img, m = 3, 4
    gt_rb = np.zeros((n_img, m, 5), np.float32)
    gt_rb[..., :2] = rng.uniform(20, 80, (n_img, m, 2))
    gt_rb[..., 2] = rng.uniform(18, 26, (n_img, m))
    gt_rb[..., 3] = rng.uniform(6, 10, (n_img, m))
    gt_rb[..., 4] = rng.uniform(-np.pi / 4, 3 * np.pi / 4, (n_img, m))
    gt_cls = np.full((n_img, m), 9, np.int32)
    gt_mask = np.ones((n_img, m), bool)

    # self-similarity is ~1, permuted-angle similarity is lower
    sim = rbox_iou_matrix(gt_rb[0], gt_rb[0])
    assert (np.diag(sim) > 0.99).all()

    ap = average_precision_rboxes(
        [gt_rb[i] for i in range(n_img)],
        [np.linspace(0.9, 0.5, m)] * n_img,
        [gt_rb[i] for i in range(n_img)])
    assert ap == pytest.approx(1.0, abs=1e-6)

    class _Stub:
        class _B:
            pass

        def infer_batch(self, bgr):
            i = _Stub.calls
            _Stub.calls += 1
            b = _Stub._B()
            b.rboxes = gt_rb[i][None]
            b.conf = np.linspace(0.9, 0.5, m, dtype=np.float32)[None]
            b.cls_id = gt_cls[i][None]
            b.valid = gt_mask[i][None]
            return b
        calls = 0

    score = evaluate_obb(_Stub(), np.zeros((n_img, 96, 96, 3), np.uint8),
                         gt_rb, gt_cls, gt_mask)
    assert score["rbox_mAP@0.5"] == pytest.approx(1.0, abs=1e-6)


def test_train_cli_obb_smoke(tmp_path):
    from tools.train import main as train_main

    out = tmp_path / "obb_run.npz"
    rc = train_main(["--data", "synthetic", "--steps", "2",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "none-obb.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    saved = np.load(out.with_suffix(".weights.npz"))
    assert any(".cv4." in k for k in saved)
    assert not any(".proto." in k for k in saved)
