"""Training loss/assigner sanity + multi-chip sharded train step on the
virtual 8-device CPU mesh (SURVEY.md §4: no real cluster needed)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import init_params
from roadvision_tpu.models.yolo.train import (ciou, detection_loss,
                                              init_momentum, make_train_step,
                                              task_aligned_assign)
from roadvision_tpu.parallel import (batch_sharding, make_mesh,
                                     param_shardings, shard_pytree)


def test_ciou_identical_boxes_is_one():
    b = jnp.asarray([[10.0, 10, 50, 60]])
    np.testing.assert_allclose(np.asarray(ciou(b, b)), [1.0], atol=1e-5)


def test_ciou_disjoint_negative():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[100.0, 100, 110, 110]])
    assert float(ciou(a, b)[0]) < 0


def test_assigner_assigns_obvious_anchor():
    # one gt box; anchors on a grid; the inside anchors with high cls score
    # must be foreground for that gt
    n, nc = 16, 3
    xs = (jnp.arange(4) + 0.5) * 10
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
    anchors = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (16,2)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 22.0, 22.0]]])          # covers 4 anchors
    gt_cls = jnp.asarray([[1]], jnp.int32)
    gt_mask = jnp.asarray([[True]])
    scores = jnp.full((1, n, nc), 0.5)
    pred = jnp.tile(jnp.asarray([[8.0, 8.0, 22.0, 22.0]]), (n, 1))[None]
    fg, tgt, tscores, tboxes = task_aligned_assign(
        scores, pred, anchors, gt_boxes, gt_cls, gt_mask)
    fg = np.asarray(fg)[0]
    inside = [(float(anchors[i, 0]) > 8 and float(anchors[i, 0]) < 22
               and float(anchors[i, 1]) > 8 and float(anchors[i, 1]) < 22)
              for i in range(n)]
    assert (fg == np.asarray(inside)).all()
    ts = np.asarray(tscores)[0]
    assert (ts[fg][:, 1] > 0).all() and (ts[:, 0] == 0).all()


def test_assigner_empty_gt_no_fg():
    anchors = jnp.asarray([[5.0, 5.0]])
    fg, *_ = task_aligned_assign(
        jnp.full((1, 1, 2), 0.5), jnp.zeros((1, 1, 4)), anchors,
        jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 2), bool))
    assert not bool(fg.any())


def _tiny_batch(bs=2, hw=64, m=3, nc=80, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(bs, hw, hw, 3).astype(np.float32)
    boxes = []
    for _ in range(bs):
        xy = rng.uniform(5, hw - 25, (m, 2))
        wh = rng.uniform(8, 20, (m, 2))
        boxes.append(np.concatenate([xy, xy + wh], -1))
    gt_boxes = np.stack(boxes).astype(np.float32)
    gt_cls = rng.randint(0, nc, (bs, m)).astype(np.int32)
    gt_mask = np.ones((bs, m), bool)
    gt_mask[:, -1] = False  # exercise padding
    return images, gt_boxes, gt_cls, gt_mask


def test_detection_loss_finite_and_grad_flows():
    params = init_params(jax.random.PRNGKey(0), "n")
    images, gt_boxes, gt_cls, gt_mask = _tiny_batch()
    loss, aux = detection_loss(params, jnp.asarray(images),
                               jnp.asarray(gt_boxes), jnp.asarray(gt_cls),
                               jnp.asarray(gt_mask))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert int(aux["num_fg"]) > 0

    grads = jax.grad(lambda p: detection_loss(
        p, jnp.asarray(images), jnp.asarray(gt_boxes), jnp.asarray(gt_cls),
        jnp.asarray(gt_mask))[0])(params)
    gnorm = sum(float(jnp.sum(g * g))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_train_step_reduces_loss():
    params = init_params(jax.random.PRNGKey(0), "n")
    mom = init_momentum(params)
    step = make_train_step("n", lr=5e-4)
    images, gt_boxes, gt_cls, gt_mask = _tiny_batch()
    args = (jnp.asarray(images), jnp.asarray(gt_boxes),
            jnp.asarray(gt_cls), jnp.asarray(gt_mask))
    losses = []
    for _ in range(4):
        params, mom, loss, _aux = step(params, mom, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_multichip_mesh_train_step():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params = init_params(jax.random.PRNGKey(0), "n")
    pshard = param_shardings(params, mesh)
    params = shard_pytree(params, pshard)
    mom = shard_pytree(init_momentum(params), pshard)

    images, gt_boxes, gt_cls, gt_mask = _tiny_batch(bs=4)
    bsh = batch_sharding(mesh, 4)
    images = jax.device_put(jnp.asarray(images), bsh)

    step = make_train_step("n", lr=1e-3)
    params2, mom2, loss, aux = step(params, mom, images,
                                    jnp.asarray(gt_boxes),
                                    jnp.asarray(gt_cls),
                                    jnp.asarray(gt_mask))
    assert np.isfinite(float(loss))
    # params keep their tensor-parallel sharding through the step
    w21 = params2["21"]["cv2"]["w"]
    assert not w21.sharding.is_fully_replicated


def test_batch_parallel_inference_matches_single_device():
    from roadvision_tpu.models.yolo import forward
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = init_params(jax.random.PRNGKey(1), "n")
    x = jnp.asarray(np.random.RandomState(0).rand(8, 64, 64, 3), jnp.float32)
    b1, s1 = forward(params, x, size="n")
    mesh = make_mesh(8, model_parallel=1)
    xd = jax.device_put(x, batch_sharding(mesh, 4))
    b2, s2 = forward(params, xd, size="n")
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_multichip_train_step_matches_unsharded():
    """dp=4 x tp=2 sharded step vs the plain single-device step on the
    SAME batch: loss and every updated parameter must agree to fp32
    reduction-order tolerance (VERDICT r2 next-step #3 — training held
    to the same equivalence bar as tests/test_sharded_inference.py)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    images, gt_boxes, gt_cls, gt_mask = _tiny_batch(bs=4, seed=3)
    args = (jnp.asarray(gt_boxes), jnp.asarray(gt_cls), jnp.asarray(gt_mask))
    step = make_train_step("n", lr=1e-3)

    # unsharded: everything on the default single device
    p0 = init_params(jax.random.PRNGKey(2), "n")
    m0 = init_momentum(p0)
    p1, m1, loss1, aux1 = step(p0, m0, jnp.asarray(images), *args)

    # sharded: params tensor-parallel over 'model', batch over 'data'
    mesh = make_mesh(8, model_parallel=2)
    pshard = param_shardings(p0, mesh)
    ps = shard_pytree(init_params(jax.random.PRNGKey(2), "n"), pshard)
    ms = shard_pytree(init_momentum(ps), pshard)
    imgs = jax.device_put(jnp.asarray(images), batch_sharding(mesh, 4))
    p2, m2, loss2, aux2 = step(ps, ms, imgs, *args)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    assert int(aux1["num_fg"]) == int(aux2["num_fg"])
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = jax.tree_util.tree_leaves_with_path(p2)
    assert len(flat1) == len(flat2)
    for (k1, a), (k2, b) in zip(flat1, flat2):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(k1))
    # momentum buffers agree too (same optimizer state trajectory)
    for (k1, a), (k2, b) in zip(jax.tree_util.tree_leaves_with_path(m1),
                                jax.tree_util.tree_leaves_with_path(m2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(k1))
