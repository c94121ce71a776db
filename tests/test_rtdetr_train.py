"""RT-DETR set-prediction training: matcher optimality vs scipy, loss
finiteness + gradient flow, descent, CLI smoke.

Mirrors the other family trainer tests (tests/test_train_seg.py etc.);
the reference has no training at all (SURVEY.md §5) — the objective is
written from the RT-DETR conventions (models/rtdetr_train.py docstring).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models import rtdetr
from roadvision_tpu.models.rtdetr_train import (giou_xyxy, hungarian_match,
                                                init_opt_rtdetr,
                                                make_train_step_rtdetr,
                                                rtdetr_loss)


# ---------------------------------------------------------------------------
# matcher
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hungarian_match_near_optimal_vs_scipy(seed):
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(seed)
    m, nq = 8, 25
    cost = rng.rand(m, nq).astype(np.float32) * 10
    mask = np.ones(m, bool)
    mask[rng.randint(0, m)] = False
    q = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(mask),
                                   eps=1e-3))
    # structure: every valid row assigned, all distinct, masked rows -1
    assert (q[mask] >= 0).all() and (q[~mask] == -1).all()
    assert len(set(q[mask])) == mask.sum()
    got = cost[mask, q[mask]].sum()
    rows, cols = linear_sum_assignment(cost[mask])
    want = cost[mask][rows, cols].sum()
    # ε-auction bound: within M·ε of the exact optimum
    assert got <= want + m * 1e-3 + 1e-5


def test_hungarian_match_prefers_cheap_pairs():
    cost = jnp.asarray([[0.0, 5.0, 5.0],
                        [5.0, 0.0, 5.0]], jnp.float32)
    q = np.asarray(hungarian_match(cost, jnp.ones(2, bool)))
    np.testing.assert_array_equal(q, [0, 1])


def test_giou_sanity():
    a = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    assert float(giou_xyxy(a, a)) == pytest.approx(1.0, abs=1e-6)
    b = jnp.asarray([2.0, 2.0, 3.0, 3.0])
    assert float(giou_xyxy(a, b)) < 0.0


# ---------------------------------------------------------------------------
# loss + step
# ---------------------------------------------------------------------------

def _tiny_batch(bs=1, hw=64, m=3, nc=5, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(bs, hw, hw, 3).astype(np.float32)
    xy = rng.uniform(4, hw - 28, (bs, m, 2))
    wh = rng.uniform(10, 22, (bs, m, 2))
    gt_boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    gt_cls = rng.randint(0, nc, (bs, m)).astype(np.int32)
    gt_mask = np.ones((bs, m), bool)
    gt_mask[:, -1] = False
    return images, gt_boxes, gt_cls, gt_mask


@pytest.fixture(scope="module")
def tiny_setup():
    params = rtdetr.init_params_rtdetr(jax.random.PRNGKey(0), nc=5)
    batch = tuple(jnp.asarray(a) for a in _tiny_batch())
    return params, batch


def test_loss_finite_components_and_grads_flow(tiny_setup):
    params, batch = tiny_setup
    loss, aux = rtdetr_loss(params, *batch, nc=5)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for k in ("cls", "l1", "giou"):
        assert np.isfinite(float(aux[k])) and float(aux[k]) > 0
    assert int(aux["num_fg"]) == 2

    grads = jax.grad(lambda p: rtdetr_loss(p, *batch, nc=5)[0])(params)

    def norm(tree):
        return sum(float(jnp.sum(g.astype(jnp.float32) ** 2))
                   for g in jax.tree_util.tree_leaves(tree))
    # deep supervision reaches the decoder heads, the encoder, AND the
    # backbone stem
    assert norm(grads["dec"]["dec_score"]) > 0
    assert norm(grads["dec"]["dec_bbox"]) > 0
    assert norm(grads["enc"]) > 0
    assert norm(grads["backbone"]["stem"]) > 0


@pytest.fixture(scope="module")
def step5():
    return make_train_step_rtdetr(nc=5, lr=2e-4)


def test_train_step_reduces_loss(tiny_setup, step5):
    params, batch = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, params)  # donated below
    mom = init_opt_rtdetr(params)
    losses = []
    for _ in range(6):
        params, mom, loss, aux = step5(params, mom, *batch)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_nan_batch_does_not_poison_momentum(tiny_setup, step5):
    """A NaN batch must be SKIPPED: params/momentum stay finite and the
    next good batch still trains (0·NaN = NaN would otherwise stick in
    the momentum forever)."""
    params, batch = tiny_setup
    params = jax.tree_util.tree_map(jnp.array, params)
    mom = init_opt_rtdetr(params)
    bad = (jnp.full_like(batch[0], jnp.nan),) + batch[1:]
    params, mom, loss, _ = step5(params, mom, *bad)
    assert not np.isfinite(float(loss))          # the batch WAS bad
    for leaf in jax.tree_util.tree_leaves(params):
        assert bool(jnp.isfinite(leaf).all())
    for leaf in jax.tree_util.tree_leaves(mom):
        assert bool(jnp.isfinite(leaf).all())
    params, mom, loss, _ = step5(params, mom, *batch)
    assert np.isfinite(float(loss))              # training continues


def test_sharded_train_step_matches_unsharded():
    """dp=4 x tp=2 rtdetr train step vs the single-device step on the
    SAME batch (VERDICT r4 weak #5): set-prediction losses — per-sample
    Hungarian matching inside vmap — are exactly the shape GSPMD can
    silently de-partition or badly replicate; holding the sharded step
    to numerical equivalence proves the partitioning is sound. AdamW
    moments must agree too (same optimizer trajectory)."""
    import jax.tree_util as jtu
    from roadvision_tpu.parallel import (batch_sharding, make_mesh,
                                         param_shardings, shard_pytree)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = tuple(jnp.asarray(a) for a in _tiny_batch(bs=4, seed=4))
    step = make_train_step_rtdetr(nc=5, lr=2e-4)

    p0 = rtdetr.init_params_rtdetr(jax.random.PRNGKey(11), nc=5)
    o0 = init_opt_rtdetr(p0)
    p1, o1, loss1, aux1 = step(p0, o0, *batch)

    mesh = make_mesh(8, model_parallel=2)
    ps = shard_pytree(rtdetr.init_params_rtdetr(jax.random.PRNGKey(11),
                                                nc=5),
                      param_shardings(
                          rtdetr.init_params_rtdetr(jax.random.PRNGKey(11),
                                                    nc=5), mesh))
    os_ = init_opt_rtdetr(ps)
    os_ = shard_pytree(os_, param_shardings(os_, mesh))
    imgs = jax.device_put(batch[0], batch_sharding(mesh, 4))
    p2, o2, loss2, aux2 = step(ps, os_, imgs, *batch[1:])

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    for (k1, a), (k2, b) in zip(jtu.tree_leaves_with_path(p1),
                                jtu.tree_leaves_with_path(p2)):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jtu.keystr(k1))
    for (k1, a), (k2, b) in zip(jtu.tree_leaves_with_path(o1["m"]),
                                jtu.tree_leaves_with_path(o2["m"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jtu.keystr(k1))


def test_train_cli_smoke(tmp_path):
    from tools.train import main as train_main
    out = tmp_path / "rt.npz"
    rc = train_main(["--data", "synthetic", "--steps", "2",
                     "--imgsz", "96", "--batch", "1", "--nc", "5",
                     "--weights", "rtdetr-l.missing.pt",
                     "--out", str(out), "--log-every", "1"])
    assert rc == 0
    assert out.exists() and out.with_suffix(".weights.npz").exists()
    # the exported deploy weights load back through the rtdetr loader
    params, nc, loaded = rtdetr.load_params_rtdetr(
        str(out.with_suffix(".weights.npz")))
    assert loaded and nc == 5
