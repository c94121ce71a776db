"""Checkpoint round-trip + AP metric sanity."""
import numpy as np
import pytest

import jax

from roadvision_tpu.detect.eval import (average_precision, match_report,
                                        mean_ap)
from roadvision_tpu.models.yolo import init_params
from roadvision_tpu.models.yolo.train import init_momentum
from roadvision_tpu.runtime.checkpoint import (load_train_state,
                                               save_train_state)


def test_train_state_npz_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0), "n")
    momentum = init_momentum(params)
    path = save_train_state(str(tmp_path / "state.npz"), params, momentum, 42)
    p2, m2, step = load_train_state(path)
    assert step == 42
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))


def test_ap_perfect_predictions():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    ap = average_precision(gt, [np.array([0.9, 0.8])], gt, 0.5)
    assert ap > 0.99


def test_ap_half_recall():
    gt = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)]
    preds = [np.array([[0, 0, 10, 10]], float)]
    ap = average_precision(preds, [np.array([0.9])], gt, 0.5)
    assert 0.4 < ap < 0.6


def test_ap_false_positives_hurt():
    gt = [np.array([[0, 0, 10, 10]], float)]
    # one hit at lower conf + one high-conf miss
    preds = [np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)]
    ap_fp_first = average_precision(preds, [np.array([0.5, 0.9])], gt, 0.5)
    ap_tp_first = average_precision(preds, [np.array([0.9, 0.5])], gt, 0.5)
    assert ap_tp_first > ap_fp_first


def test_mean_ap_multiclass():
    gt = [np.array([[0, 0, 10, 10]], float)]
    res = mean_ap({2: (gt, [np.array([0.9])]),
                   7: ([np.zeros((0, 4))], [np.zeros((0,))])},
                  {2: gt, 7: [np.array([[5, 5, 9, 9]], float)]},
                  iou_thresholds=(0.5, 0.75))
    assert res["mAP@0.5"] == pytest.approx(0.5, abs=0.01)  # class2=1, class7=0


def test_match_report():
    pred = np.array([[0, 0, 10, 10], [100, 0, 110, 10]], float)
    gt = np.array([[1, 1, 10, 10]], float)
    rep = match_report(pred, gt, 0.5)
    assert rep["matched"] == 1 and rep["recall"] == 1.0
    assert rep["precision"] == 0.5


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Save a tensor-parallel-sharded training state, restore it directly
    onto the mesh shardings (orbax sharded restore + npz fallback)."""
    import jax
    import jax.numpy as jnp
    from roadvision_tpu.models.yolo import init_params
    from roadvision_tpu.models.yolo.train import init_momentum
    from roadvision_tpu.parallel import (make_mesh, param_shardings,
                                         shard_pytree)

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    params = init_params(jax.random.PRNGKey(0), "n")
    pshard = param_shardings(params, mesh)
    params = shard_pytree(params, pshard)
    momentum = shard_pytree(init_momentum(params), pshard)

    for name in ("orbax_ckpt", "state.npz"):
        path = save_train_state(str(tmp_path / name), params, momentum, 7)
        p2, m2, step = load_train_state(path, shardings=pshard)
        assert step == 7
        flat1 = jax.tree_util.tree_leaves(params)
        flat2 = jax.tree_util.tree_leaves(p2)
        assert len(flat1) == len(flat2)
        for a, b in zip(flat1, flat2):
            assert a.sharding.is_equivalent_to(b.sharding, a.ndim), \
                (a.sharding, b.sharding)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # at least one leaf is genuinely sharded across the model axis
        assert any(len(leaf.sharding.device_set) > 1
                   for leaf in jax.tree_util.tree_leaves(p2))
