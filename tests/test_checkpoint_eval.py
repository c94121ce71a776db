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


def test_engine_state_checkpoint_resume_exact(tmp_path):
    """save_state/load_state: a stream split across two engine processes
    produces the SAME detections (ids, boxes, distances) as an
    uninterrupted run — the inference analog of train --resume."""
    import numpy as np

    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt", "imgsz": 96,
                   "max_det": 6, "conf_thres": 1e-4, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True},
        "geometry": {"enabled": False},
    }
    rng = np.random.default_rng(3)
    frames = np.asarray(rng.integers(0, 255, (6, 72, 96, 3)), np.uint8)
    ts = 100.0 + np.arange(6) / 30.0     # non-zero epoch: t0 must persist

    ref = PipelineEngine(cfg)
    ref_out = []
    for i in range(3):
        ref_out.append(ref.process_batch(frames[2 * i:2 * i + 2],
                                         ts[2 * i:2 * i + 2]))

    a = PipelineEngine(cfg)
    a.process_batch(frames[0:2], ts[0:2])
    a.process_batch(frames[2:4], ts[2:4])
    state_path = tmp_path / "stream.npz"
    a.save_state(state_path)

    b = PipelineEngine(cfg)      # "new process"
    b.load_state(state_path)
    got = b.process_batch(frames[4:6], ts[4:6])

    for r_ref, r_got in zip(ref_out[2], got):
        ids_ref = [(d.track_id, round(d.x1, 4), round(d.y2, 4),
                    round(d.conf, 5)) for d in r_ref.detections]
        ids_got = [(d.track_id, round(d.x1, 4), round(d.y2, 4),
                    round(d.conf, 5)) for d in r_got.detections]
        assert ids_ref == ids_got and ids_ref


def test_engine_state_slot_mismatch_rejected(tmp_path):
    import numpy as np

    from roadvision_tpu.runtime.engine import PipelineEngine

    base = {
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt", "imgsz": 96,
                   "max_det": 4, "conf_thres": 1e-4, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True},
        "geometry": {"enabled": False},
    }
    a = PipelineEngine({**base, "tpu": {"batch_size": 1,
                                        "track_slots": 16}})
    p = tmp_path / "s.npz"
    a.save_state(p)
    b = PipelineEngine({**base, "tpu": {"batch_size": 1,
                                        "track_slots": 32}})
    import pytest
    with pytest.raises(ValueError, match="track slots"):
        b.load_state(p)
    # missing tracker arrays (saved with tracking off) also rejected
    c = PipelineEngine({**base,
                        "tracking": {"enabled": False},
                        "tpu": {"batch_size": 1, "track_slots": 16}})
    p2 = tmp_path / "notrack.npz"
    c.save_state(p2)
    with pytest.raises(ValueError, match="missing tracker"):
        a.load_state(p2)
