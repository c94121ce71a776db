"""Pipeline-parallel YOLO inference (parallel/pipeline.py).

Equivalence bar: the staged, multi-device forward must reproduce the
single-device `yolov8.forward_raw` outputs (same graph, same op order) —
the same standard the sharded stream step and the dp×tp train step meet.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roadvision_tpu.models.yolo import yolov8
from roadvision_tpu.parallel.pipeline import (STAGE_KEYS, PipelinedYOLO,
                                              _balanced_groups)


@pytest.fixture(scope="module")
def params():
    return yolov8.init_params(jax.random.PRNGKey(0), "n")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    return jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)


def test_stage_keys_cover_param_tree_exactly(params):
    flat = [k for g in STAGE_KEYS for k in g]
    assert len(flat) == len(set(flat)), "a layer appears in two stages"
    assert set(flat) == set(params.keys())


@pytest.mark.parametrize("n_stages", [2, 3, 4])
def test_pipeline_matches_single_device(params, batch, n_stages):
    ref_boxes, ref_scores = yolov8.forward_raw(params, batch, "n", 80)
    pipe = PipelinedYOLO(params, "n", 80, n_stages=n_stages)
    boxes, scores = pipe(batch)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5, atol=1e-6)


def test_explicit_microbatch_and_divisibility(params, batch):
    pipe = PipelinedYOLO(params, "n", 80, n_stages=2, microbatch=2)
    boxes, _ = pipe(batch)
    assert boxes.shape[0] == batch.shape[0]
    bad = PipelinedYOLO(params, "n", 80, n_stages=2, microbatch=3)
    with pytest.raises(ValueError, match="divisible"):
        bad(batch)


def test_stage_params_live_on_distinct_devices(params):
    pipe = PipelinedYOLO(params, "n", 80, n_stages=4)
    devs = []
    for sp in pipe.stage_params:
        leaf_devs = {next(iter(l.sharding.device_set))
                     for l in jax.tree_util.tree_leaves(sp)}
        assert len(leaf_devs) == 1, "one stage spans multiple devices"
        devs.append(leaf_devs.pop())
    assert len(set(devs)) == 4


def test_balanced_groups_contiguous_and_minimal():
    groups = _balanced_groups([10, 1, 1, 10], 2)
    assert [list(g) for g in groups] == [[0, 1], [2, 3]]
    groups = _balanced_groups([1, 1, 1, 9], 2)
    assert [list(g) for g in groups] == [[0, 1, 2], [3]]


def test_needs_enough_devices(params):
    with pytest.raises(ValueError, match="devices"):
        PipelinedYOLO(params, "n", 80, n_stages=2,
                      devices=jax.devices()[:1])


# --- RT-DETR pipeline (the 32M-param family where pp matters most) --------

@pytest.fixture(scope="module")
def rt_params():
    from roadvision_tpu.models import rtdetr
    return rtdetr.init_params_rtdetr(jax.random.PRNGKey(3), nc=7)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_rtdetr_pipeline_matches_single_device(rt_params, n_stages):
    from roadvision_tpu.models import rtdetr
    from roadvision_tpu.parallel.pipeline import PipelinedRTDETR
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 96, 96, 3), jnp.float32)
    ref_boxes, ref_scores = rtdetr.forward_rtdetr_raw(rt_params, x, nc=7)
    pipe = PipelinedRTDETR(rt_params, nc=7, n_stages=n_stages)
    boxes, scores = pipe(x)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-4, atol=1e-6)


def test_rtdetr_stage_params_on_distinct_devices(rt_params):
    from roadvision_tpu.parallel.pipeline import PipelinedRTDETR
    pipe = PipelinedRTDETR(rt_params, nc=7, n_stages=4)
    devs = []
    for sp in pipe.stage_params:
        leaf_devs = {next(iter(l.sharding.device_set))
                     for l in jax.tree_util.tree_leaves(sp)}
        assert len(leaf_devs) == 1
        devs.append(leaf_devs.pop())
    assert len(set(devs)) == 4
