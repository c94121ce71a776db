"""HLO-level mechanism guards for the parallel story (SURVEY.md §2.5).

The numeric-equality tests (test_spatial / test_train_parallel /
test_sharded_inference) prove the sharded runs compute the right
answers. These prove the MECHANISM, via
``.lower().compile().as_text()`` on the virtual 8-device CPU mesh:

  * the spatially-partitioned conv forward really halo-exchanges
    (``collective-permute``) and never all-gathers a full-width conv
    activation — a GSPMD regression that silently replicated the bands
    would still pass every numeric test, just slower;
  * pipeline-parallel stage params really live on distinct devices at
    every stage count;
  * the dp×tp train step really cross-replica-sums gradients
    (``all-reduce`` over the data axis).

If XLA silently de-partitions, these fail loudly.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import init_params
from roadvision_tpu.parallel import make_mesh
from roadvision_tpu.parallel.spatial import make_spatial_forward

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _op_result_elems(txt: str, op: str):
    """Element counts of every ``op`` result in an HLO text dump.

    Matches lines like ``%name = f32[1,256,192,3]{...} all-gather(...)``;
    a tuple result contributes each member shape."""
    out = []
    for m in re.finditer(
            r"=\s*(?:\()?\s*((?:\w+\[[0-9,]*\][^ )]*(?:,\s*)?)+)\)?\s*"
            + re.escape(op) + r"\(", txt):
        for shape in re.findall(r"\[([0-9,]*)\]", m.group(1)):
            dims = [int(d) for d in shape.split(",") if d]
            out.append(int(np.prod(dims)) if dims else 1)
    return out


def test_spatial_partition_halo_exchange_no_full_allgather():
    mesh = make_mesh(8, model_parallel=1)
    params = init_params(jax.random.PRNGKey(0), "n")
    run = make_spatial_forward("n", 80, mesh)
    x = jnp.zeros((1, 256, 192, 3), jnp.float32)
    txt = run.jitted.lower(params, x).compile().as_text()
    # halo exchange between row bands must exist
    assert "collective-permute" in txt, \
        "spatial partition compiled without halo exchanges — GSPMD " \
        "de-partitioned the conv graph"
    # the only all-gathers allowed are the tiny detect-head re-shards:
    # head tensors at 256x192 are (1, 1008, 84) ≈ 85k elems; an early
    # full-width conv activation is 128*96*64 ≈ 786k. Anything big
    # being gathered means activations were de-partitioned.
    gathered = _op_result_elems(txt, "all-gather")
    big = [n for n in gathered if n > 300_000]
    assert not big, f"full-width activation all-gather(s) of {big} elems"


@pytest.mark.parametrize("n_stages", [2, 3, 4])
def test_pipeline_yolo_stage_params_distinct_devices(n_stages):
    from roadvision_tpu.parallel import PipelinedYOLO
    params = init_params(jax.random.PRNGKey(1), "n")
    pp = PipelinedYOLO(params, "n", 80, n_stages=n_stages)
    stage_devs = []
    for sp in pp.stage_params:
        devs = set()
        for leaf in jax.tree_util.tree_leaves(sp):
            devs |= set(leaf.devices())
        assert len(devs) == 1, "one stage spread over several devices"
        stage_devs.append(devs.pop())
    assert len(set(stage_devs)) == n_stages, \
        f"stages share devices: {stage_devs}"


@pytest.mark.parametrize("n_stages", [2, 4])
def test_pipeline_rtdetr_stage_params_distinct_devices(n_stages):
    from roadvision_tpu.models import rtdetr
    from roadvision_tpu.parallel import PipelinedRTDETR
    params = rtdetr.init_params_rtdetr(jax.random.PRNGKey(2), nc=8)
    pp = PipelinedRTDETR(params, nc=8, n_stages=n_stages)
    stage_devs = []
    for sp in pp.stage_params:
        devs = set()
        for leaf in jax.tree_util.tree_leaves(sp):
            devs |= set(leaf.devices())
        assert len(devs) == 1
        stage_devs.append(devs.pop())
    assert len(set(stage_devs)) == n_stages


def test_dp_train_step_has_gradient_allreduce():
    from roadvision_tpu.models.yolo.train import (init_momentum,
                                                  make_train_step)
    from roadvision_tpu.parallel import (batch_sharding, param_shardings,
                                         shard_pytree)
    mesh = make_mesh(8, model_parallel=2)
    params = init_params(jax.random.PRNGKey(3), "n")
    pshard = param_shardings(params, mesh)
    params = shard_pytree(params, pshard)
    mom = shard_pytree(init_momentum(params), pshard)
    rng = np.random.RandomState(0)
    images = jax.device_put(
        jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32)),
        batch_sharding(mesh, 4))
    gt_boxes = jnp.asarray(rng.uniform(5, 40, (4, 3, 4)).astype(np.float32))
    gt_cls = jnp.zeros((4, 3), jnp.int32)
    gt_mask = jnp.ones((4, 3), bool)
    step = make_train_step("n", lr=1e-3)
    txt = step.lower(params, mom, images, gt_boxes, gt_cls,
                     gt_mask).compile().as_text()
    n_ar = txt.count(" all-reduce(") + txt.count(" all-reduce-start(")
    # XLA fuses the per-parameter gradient reductions into a handful of
    # large all-reduces (plus the scalar loss/num_fg reductions); zero
    # would mean the data-parallel gradient sum disappeared
    assert n_ar >= 1, "dp train step compiled without any all-reduce"


def test_rtdetr_dp_train_step_has_gradient_allreduce():
    """The set-prediction train step (per-sample Hungarian matching
    inside vmap — the shape GSPMD can silently de-partition, VERDICT r4
    weak #5) really cross-replica-sums its gradients when compiled
    under dp×tp shardings. Numeric equivalence lives in
    tests/test_rtdetr_train.py::test_sharded_train_step_matches_unsharded;
    this pins the mechanism."""
    from roadvision_tpu.models import rtdetr
    from roadvision_tpu.models.rtdetr_train import (init_opt_rtdetr,
                                                    make_train_step_rtdetr)
    from roadvision_tpu.parallel import (batch_sharding, param_shardings,
                                         shard_pytree)
    mesh = make_mesh(8, model_parallel=2)
    params = rtdetr.init_params_rtdetr(jax.random.PRNGKey(5), nc=5)
    pshard = param_shardings(params, mesh)
    params = shard_pytree(params, pshard)
    opt = init_opt_rtdetr(params)
    opt = shard_pytree(opt, param_shardings(opt, mesh))
    rng = np.random.RandomState(1)
    images = jax.device_put(
        jnp.asarray(rng.rand(4, 64, 64, 3).astype(np.float32)),
        batch_sharding(mesh, 4))
    xy = rng.uniform(5, 40, (4, 3, 2)).astype(np.float32)
    wh = rng.uniform(8, 20, (4, 3, 2)).astype(np.float32)
    gt_boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    gt_cls = jnp.asarray(rng.randint(0, 5, (4, 3)), jnp.int32)
    gt_mask = jnp.ones((4, 3), bool)
    step = make_train_step_rtdetr(nc=5, lr=1e-4)
    txt = step.lower(params, opt, images, gt_boxes, gt_cls, gt_mask,
                     jnp.float32(1.0)).compile().as_text()
    n_ar = txt.count(" all-reduce(") + txt.count(" all-reduce-start(")
    assert n_ar >= 1, \
        "rtdetr dp train step compiled without any all-reduce"


def test_fleet_gate_has_global_reduce_and_conditional():
    """The fleet temporal gate's mechanism: the fleet-max motion score
    is a cross-shard reduction and the coast/full choice compiles to a
    real HLO conditional (not a select that executes both arms' detector
    forwards)."""
    from roadvision_tpu.config import DEFAULTS, merge
    from roadvision_tpu.parallel.inference import \
        make_sharded_gated_stream_step
    from roadvision_tpu.runtime import PipelineEngine

    cfg = merge(DEFAULTS, {
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 8, "imgsz": 64, "classes_keep": [],
                   "conf_thres": 0.0,
                   "temporal_gate": {"enable": True, "thresh": 1.5,
                                     "max_skip_batches": 3}},
        "tracking": {"enabled": True},
        "tpu": {"batch_size": 2, "track_slots": 8},
    })
    engine = PipelineEngine(cfg)
    mesh = make_mesh(8, model_parallel=1)
    step, init_carry = make_sharded_gated_stream_step(engine, (2, 64, 64),
                                                      mesh)
    carry = init_carry(8)
    frames = jnp.zeros((8, 2, 64, 64, 3), jnp.uint8)
    ts = jnp.zeros((8, 2), jnp.float32)
    txt = step.lower(engine.detector.params, carry, frames,
                     ts).compile().as_text()
    assert "conditional(" in txt or " conditional " in txt, \
        "fleet gate compiled without an HLO conditional — both branches " \
        "would execute every batch"
    assert "all-reduce" in txt, \
        "fleet-max motion score compiled without a cross-shard reduction"
