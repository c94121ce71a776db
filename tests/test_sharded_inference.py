"""Multi-chip inference correctness: stream-sharded pipeline on a mesh
produces exactly the outputs of per-stream single-device runs.

Runs on the 8-virtual-CPU-device mesh from conftest (SURVEY.md §4: "no
real cluster needed"). Streams are the data-parallel axis of this domain
(the per-stream batch axis is time — VERDICT r1 next-round #6).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.config import DEFAULTS, merge
from roadvision_tpu.parallel import make_mesh, make_sharded_stream_step
from roadvision_tpu.runtime import PipelineEngine

S, B, H, W = 8, 4, 96, 128


def _cfg():
    return merge(DEFAULTS, {
        "preprocess": {"enabled": True, "chain": [
            {"name": "CLAHEDehaze",
             "params": {"space": "YCrCb", "clip_limit": 2.0, "tile_grid": 4}},
            {"name": "MedianDerain", "params": {"ksize": 3}},
        ]},
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 8, "imgsz": 96, "classes_keep": [],
                   "conf_thres": 0.0},
        "tracking": {"enabled": True},
        "geometry": {"enabled": True, "projector": {
            "type": "homography",
            "image_points": [[0, 96], [128, 96], [0, 40], [128, 40]],
            "world_points": [[0, 0], [6.4, 0], [0, 40], [6.4, 40]],
            "origin": [3.2, 0.0], "max_distance": 100.0}},
        "tpu": {"batch_size": B, "track_slots": 8},
    })


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    engine = PipelineEngine(_cfg())
    mesh = make_mesh(8, model_parallel=1)
    step, init_states = make_sharded_stream_step(engine, (B, H, W), mesh)
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (S, B, H, W, 3), dtype=np.uint8)
    ts = (np.arange(S * B, dtype=np.float32).reshape(S, B) / 30.0)
    return engine, step, init_states, frames, ts


def test_sharded_streams_match_single_device(setup):
    engine, step, init_states, frames, ts = setup
    params = engine.detector.params

    states = init_states(S)
    outs, states = step(params, states, jnp.asarray(frames),
                        jnp.asarray(ts))
    outs = jax.tree_util.tree_map(np.asarray, outs)

    # reference: each stream independently on one device, same traced code
    raw = engine.build_raw_step((B, H, W), want_proc=False)
    single = jax.jit(raw)
    from roadvision_tpu.track.sort_tpu import init_state
    for s in range(S):
        st = init_state(engine.track_slots)
        _, ref, st = single(params, st, jnp.asarray(frames[s]),
                            jnp.asarray(ts[s]))
        ref = jax.tree_util.tree_map(np.asarray, ref)
        got = jax.tree_util.tree_map(lambda a, s=s: a[s], outs)
        # integer fields exact; float fields bit-identical too (stream
        # parallelism involves no cross-device math)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(g, r)


def test_sharded_state_carries_across_steps(setup):
    engine, step, init_states, frames, ts = setup
    params = engine.detector.params
    states = init_states(S)
    _, states = step(params, states, jnp.asarray(frames), jnp.asarray(ts))
    next1 = np.asarray(states.next_id).copy()
    _, states = step(params, states, jnp.asarray(frames),
                     jnp.asarray(ts + S * B / 30.0))
    next2 = np.asarray(states.next_id)
    assert next1.shape == (S,)
    assert (next2 >= next1).all()


def test_stream_sharding_is_actually_distributed(setup):
    engine, step, init_states, frames, ts = setup
    states = init_states(S)
    shard_devs = {d for leaf in jax.tree_util.tree_leaves(states)
                  for d in leaf.sharding.device_set}
    assert len(shard_devs) == 8, "stream states should span the mesh"
