"""Multi-stream vmapped tracking == N independent trackers."""
import numpy as np

import jax.numpy as jnp

from roadvision_tpu.track.multi import init_multi_state, make_multi_sort_step
from roadvision_tpu.track.sort_tpu import init_state, make_sort_step


def test_vmapped_streams_match_independent():
    streams, cap, slots = 3, 6, 8
    multi_step = make_multi_sort_step(0.3, 1.0, 0.75)
    single_step = make_sort_step(0.3, 1.0, 0.75)

    rng = np.random.RandomState(0)
    mstate = init_multi_state(streams, slots)
    sstates = [init_state(slots) for _ in range(streams)]

    for f in range(5):
        boxes = np.zeros((streams, cap, 4), np.float32)
        valid = np.zeros((streams, cap), bool)
        for s in range(streams):
            k = (s + f) % 3 + 1
            for d in range(k):
                x = 20 * s + 30 * d + 2 * f
                boxes[s, d] = (x, 10, x + 25, 40)
                valid[s, d] = True
        cls = np.full((streams, cap), 2, np.int32)
        conf = np.full((streams, cap), 0.9, np.float32)
        ts = np.full((streams,), f / 30.0, np.float32)

        mstate, mouts = multi_step(mstate, jnp.asarray(boxes),
                                   jnp.asarray(cls), jnp.asarray(conf),
                                   jnp.asarray(valid), jnp.asarray(ts))
        for s in range(streams):
            sstates[s], souts = single_step(
                sstates[s], jnp.asarray(boxes[s]), jnp.asarray(cls[s]),
                jnp.asarray(conf[s]), jnp.asarray(valid[s]),
                jnp.float32(f / 30.0), None)
            np.testing.assert_array_equal(np.asarray(mouts.track_id[s]),
                                          np.asarray(souts.track_id))
    # streams have independent id counters
    assert int(mstate.next_id[0]) >= 1


def test_multi_stream_with_shared_projector():
    from roadvision_tpu.geometry import build_projector
    proj = build_projector({"projector": {
        "type": "homography",
        "image_points": [[0, 480], [640, 480], [0, 80], [640, 80]],
        "world_points": [[0, 0], [6.4, 0], [0, 40], [6.4, 40]],
        "origin": [3.2, 0.0], "max_distance": 100.0}})
    step = make_multi_sort_step(0.3, 1.0, 0.75, with_projector=True)
    state = init_multi_state(2, 8)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, 0] = (300, 200, 340, 280)
    valid = np.zeros((2, 4), bool)
    valid[:, 0] = True
    state, outs = step(state, jnp.asarray(boxes),
                       jnp.zeros((2, 4), jnp.int32),
                       jnp.full((2, 4), 0.9, jnp.float32),
                       jnp.asarray(valid), jnp.zeros((2,), jnp.float32),
                       proj.device_params())
    ids = np.asarray(outs.track_id)
    dist = np.asarray(outs.distance_m)
    assert (ids[:, 0] == 1).all()           # per-stream id counters
    assert np.isfinite(dist[:, 0]).all()    # projector applied per stream
    np.testing.assert_allclose(dist[0, 0], dist[1, 0], atol=1e-5)
