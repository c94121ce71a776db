"""The engine's in-step SORT scan must equal the host SortTracker API on
the same detection stream (same step function, two integration paths)."""
import numpy as np

import jax.numpy as jnp

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.track import SortTracker
from roadvision_tpu.track.sort_tpu import init_state, make_sort_step
import jax


def test_scan_path_matches_per_frame_path():
    cfg = {"max_staleness": 1.2, "min_hits": 3, "iou_threshold": 0.35,
           "speed_window": 0.8, "det_capacity": 8, "track_slots": 8}
    host = SortTracker(cfg)

    step = make_sort_step(0.35, 1.2, 0.8, 3)

    frames = []
    for f in range(6):
        boxes = np.zeros((8, 4), np.float32)
        valid = np.zeros((8,), bool)
        boxes[0] = (10 + 4 * f, 10, 50 + 4 * f, 50)
        valid[0] = True
        if f >= 2:
            boxes[1] = (200, 100 - 3 * f, 260, 150 - 3 * f)
            valid[1] = True
        frames.append((boxes, valid))

    ts0 = 1_700_000_000.0

    # path A: host tracker per frame
    ids_a = []
    for f, (boxes, valid) in enumerate(frames):
        dets = [Detection(*boxes[i], 0.9, 2, "car")
                for i in range(8) if valid[i]]
        out = host.update(dets, ts0 + f / 30.0)
        ids_a.append([d.track_id for d in out])

    # path B: one lax.scan over the stream (rebased timestamps)
    b = jnp.asarray(np.stack([fr[0] for fr in frames]))
    v = jnp.asarray(np.stack([fr[1] for fr in frames]))
    c = jnp.zeros((6, 8), jnp.int32)
    cf = jnp.full((6, 8), 0.9, jnp.float32)
    ts = jnp.asarray(np.arange(6) / 30.0, jnp.float32)

    @jax.jit
    def scan(state):
        def body(st, fr):
            bb, cc, ff, vv, tt = fr
            return step(st, bb, cc, ff, vv, tt, None)
        return jax.lax.scan(body, state, (b, c, cf, v, ts))

    _, outs = scan(init_state(8))
    ids_b_arr = np.asarray(outs.track_id)
    for f, (boxes, valid) in enumerate(frames):
        ids_b = [int(ids_b_arr[f, i]) for i in range(8) if valid[i]]
        assert ids_b == ids_a[f], (f, ids_b, ids_a[f])
