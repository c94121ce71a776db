"""Tracking metrics + stream ordering under threaded prefetch."""
import numpy as np

from roadvision_tpu.track.eval import evaluate_tracking


def test_perfect_tracking():
    gt = [[(0, 0, 10, 10, 1), (50, 50, 70, 70, 2)]] * 5
    pred = [[(0, 0, 10, 10, 7), (50, 50, 70, 70, 9)]] * 5
    m = evaluate_tracking(gt, pred)
    assert m["mota"] == 1.0 and m["id_switches"] == 0
    assert m["matches"] == 10


def test_id_switch_detected():
    gt = [[(0, 0, 10, 10, 1)]] * 4
    pred = [[(0, 0, 10, 10, 7)]] * 2 + [[(0, 0, 10, 10, 8)]] * 2
    m = evaluate_tracking(gt, pred)
    assert m["id_switches"] == 1
    assert m["mota"] == 1.0 - 1 / 4


def test_misses_and_false_positives():
    gt = [[(0, 0, 10, 10, 1)], [(0, 0, 10, 10, 1)]]
    pred = [[], [(0, 0, 10, 10, 3), (90, 90, 99, 99, 4)]]
    m = evaluate_tracking(gt, pred)
    assert m["misses"] == 1 and m["false_positives"] == 1


def test_engine_stream_order_is_monotonic():
    from roadvision_tpu.config import DEFAULTS, merge
    from roadvision_tpu.io_video import VideoSource
    from roadvision_tpu.runtime import PipelineEngine
    cfg = merge(DEFAULTS, {
        "preprocess": {"enabled": True, "chain": [
            {"name": "MedianDerain", "params": {"ksize": 3}}]},
        "tpu": {"batch_size": 3}})
    engine = PipelineEngine(cfg)
    vs = VideoSource(source="synthetic:2", width=96, height=64,
                     num_frames=10)
    results = list(engine.stream(vs, max_frames=10))
    assert len(results) == 10
    ts = [r.ts for r in results]
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    # frames decoded in threaded prefetch arrive in source order
    first = [r.raw for r in results]
    ref = VideoSource(source="synthetic:2", width=96, height=64,
                      num_frames=10)
    for got in first:
        fr = ref.read()
        np.testing.assert_array_equal(got, fr.image)
