"""Tracking metrics + stream ordering under threaded prefetch."""
import numpy as np

from roadvision_tpu.track.eval import (evaluate_all, evaluate_hota,
                                       evaluate_idf1, evaluate_tracking)


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


def test_idf1_hota_perfect():
    gt = [[(0, 0, 10, 10, 1), (50, 50, 70, 70, 2)]] * 5
    pred = [[(0, 0, 10, 10, 7), (50, 50, 70, 70, 9)]] * 5
    assert evaluate_idf1(gt, pred)["idf1"] == 1.0
    h = evaluate_hota(gt, pred)
    assert h["hota"] == h["deta"] == h["assa"] == 1.0


def test_idf1_hota_id_switch_halfway():
    """One object, tracker splits it into two ids halfway.

    Hand computation: IDTP pairs the gt trajectory with ONE of the two
    2-frame fragments → IDTP=2 of gt 4 / pred 4 → IDF1 = 0.5. HOTA:
    every det matches (DetA=1); each fragment's association Jaccard is
    2/(4+2-2) = 0.5 → AssA = 0.5 → HOTA = sqrt(0.5)."""
    gt = [[(0, 0, 10, 10, 1)]] * 4
    pred = [[(0, 0, 10, 10, 7)]] * 2 + [[(0, 0, 10, 10, 8)]] * 2
    np.testing.assert_allclose(evaluate_idf1(gt, pred)["idf1"], 0.5)
    h = evaluate_hota(gt, pred)
    np.testing.assert_allclose(h["deta"], 1.0)
    np.testing.assert_allclose(h["assa"], 0.5)
    np.testing.assert_allclose(h["hota"], np.sqrt(0.5))


def test_idf1_hota_identity_swap():
    """Two objects whose ids the tracker swaps halfway: every det is
    matched (DetA=1), every (gt, pred) trajectory pair overlaps 2 of 4+4
    frames → align 2/(4+4-2) = 1/3 → AssA = 1/3; IDF1 pairs g1↔7, g2↔8
    for IDTP 4 of 8+8 → 0.5."""
    a, b = (0, 0, 10, 10), (50, 50, 70, 70)
    gt = [[a + (1,), b + (2,)]] * 4
    pred = ([[a + (7,), b + (8,)]] * 2
            + [[a + (8,), b + (7,)]] * 2)
    np.testing.assert_allclose(evaluate_idf1(gt, pred)["idf1"], 0.5)
    h = evaluate_hota(gt, pred)
    np.testing.assert_allclose(h["deta"], 1.0)
    np.testing.assert_allclose(h["assa"], 1 / 3)
    np.testing.assert_allclose(h["hota"], np.sqrt(1 / 3))


def test_idf1_hota_missed_frames():
    """Track covers 2 of 4 gt frames with a single id: IDF1 =
    2·2/(4+2) = 2/3; DetA = 2/(2+2+0) = 0.5, AssA = 2/(4+2-2) = 0.5."""
    gt = [[(0, 0, 10, 10, 1)]] * 4
    pred = [[(0, 0, 10, 10, 7)]] * 2 + [[], []]
    r = evaluate_idf1(gt, pred)
    np.testing.assert_allclose(r["idf1"], 2 / 3)
    assert r["idtp"] == 2 and r["idfn"] == 2 and r["idfp"] == 0
    h = evaluate_hota(gt, pred)
    np.testing.assert_allclose(h["deta"], 0.5)
    np.testing.assert_allclose(h["assa"], 0.5)
    np.testing.assert_allclose(h["hota"], 0.5)


def test_hota_alpha_sweep_penalizes_loose_boxes():
    """Boxes at IoU ≈ 0.68: matched at low α, dropped at high α — HOTA
    lands strictly between 0 and the exact-box score."""
    gt = [[(0, 0, 10, 10, 1)]] * 4
    pred = [[(0, 0, 10, 8, 7)]] * 4        # IoU = 0.8 exactly
    h = evaluate_hota(gt, pred)
    # matched for α ≤ 0.8 (16 of 19 thresholds), unmatched above
    assert 0.5 < h["hota"] < 1.0
    np.testing.assert_allclose(h["deta"], 16 / 19)


def test_idf1_prefers_consistent_over_fragmented():
    """Same MOTA-relevant coverage, different identity consistency:
    IDF1 must rank the consistent tracker higher."""
    gt = [[(0, 0, 10, 10, 1)]] * 8
    consistent = [[(0, 0, 10, 10, 5)]] * 8
    fragmented = [[(0, 0, 10, 10, f)] for f in range(8)]
    assert evaluate_idf1(gt, consistent)["idf1"] > \
        evaluate_idf1(gt, fragmented)["idf1"]


def test_evaluate_all_merges_metrics():
    gt = [[(0, 0, 10, 10, 1)]] * 4
    pred = [[(0, 0, 10, 10, 7)]] * 4
    m = evaluate_all(gt, pred)
    for key in ("mota", "idf1", "hota", "deta", "assa", "id_switches"):
        assert key in m
    assert m["mota"] == m["idf1"] == m["hota"] == 1.0


def test_hota_empty_prediction():
    gt = [[(0, 0, 10, 10, 1)]] * 2
    assert evaluate_hota(gt, [[], []])["hota"] == 0.0
    assert evaluate_idf1(gt, [[], []])["idf1"] == 0.0


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


def test_interpolate_gaps_exact_linear():
    from roadvision_tpu.track.postprocess import interpolate_gaps
    frames = [
        [(0.0, 0.0, 10.0, 10.0, 1, 1.0)],
        [], [],
        [(30.0, 0.0, 40.0, 10.0, 1, 0.4)],
    ]
    out = interpolate_gaps(frames, max_gap=5)
    # observed frames untouched
    assert out[0] == frames[0] and out[3] == frames[3]
    # gap filled with linear boxes AND extras (conf)
    np.testing.assert_allclose(out[1], [(10.0, 0.0, 20.0, 10.0, 1, 0.8)])
    np.testing.assert_allclose(out[2], [(20.0, 0.0, 30.0, 10.0, 1, 0.6)])
    assert out[1][0][4] == 1 and isinstance(out[1][0][4], int)
    # originals not mutated
    assert frames[1] == []


def test_interpolate_gaps_limits():
    from roadvision_tpu.track.postprocess import interpolate_gaps
    frames = [[(0, 0, 10, 10, 1)]] + [[]] * 4 + [[(50, 0, 60, 10, 1)]]
    # gap of 4 > max_gap 3: untouched
    out = interpolate_gaps(frames, max_gap=3)
    assert all(out[f] == [] for f in range(1, 5))
    # max_gap 0: no-op even for 1-frame gaps
    frames2 = [[(0, 0, 10, 10, 1)], [], [(20, 0, 30, 10, 1)]]
    assert interpolate_gaps(frames2, max_gap=0)[1] == []
    # two different ids interpolate independently
    frames3 = [[(0, 0, 10, 10, 1), (100, 0, 110, 10, 2)], [],
               [(20, 0, 30, 10, 1), (120, 0, 130, 10, 2)]]
    mid = interpolate_gaps(frames3, max_gap=2)[1]
    assert sorted(r[4] for r in mid) == [1, 2]


def test_interpolation_improves_metrics():
    from roadvision_tpu.track.postprocess import interpolate_gaps
    gt = [[(0, 0, 10, 10, 1)]] * 8
    pred = [[(0, 0, 10, 10, 7)]] * 3 + [[], []] + \
        [[(0, 0, 10, 10, 7)]] * 3
    filled = interpolate_gaps(pred, max_gap=5)
    before = evaluate_all(gt, pred)
    after = evaluate_all(gt, filled)
    assert after["mota"] > before["mota"]
    assert after["idf1"] > before["idf1"]
    assert after["hota"] > before["hota"]
    assert after["mota"] == after["idf1"] == 1.0
