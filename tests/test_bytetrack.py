"""ByteTrack backend: two-stage association vs the scalar float64 oracle.

Pins the ByteTrack invariants (roadvision_tpu/track/bytetrack.py):
low-score detections rescue occluded tracks in a second association pass
but never create tracks; new tracks only from unmatched high-score dets
above new_track_thresh; everything else inherits the SORT step semantics
(real-dt Kalman, time staleness, windowed speed).
"""
import numpy as np
import pytest

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.geometry import build_projector
from roadvision_tpu.track import build_tracker
from roadvision_tpu.track.bytetrack import ByteTracker, make_byte_step
from roadvision_tpu.track.registry import build_device_step
from roadvision_tpu.track.sort_tpu import init_state
from tests.oracles.byte_oracle import ByteOracle


def _dets(boxes, confs, cls_id=2):
    return [Detection(b[0], b[1], b[2], b[3], c, cls_id, "car")
            for b, c in zip(boxes, confs)]


def _cfg(**over):
    cfg = {"backend": "bytetrack", "max_staleness": 1.2,
           "speed_window": 0.8, "det_capacity": 16, "track_slots": 16,
           "track_high_thresh": 0.5, "track_low_thresh": 0.1,
           "new_track_thresh": 0.6, "match_iou": 0.3,
           "second_match_iou": 0.5}
    cfg.update(over)
    return cfg


def _projector():
    img = [[0, 480], [640, 480], [0, 80], [640, 80]]
    world = [[0.0, 0.0], [6.4, 0.0], [0.0, 40.0], [6.4, 40.0]]
    return build_projector({"projector": {
        "type": "homography", "image_points": img, "world_points": world,
        "origin": [3.2, -2.0], "max_distance": 35.0}})


def _drive_both(sequences, cfg=None, projector=None, t0=1700000000.0):
    """Run tracker + oracle over [(dt, boxes, confs), ...]."""
    cfg = cfg or _cfg()
    tracker = build_tracker(cfg)
    oracle = ByteOracle(cfg["max_staleness"], cfg["speed_window"],
                        cfg["track_high_thresh"], cfg["track_low_thresh"],
                        cfg["new_track_thresh"], cfg["match_iou"],
                        cfg["second_match_iou"])
    got_all, want_all = [], []
    t = t0
    for dt, boxes, confs in sequences:
        t += dt
        dets = tracker.update(_dets(boxes, confs), t, projector=projector)
        want = oracle.update([tuple(b) for b in boxes], list(confs),
                             t - t0, projector=projector)
        got_all.append(dets)
        want_all.append(want)
    return got_all, want_all


def _assert_ids_match(got_all, want_all):
    for f, (got, want) in enumerate(zip(got_all, want_all)):
        assert len(got) == len(want)
        for i, (g, w) in enumerate(zip(got, want)):
            assert g.track_id == w["id"], (
                f"frame {f} det {i}: got id {g.track_id}, want {w['id']}")


def test_registry_dispatch():
    trk = build_tracker(_cfg())
    assert isinstance(trk, ByteTracker)


def test_low_conf_det_never_creates_track():
    got, want = _drive_both([(0.0, [(10, 10, 50, 50)], [0.3])])
    _assert_ids_match(got, want)
    assert got[0][0].track_id is None


def test_below_low_thresh_ignored_entirely():
    # conf 0.05 < track_low_thresh: not even stage-2 eligible
    seq = [(0.0, [(10, 10, 50, 50)], [0.9]),
           (1 / 30, [(11, 10, 51, 50)], [0.05])]
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    assert got[1][0].track_id is None


def test_unmatched_high_below_new_track_thresh_no_track():
    # conf 0.55 >= high(0.5) so it associates in stage 1, but with no
    # existing track and conf < new_track_thresh(0.6) it must not start one
    got, want = _drive_both([(0.0, [(10, 10, 50, 50)], [0.55])])
    _assert_ids_match(got, want)
    assert got[0][0].track_id is None
    # and it leaves no hidden state: the same det next frame still has none
    got, want = _drive_both([(0.0, [(10, 10, 50, 50)], [0.55]),
                             (1 / 30, [(10, 10, 50, 50)], [0.55])])
    assert got[1][0].track_id is None


def test_occlusion_rescue_low_conf_keeps_id():
    """The ByteTrack headline: a track whose detection drops to low
    confidence (occlusion) keeps its ID through the second pass."""
    seq = [(0.0, [(100, 100, 160, 150)], [0.9]),
           (1 / 30, [(104, 100, 164, 150)], [0.85])]
    # occluded: conf collapses below high thresh for several frames
    for f in range(2, 8):
        seq.append((1 / 30, [(100 + 4 * f, 100, 160 + 4 * f, 150)], [0.2]))
    seq.append((1 / 30, [(132, 100, 192, 150)], [0.9]))
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    ids = [fr[0].track_id for fr in got]
    assert ids[0] == 1
    assert all(i == 1 for i in ids), ids  # identity survives the occlusion


def test_sort_would_fragment_where_byte_rescues():
    """Same occlusion scenario through plain SORT: the low-conf frames
    still match (SORT ignores conf) — so instead contrast against a
    detector that DROPS low-conf dets (the usual conf_thres pipeline):
    SORT loses the object and reassigns a new ID, ByteTrack does not."""
    from roadvision_tpu.track.sort_tracker import SortTracker
    sort = SortTracker({"max_staleness": 0.1, "iou_threshold": 0.3,
                        "speed_window": 0.8, "det_capacity": 16,
                        "track_slots": 16})
    t = 0.0
    out1 = sort.update(_dets([(100, 100, 160, 150)], [0.9]), t)
    # 6 frames with no detection at all (conf-filtered away), > staleness
    for f in range(1, 7):
        sort.update([], t + f / 30)
    out2 = sort.update(_dets([(124, 100, 184, 150)], [0.9]), t + 7 / 30)
    assert out1[0].track_id == 1 and out2[0].track_id == 2  # fragmented

    byte = build_tracker(_cfg(max_staleness=0.5))
    out1 = byte.update(_dets([(100, 100, 160, 150)], [0.9]), t)
    for f in range(1, 7):
        byte.update(_dets([(100 + 4 * f, 100, 160 + 4 * f, 150)], [0.2]),
                    t + f / 30)
    out2 = byte.update(_dets([(128, 100, 188, 150)], [0.9]), t + 7 / 30)
    assert out1[0].track_id == 1 and out2[0].track_id == 1  # rescued


def test_second_stage_stricter_iou():
    """A low det overlapping at iou in [match_iou, second_match_iou)
    must NOT match in stage 2 (stage 2 is stricter)."""
    base = (100.0, 100.0, 200.0, 200.0)
    # shifted box with IoU ~0.38: (100-160 overlap of 100px ⇒ compute)
    shifted = (145.0, 100.0, 245.0, 200.0)  # inter 55*100, union 2*10000-5500
    from tests.oracles.sort_oracle import iou as iou_s
    assert 0.3 < iou_s(base, shifted) < 0.5
    seq = [(0.0, [base], [0.9]), (1 / 30, [shifted], [0.3])]
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    assert got[1][0].track_id is None


def test_two_stage_priority_high_wins_track():
    """When a high and a low det both overlap one track, stage 1 gives
    it to the high det; the low det is left unmatched."""
    base = (100.0, 100.0, 200.0, 200.0)
    seq = [(0.0, [base], [0.9]),
           (1 / 30, [(102.0, 100.0, 202.0, 200.0),
                     (98.0, 100.0, 198.0, 200.0)], [0.7, 0.2])]
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    assert got[1][0].track_id == 1
    assert got[1][1].track_id is None


def test_random_stress_parity_vs_oracle():
    # staleness bounds the alive-track count well under track_slots: the
    # oracle grows unbounded while the device drops at capacity, so an
    # unbounded config would test the (documented) overflow divergence
    # instead of the association logic
    rng = np.random.default_rng(7)
    seq = []
    for f in range(40):
        n = int(rng.integers(0, 8))
        boxes, confs = [], []
        for _ in range(n):
            x = float(rng.uniform(0, 560))
            y = float(rng.uniform(0, 400))
            w = float(rng.uniform(20, 80))
            h = float(rng.uniform(20, 80))
            boxes.append((x, y, x + w, y + h))
            confs.append(float(rng.uniform(0.05, 1.0)))
        seq.append((float(rng.uniform(0.05, 0.2)), boxes, confs))
    got, want = _drive_both(
        seq, cfg=_cfg(max_staleness=0.4, track_slots=64))
    _assert_ids_match(got, want)


def test_random_stress_with_projector_metrics():
    rng = np.random.default_rng(11)
    proj = _projector()
    seq = []
    for f in range(25):
        n = int(rng.integers(1, 6))
        boxes, confs = [], []
        for _ in range(n):
            x = float(rng.uniform(0, 560))
            y = float(rng.uniform(80, 400))
            boxes.append((x, y, x + 50, y + 40))
            confs.append(float(rng.uniform(0.05, 1.0)))
        seq.append((1 / 30, boxes, confs))
    got, want = _drive_both(
        seq, cfg=_cfg(max_staleness=0.25, track_slots=128), projector=proj)
    _assert_ids_match(got, want)
    for fr_got, fr_want in zip(got, want):
        for g, w in zip(fr_got, fr_want):
            if w["distance"] is None:
                assert g.distance_m is None
            else:
                assert g.distance_m == pytest.approx(w["distance"],
                                                     rel=1e-3, abs=1e-3)
            if w["speed_kmh"] is None:
                assert g.speed_kmh is None
            else:
                assert g.speed_kmh == pytest.approx(w["speed_kmh"],
                                                    rel=1e-2, abs=0.05)


def test_device_step_factory_and_scan_compat():
    """build_device_step('bytetrack') produces a step with the SortState
    contract, scannable like the SORT step (the fused-engine seam)."""
    import jax
    import jax.numpy as jnp

    step = build_device_step(_cfg())
    state = init_state(16)
    frames = 6
    boxes = np.zeros((frames, 4, 4), np.float32)
    conf = np.zeros((frames, 4), np.float32)
    valid = np.zeros((frames, 4), bool)
    for f in range(frames):
        boxes[f, 0] = (10 + 3 * f, 10, 60 + 3 * f, 60)
        conf[f, 0] = 0.9 if f % 3 != 1 else 0.2   # dips to low every 3rd
        valid[f, 0] = True
    cls = np.zeros((frames, 4), np.int32)
    ts = (np.arange(frames) / 30.0).astype(np.float32)

    def body(st, fr):
        b, c, cf, v, t = fr
        return step(st, b, c, cf, v, t, None)

    _, out = jax.jit(lambda s, xs: jax.lax.scan(body, s, xs))(
        state, (jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(conf),
                jnp.asarray(valid), jnp.asarray(ts)))
    ids = np.asarray(out.track_id)[:, 0]
    assert (ids == 1).all(), ids  # one identity through the conf dips


def test_engine_accepts_bytetrack_backend():
    """Config path: the fused engine builds with tracking.backend
    bytetrack and produces tracked detections."""
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 8, "conf_thres": 0.0, "imgsz": 64,
                   "classes_keep": []},
        "tracking": {"enabled": True, "backend": "bytetrack",
                     "track_high_thresh": 0.0, "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.track_enabled
    frames = np.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    assert len(res) == 2
    assert any(d.track_id for r in res for d in r.detections)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown tracking backend"):
        build_tracker({"backend": "nope"})
    with pytest.raises(ValueError, match="unknown tracking backend"):
        build_device_step({"backend": "nope"})
