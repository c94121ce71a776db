"""OC-SORT backend: observation-centric mechanisms vs the float64 oracle.

Pins the three OC-SORT adaptations (roadvision_tpu/track/ocsort.py):
OCM direction-consistency association cost, OCR recovery on last
observations, ORU virtual re-update from the last-observation posterior —
plus the shared SORT step semantics (real-dt Kalman, time staleness,
windowed speed, fixed-slot scan compatibility).
"""
import numpy as np
import pytest

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.geometry import build_projector
from roadvision_tpu.track import build_tracker
from roadvision_tpu.track.ocsort import (OcSortTracker, make_oc_associate,
                                         make_oc_step)
from roadvision_tpu.track.registry import build_device_step
from roadvision_tpu.track.sort_tpu import init_state
from tests.oracles.ocsort_oracle import OcSortOracle


def _dets(boxes, confs, cls_id=2):
    return [Detection(b[0], b[1], b[2], b[3], c, cls_id, "car")
            for b, c in zip(boxes, confs)]


def _cfg(**over):
    cfg = {"backend": "ocsort", "max_staleness": 1.2, "speed_window": 0.8,
           "det_capacity": 16, "track_slots": 16, "iou_threshold": 0.3,
           "vdc_weight": 0.2, "use_ocr": True, "oru_steps": 4,
           "new_track_thresh": 0.6}
    cfg.update(over)
    return cfg


def _oracle(cfg):
    return OcSortOracle(
        max_staleness=cfg["max_staleness"], speed_window=cfg["speed_window"],
        iou_threshold=cfg["iou_threshold"], vdc_weight=cfg["vdc_weight"],
        ocr_iou=cfg.get("ocr_iou"), use_ocr=cfg["use_ocr"],
        oru_steps=cfg["oru_steps"],
        new_track_thresh=cfg["new_track_thresh"])


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
    oracle = _oracle(cfg)
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
    assert isinstance(trk, OcSortTracker)


def test_new_track_needs_confidence():
    got, want = _drive_both([(0.0, [(10, 10, 50, 50)], [0.4])])
    _assert_ids_match(got, want)
    assert got[0][0].track_id is None
    got, want = _drive_both([(0.0, [(10, 10, 50, 50)], [0.7])])
    _assert_ids_match(got, want)
    assert got[0][0].track_id == 1


def test_vdc_weight_range_checked():
    with pytest.raises(ValueError, match="vdc_weight"):
        make_oc_associate(0.3, 2.5, 0.3)


def test_ocm_prefers_direction_consistent_det():
    """Hook-level OCM check with a controlled IoU tie: two candidate
    detections with identical predicted-IoU; the track's observed motion
    points right. With vdc_weight > 0 the rightward det wins even when
    listed second; with vdc_weight == 0 the tie falls to the first."""
    import jax.numpy as jnp

    state = init_state(4)
    # slot 0: alive track, observed moving right 30px/frame
    state = state._replace(
        alive=state.alive.at[0].set(True),
        hits=state.hits.at[0].set(2),
        prev_obs=state.prev_obs.at[0].set(
            jnp.array([30.0, 0.0, 90.0, 40.0])),
        last_obs=state.last_obs.at[0].set(
            jnp.array([60.0, 0.0, 120.0, 40.0])),  # center (90, 20)
    )
    # det 0: behind (leftward, angle pi); det 1: ahead (angle 0)
    boxes = jnp.array([[30.0, 0.0, 90.0, 40.0],      # center (60, 20)
                       [90.0, 0.0, 150.0, 40.0]])    # center (120, 20)
    iou = jnp.zeros((4, 2)).at[0].set(0.5)           # controlled tie
    alive = state.alive
    dvalid = jnp.array([True, True])
    conf = jnp.array([0.9, 0.9])
    ctx = (state, boxes, jnp.float32(0.1), None)

    assoc_ocm = make_oc_associate(0.3, 0.2, 0.3, use_ocr=False)
    d2t = np.asarray(assoc_ocm(iou, alive, dvalid, conf, ctx))
    assert d2t[1] == 0 and d2t[0] == -1  # direction-consistent det wins

    assoc_plain = make_oc_associate(0.3, 0.0, 0.3, use_ocr=False)
    d2t = np.asarray(assoc_plain(iou, alive, dvalid, conf, ctx))
    assert d2t[0] == 0 and d2t[1] == -1  # pure-IoU tie: first index


def test_ocr_rescues_after_coasting_drift():
    """A fast track loses detections; the KF prediction coasts far from
    the last seen position. When the object reappears where it was last
    SEEN, stage-1 predicted-IoU fails but OCR (last-observation IoU)
    recovers the identity. With use_ocr off the identity fragments."""
    seq = [(0.0, [(0, 0, 60, 40)], [0.9])]
    for f in range(1, 4):   # establish velocity: 20 px/frame rightward
        seq.append((1 / 30, [(20 * f, 0, 60 + 20 * f, 40)], [0.9]))
    for _ in range(5):      # occlusion: nothing detected, KF coasts
        seq.append((1 / 30, [], []))
    # reappears exactly where last seen (frame 3's box); the prediction
    # has coasted ~6 frames ahead by then — past IoU reach
    seq.append((1 / 30, [(60, 0, 120, 40)], [0.9]))

    got, want = _drive_both(seq, cfg=_cfg(max_staleness=0.5))
    _assert_ids_match(got, want)
    assert got[-1][0].track_id == 1  # identity recovered

    got, want = _drive_both(seq, cfg=_cfg(max_staleness=0.5,
                                          use_ocr=False))
    _assert_ids_match(got, want)
    assert got[-1][0].track_id == 2  # fragments without OCR


def test_oru_restores_observed_velocity():
    """After an occlusion gap, ORU's virtual trajectory yields a speed
    estimate consistent with the OBSERVED displacement over the gap —
    and matches the oracle's float64 ORU to f32 tolerance."""
    proj = _projector()
    cfg = _cfg(max_staleness=0.6, speed_window=2.0)
    seq = [(0.0, [(100, 300, 160, 340)], [0.9]),
           (1 / 30, [(104, 300, 164, 340)], [0.9]),
           (1 / 30, [(108, 300, 168, 340)], [0.9])]
    for _ in range(4):
        seq.append((1 / 30, [], []))
    seq.append((1 / 30, [(136, 300, 196, 340)], [0.9]))  # 4px/frame held

    got, want = _drive_both(seq, cfg=cfg, projector=proj)
    _assert_ids_match(got, want)
    g, w = got[-1][0], want[-1][0]
    assert g.track_id == 1
    assert w["speed_kmh"] is not None
    assert g.speed_kmh == pytest.approx(w["speed_kmh"], rel=1e-2, abs=0.05)
    assert g.distance_m == pytest.approx(w["distance"], rel=1e-3, abs=1e-3)


def test_random_stress_parity_vs_oracle():
    rng = np.random.default_rng(17)
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
    rng = np.random.default_rng(23)
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
    """build_device_step('ocsort') produces a step with the SortState
    contract, scannable like the SORT step (the fused-engine seam)."""
    import jax
    import jax.numpy as jnp

    step = build_device_step(_cfg())
    state = init_state(16)
    frames = 8
    boxes = np.zeros((frames, 4, 4), np.float32)
    conf = np.zeros((frames, 4), np.float32)
    valid = np.zeros((frames, 4), bool)
    for f in range(frames):
        if f in (3, 4):       # two-frame dropout mid-sequence
            continue
        boxes[f, 0] = (10 + 5 * f, 10, 70 + 5 * f, 60)
        conf[f, 0] = 0.9
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
    live = [f for f in range(frames) if f not in (3, 4)]
    assert all(ids[f] == 1 for f in live), ids  # identity through dropout


def test_engine_accepts_ocsort_backend():
    """Config path: the fused engine builds with tracking.backend ocsort
    and produces tracked detections."""
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 8, "conf_thres": 0.0, "imgsz": 64,
                   "classes_keep": []},
        "tracking": {"enabled": True, "backend": "ocsort",
                     "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.track_enabled
    frames = np.asarray(np.random.default_rng(0).integers(
        0, 255, (2, 64, 64, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    assert len(res) == 2
    assert any(d.track_id for r in res for d in r.detections)
