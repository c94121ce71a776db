"""Traffic analytics (roadvision_tpu/analytics.py): directional line
counting, segment-extent gating, id-recycling hygiene, zone
occupancy/dwell, config aggregate + overlay."""
import numpy as np

from roadvision_tpu.analytics import Analytics, CountingLine, Zone
from roadvision_tpu.detect.types import Detection


def _det(cx, y2, tid, cls_id=2, cls_name="car", w=20.0, h=16.0):
    return Detection(cx - w / 2, y2 - h, cx + w / 2, y2, 0.9, cls_id,
                     cls_name, track_id=tid)


def test_line_counts_both_directions_once():
    ln = CountingLine("main", (0, 100), (200, 100))
    # downward crossing (bottom-center y2: 90 → 110)
    assert ln.update([_det(50, 90, tid=1)], 0.1) == []
    ev = ln.update([_det(50, 110, tid=1)], 0.2)
    assert len(ev) == 1 and ev[0]["track_id"] == 1
    assert ev[0]["direction"] == "pos"
    # lingering on the same side: no double count
    assert ln.update([_det(50, 115, tid=1)], 0.3) == []
    # back up: the opposite direction
    ev = ln.update([_det(50, 92, tid=1)], 0.4)
    assert len(ev) == 1 and ev[0]["direction"] == "neg"
    s = ln.summary()
    assert s["total"] == 2 and s["pos"] == 1 and s["neg"] == 1
    assert s["by_class"]["car"] == {"pos": 1, "neg": 1}


def test_crossing_outside_segment_extent_not_counted():
    ln = CountingLine("short", (0, 100), (40, 100))
    ln.update([_det(120, 90, tid=3)], 0.1)
    assert ln.update([_det(120, 110, tid=3)], 0.2) == []
    assert ln.summary()["total"] == 0


def test_same_side_wiggle_not_counted():
    ln = CountingLine("main", (0, 100), (200, 100))
    for i, y in enumerate([80, 95, 85, 98, 90]):
        assert ln.update([_det(50, y, tid=1)], 0.1 * (i + 1)) == []
    assert ln.summary()["total"] == 0


def test_stale_id_dropped_before_reuse():
    ln = CountingLine("main", (0, 100), (200, 100), stale_after=1.0)
    ln.update([_det(50, 90, tid=7)], 0.0)     # side A, then vanishes
    ln.update([], 5.0)                        # idle sweep far later
    # id 7 recycled to a NEW object already past the line: the stale
    # side record is gone, so its first observation cannot count
    assert ln.update([_det(150, 110, tid=7)], 5.1) == []
    assert ln.summary()["total"] == 0


def test_class_filter():
    ln = CountingLine("cars", (0, 100), (200, 100), classes=[2])
    ln.update([_det(50, 90, tid=1, cls_id=0, cls_name="person")], 0.1)
    ln.update([_det(50, 110, tid=1, cls_id=0, cls_name="person")], 0.2)
    assert ln.summary()["total"] == 0


def test_zone_occupancy_and_dwell():
    z = Zone("box", [(0, 0), (100, 0), (100, 100), (0, 100)])
    assert z.update([_det(150, 50, tid=1)], 0.0) == []    # outside
    ev = z.update([_det(50, 50, tid=1)], 1.0)
    assert ev == [{"zone": "box", "track_id": 1, "event": "enter",
                   "ts": 1.0}]
    assert z.occupancy == 1
    ev = z.update([_det(150, 50, tid=1)], 3.5)
    assert ev[0]["event"] == "exit" and abs(ev[0]["dwell_s"] - 2.5) < 1e-9
    assert z.occupancy == 0
    s = z.summary()
    assert s["entered_total"] == 1 and s["completed_visits"] == 1
    assert abs(s["mean_dwell_s"] - 2.5) < 1e-9


def test_zone_vanished_identity_closes_visit():
    z = Zone("box", [(0, 0), (100, 0), (100, 100), (0, 100)],
             stale_after=1.0)
    z.update([_det(50, 50, tid=4)], 0.0)       # enters
    z.update([_det(60, 50, tid=4)], 0.5)       # last seen inside
    ev = z.update([], 2.0)                     # long gone
    assert ev and ev[0]["event"] == "exit"
    assert abs(ev[0]["dwell_s"] - 0.5) < 1e-9
    assert z.occupancy == 0


def test_aggregate_from_config_and_overlay():
    ana = Analytics({
        "stale_after": 5.0,
        "lines": [{"name": "main", "p1": [0, 100], "p2": [200, 100]}],
        "zones": [{"name": "j", "polygon": [[0, 0], [100, 0],
                                            [100, 100], [0, 100]]}],
    })
    ana.update([_det(50, 90, tid=1)], 0.1)
    ev = ana.update([_det(50, 110, tid=1)], 0.2)
    assert any("line" in e for e in ev)
    s = ana.summary()
    assert s["lines"][0]["total"] == 1
    assert s["zones"][0]["name"] == "j"

    img = np.zeros((150, 250, 3), np.uint8)
    ana.overlay(img)
    # x=150 is on the counting line but past the zone's cyan edges
    assert img[100, 150].tolist() == [0, 220, 220]
    assert (img != 0).any(axis=-1).sum() > 300      # zone edges + text


def test_detections_without_ids_ignored():
    ln = CountingLine("main", (0, 100), (200, 100))
    d = _det(50, 90, tid=None)
    ln.update([d], 0.1)
    d2 = _det(50, 110, tid=None)
    assert ln.update([d2], 0.2) == []


def _sdet(cx, y2, tid, speed=None, w=20.0, h=16.0):
    d = _det(cx, y2, tid=tid, w=w, h=h)
    d.speed_kmh = speed
    return d


def test_zone_speed_statistics():
    from roadvision_tpu.analytics import Zone
    z = Zone("j", [(0, 0), (100, 0), (100, 100), (0, 100)])
    # inside with speeds 10..100 km/h; one outside sample ignored
    for i, spd in enumerate(range(10, 101, 10)):
        z.update([_sdet(50, 50, tid=1, speed=float(spd))], 0.1 * i)
    z.update([_sdet(500, 500, tid=2, speed=999.0)], 2.0)
    s = z.summary()["speed"]
    assert s["samples"] == 10
    assert abs(s["mean_kmh"] - 55.0) < 1e-9
    assert s["max_kmh"] == 100.0
    # nearest-rank p85 of [10..100] → round(0.85*10)=9th value = 90
    assert s["p85_kmh"] == 90.0
    # no samples → no speed key
    assert "speed" not in Zone("e", [(0, 0), (1, 0), (1, 1)]).summary()


def test_stopped_vehicle_event_and_resume():
    from roadvision_tpu.analytics import StoppedMonitor
    m = StoppedMonitor(after_s=1.0, move_frac=0.1)
    # still for 1.2 s → exactly one stopped event
    evs = []
    for i in range(7):
        evs += m.update([_sdet(50, 50, tid=3)], 0.2 * i)
    stops = [e for e in evs if e["event"] == "stopped"]
    assert len(stops) == 1 and stops[0]["track_id"] == 3
    assert m.summary()["currently_stopped"] == 1
    # moves off (> move_frac * diag ≈ 2.56 px) → resumed once
    evs = m.update([_sdet(80, 50, tid=3)], 1.6)
    assert [e["event"] for e in evs] == ["resumed"]
    assert m.summary()["currently_stopped"] == 0
    assert m.summary()["stop_events_total"] == 1


def test_moving_vehicle_never_flags():
    from roadvision_tpu.analytics import StoppedMonitor
    m = StoppedMonitor(after_s=0.5, move_frac=0.05)
    evs = []
    for i in range(10):
        evs += m.update([_sdet(50 + 10 * i, 50, tid=4)], 0.2 * i)
    assert evs == []


def test_speed_gate_blocks_stillness():
    """A distant object can be pixel-still yet fast — the projector's
    speed overrides the pixel heuristic."""
    from roadvision_tpu.analytics import StoppedMonitor
    m = StoppedMonitor(after_s=0.5, min_speed_kmh=3.0)
    evs = []
    for i in range(8):
        evs += m.update([_sdet(50, 50, tid=5, speed=40.0)], 0.2 * i)
    assert evs == []


def test_stopped_polygon_and_class_gating():
    from roadvision_tpu.analytics import StoppedMonitor
    poly = [(0, 0), (100, 0), (100, 100), (0, 100)]
    m = StoppedMonitor(after_s=0.4, polygon=poly, classes=[2])
    evs = []
    for i in range(5):
        evs += m.update([_sdet(500, 500, tid=6),       # outside polygon
                         _det(50, 50, tid=7, cls_id=0)], 0.2 * i)
    assert evs == []
    for i in range(5):
        evs += m.update([_det(50, 50, tid=8, cls_id=2)], 1.0 + 0.2 * i)
    assert [e["event"] for e in evs] == ["stopped"]


def test_aggregate_stopped_config_and_overlay():
    ana = Analytics({"stopped": {"enable": True, "after_s": 0.4}})
    for i in range(5):
        ana.update([_det(50, 50, tid=9)], 0.2 * i)
    s = ana.summary()
    assert s["stopped"]["currently_stopped"] == 1
    img = np.zeros((150, 250, 3), np.uint8)
    ana.overlay(img)
    assert (img == np.array([40, 40, 230])).all(axis=-1).any()


def test_wrong_way_alerting():
    ln = CountingLine("oneway", (0, 100), (200, 100), wrong_way="neg")
    # legal direction (pos): counted, no violation flag
    ln.update([_det(50, 90, tid=1)], 0.1)
    ev = ln.update([_det(50, 110, tid=1)], 0.2)
    assert ev and "wrong_way" not in ev[0]
    # wrong way (neg): flagged
    ln.update([_det(80, 110, tid=2)], 0.3)
    ev = ln.update([_det(80, 90, tid=2)], 0.4)
    assert ev and ev[0]["wrong_way"] is True
    s = ln.summary()
    assert s["wrong_way_total"] == 1 and s["total"] == 2
    # config plumbing + validation
    ana = Analytics({"lines": [{"name": "x", "p1": [0, 0], "p2": [1, 0],
                                "wrong_way": "pos"}]})
    assert ana.lines[0].wrong_way == "pos"
    import pytest
    with pytest.raises(ValueError, match="wrong_way"):
        CountingLine("bad", (0, 0), (1, 0), wrong_way="up")


def test_zone_speeding_events_once_per_visit():
    from roadvision_tpu.analytics import Zone
    z = Zone("j", [(0, 0), (100, 0), (100, 100), (0, 100)],
             speed_limit_kmh=50.0)
    evs = []
    # inside, accelerating past the limit: one event at first violation
    for i, spd in enumerate((30.0, 55.0, 80.0)):
        evs += z.update([_sdet(50, 50, tid=1, speed=spd)], 0.1 * (i + 1))
    sp = [e for e in evs if e.get("event") == "speeding"]
    assert len(sp) == 1
    assert sp[0]["speed_kmh"] == 55.0 and sp[0]["limit_kmh"] == 50.0
    # exits and re-enters fast: a new visit can flag again
    z.update([_sdet(500, 500, tid=1, speed=80.0)], 0.4)
    evs = z.update([_sdet(50, 50, tid=1, speed=80.0)], 0.5)
    assert sum(1 for e in evs if e.get("event") == "speeding") == 1
    assert z.summary()["speeding_total"] == 2
    # no limit configured → no speeding key
    z2 = Zone("free", [(0, 0), (1, 0), (1, 1)])
    assert "speeding_total" not in z2.summary()


def test_analytics_jsonl_event_log(tmp_path):
    import json
    log_path = tmp_path / "events.jsonl"
    ana = Analytics({
        "log_path": str(log_path),
        "lines": [{"name": "main", "p1": [0, 100], "p2": [200, 100]}],
    })
    ana.update([_det(50, 90, tid=1)], 0.1)
    ana.update([_det(50, 110, tid=1)], 0.2)
    ana.close()
    rows = [json.loads(ln) for ln in log_path.read_text().splitlines()]
    assert len(rows) == 1
    assert rows[0]["line"] == "main" and rows[0]["track_id"] == 1
