"""SORT parity: vectorized TPU tracker vs the scalar float64 oracle.

Scenarios pin the §2.2 quirks: immediate ID assignment in det order, greedy
(not Hungarian) association, staleness pruning, windowed speed × 3.6,
max_distance clamping, coasting tracks emitting nothing.
"""
import numpy as np
import pytest

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.geometry import build_projector
from roadvision_tpu.track import SortTracker, build_tracker, iou_matrix
from tests.oracles.sort_oracle import SortOracle, iou as iou_scalar


def _dets(boxes, cls_id=2, conf=0.9):
    return [Detection(b[0], b[1], b[2], b[3], conf, cls_id, "car")
            for b in boxes]


def _cfg(**over):
    cfg = {"backend": "sort", "max_staleness": 1.2, "min_hits": 3,
           "iou_threshold": 0.35, "speed_window": 0.8,
           "det_capacity": 16, "track_slots": 16}
    cfg.update(over)
    return cfg


def _projector():
    img = [[0, 480], [640, 480], [0, 80], [640, 80]]
    world = [[0.0, 0.0], [6.4, 0.0], [0.0, 40.0], [6.4, 40.0]]
    return build_projector({"projector": {
        "type": "homography", "image_points": img, "world_points": world,
        "origin": [3.2, -2.0], "max_distance": 35.0}})


def _drive_both(sequences, cfg=None, projector=None, t0=1700000000.0):
    """Run tracker + oracle over [(dt, boxes), ...]; return per-frame lists."""
    cfg = cfg or _cfg()
    tracker = build_tracker(cfg)
    oracle = SortOracle(cfg["max_staleness"], cfg["min_hits"],
                        cfg["iou_threshold"], cfg["speed_window"])
    got_all, want_all = [], []
    t = t0
    for dt, boxes in sequences:
        t += dt
        dets = tracker.update(_dets(boxes), t, projector=projector)
        want = oracle.update([tuple(b) for b in boxes], t - t0,
                             projector=projector)
        got_all.append(dets)
        want_all.append(want)
    return got_all, want_all


def _assert_ids_match(got_all, want_all):
    for f, (got, want) in enumerate(zip(got_all, want_all)):
        assert len(got) == len(want)
        for i, (g, w) in enumerate(zip(got, want)):
            assert g.track_id == w["id"], (
                f"frame {f} det {i}: got id {g.track_id}, want {w['id']}")


def test_ids_assigned_immediately_in_det_order():
    got, want = _drive_both([(0.0, [(10, 10, 50, 50), (100, 100, 160, 150)])])
    _assert_ids_match(got, want)
    assert got[0][0].track_id == 1 and got[0][1].track_id == 2


def test_track_continuity_two_moving_objects():
    seq = []
    for f in range(10):
        seq.append((1 / 30, [(10 + 4 * f, 10, 50 + 4 * f, 50),
                             (300 - 5 * f, 200, 360 - 5 * f, 250)]))
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    # ids stable over time
    assert all(fr[0].track_id == 1 for fr in got)
    assert all(fr[1].track_id == 2 for fr in got)


def test_missed_then_reacquired_within_staleness():
    seq = [(0.0, [(10, 10, 50, 50)]),
           (1 / 30, []),                       # coast
           (1 / 30, [(12, 10, 52, 50)])]       # reappears → same id
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    assert got[2][0].track_id == 1


def test_stale_track_can_still_match_before_pruning():
    # association runs BEFORE pruning (:228-231 vs :271-276): a stale track
    # that still overlaps the det is revived, keeping its id
    seq = [(0.0, [(10, 10, 50, 50)]),
           (2.0, [(10, 10, 50, 50)])]          # 2.0 s > max_staleness 1.2
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    assert got[1][0].track_id == 1


def test_staleness_pruning_spawns_new_id():
    # stale track + non-overlapping det → track pruned, det gets a new id,
    # and a third frame overlapping the ORIGINAL position must not revive id 1
    seq = [(0.0, [(10, 10, 50, 50)]),
           (2.0, [(300, 300, 360, 350)]),      # no overlap; old track pruned
           (1 / 30, [(10, 10, 50, 50)])]       # old spot → brand-new id
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)
    assert got[1][0].track_id == 2
    assert got[2][0].track_id == 3


def test_greedy_tie_breaking_matches_oracle():
    # two tracks and two dets arranged so greedy (global max first) differs
    # from det-order matching
    seq = [(0.0, [(0, 0, 40, 40), (100, 0, 140, 40)])]
    # second frame: det0 overlaps BOTH tracks; det1 overlaps track1 more
    seq.append((1 / 30, [(90, 0, 130, 40), (98, 2, 138, 42)]))
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)


def test_crossing_objects_parity():
    seq = []
    for f in range(12):
        a = (10 + 8 * f, 100, 60 + 8 * f, 150)      # moving right
        b = (110 - 8 * f, 102, 160 - 8 * f, 152)    # moving left (crosses)
        seq.append((1 / 30, [a, b]))
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)


def test_distance_speed_with_projector():
    proj = _projector()
    seq = []
    for f in range(8):
        # object approaching: bottom edge moving down → closer
        y2 = 200 + 20 * f
        seq.append((1 / 30, [(300, y2 - 80, 340, y2)]))
    got, want = _drive_both(seq, projector=proj)
    _assert_ids_match(got, want)
    for fr_got, fr_want in zip(got, want):
        g, w = fr_got[0], fr_want[0]
        assert (g.distance_m is None) == (w["distance"] is None)
        if g.distance_m is not None:
            assert abs(g.distance_m - w["distance"]) < 1e-2
        assert (g.speed_kmh is None) == (w["speed_kmh"] is None)
        if g.speed_kmh is not None:
            assert abs(g.speed_kmh - w["speed_kmh"]) / max(1.0, w["speed_kmh"]) < 1e-2
    # first frame has no speed (single history point)
    assert got[0][0].speed_kmh is None
    assert got[1][0].speed_kmh is not None


def test_max_distance_clamp_through_tracker():
    proj = _projector()
    # far object near horizon → distance clamped to 35
    got, want = _drive_both([(0.0, [(300, 60, 340, 90)])], projector=proj)
    _assert_ids_match(got, want)
    assert got[0][0].distance_m == pytest.approx(35.0, abs=1e-3)


def test_speed_window_expiry():
    proj = _projector()
    # slow frame rate: window 0.8 s, frames 0.3 s apart → only ~3 in window
    seq = [(0.3, [(300, 150 + 30 * f, 340, 230 + 30 * f)]) for f in range(8)]
    got, want = _drive_both(seq, projector=proj)
    _assert_ids_match(got, want)
    for fr_got, fr_want in zip(got[2:], want[2:]):
        assert abs(fr_got[0].speed_kmh - fr_want[0]["speed_kmh"]) \
            / fr_want[0]["speed_kmh"] < 1e-2


def test_many_objects_random_parity():
    rng = np.random.RandomState(42)
    seq = []
    pos = rng.uniform(50, 400, (6, 2))
    vel = rng.uniform(-5, 5, (6, 2))
    for f in range(15):
        boxes = []
        for k in range(6):
            if f > 10 and k in (1, 3):
                continue  # objects leave
            if f < 3 and k == 5:
                continue  # late entry
            x, y = pos[k] + vel[k] * f
            boxes.append((x, y, x + 45, y + 40))
        seq.append((1 / 30, boxes))
    got, want = _drive_both(seq)
    _assert_ids_match(got, want)


def test_iou_matrix_matches_scalar():
    rng = np.random.RandomState(0)
    a = rng.uniform(0, 100, (7, 4)).astype(np.float32)
    b = rng.uniform(0, 100, (5, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]
    b[:, 2:] += b[:, :2]
    got = np.asarray(iou_matrix(a, b))
    for i in range(7):
        for j in range(5):
            assert abs(got[i, j] - iou_scalar(a[i], b[j])) < 1e-5


def test_detections_cleared_on_entry():
    tracker = build_tracker(_cfg())
    d = Detection(10, 10, 50, 50, 0.9, 2, "car", track_id=99,
                  distance_m=1.0, speed_kmh=2.0)
    out = tracker.update([d], 1.0)
    assert out[0].track_id == 1  # fresh id, stale enrichment cleared
    assert out[0].distance_m is None and out[0].speed_kmh is None


def test_capacity_overflow_raises():
    tracker = SortTracker(_cfg(det_capacity=2))
    with pytest.raises(ValueError):
        tracker.update(_dets([(0, 0, 1, 1)] * 3), 0.0)


def test_parallel_greedy_matches_sequential_reference():
    """The mutual-maximum rounds must equal the sequential global-argmax
    greedy exactly — including tie grids (np.argmax flat-first order)."""
    import jax.numpy as jnp

    from roadvision_tpu.track.sort_tpu import greedy_associate

    def sequential(iou, alive, dvalid, thresh):
        mat = np.where(alive[:, None] & dvalid[None, :], iou, -1.0).copy()
        out = np.full(iou.shape[1], -1, np.int32)
        for _ in range(min(mat.shape)):
            idx = int(np.argmax(mat))
            t, d = divmod(idx, mat.shape[1])
            if mat[t, d] < thresh or mat[t, d] <= -0.5:
                break
            out[d] = t
            mat[t, :] = -1.0
            mat[:, d] = -1.0
        return out

    rng = np.random.RandomState(0)
    for trial in range(40):
        T, D = rng.randint(1, 12), rng.randint(1, 12)
        # quantized values force frequent exact ties
        iou = rng.randint(0, 5, (T, D)).astype(np.float32) / 4.0
        alive = rng.rand(T) < 0.8
        dvalid = rng.rand(D) < 0.8
        thresh = float(rng.choice([0.25, 0.5]))
        want = sequential(iou, alive, dvalid, thresh)
        got = np.asarray(greedy_associate(
            jnp.asarray(iou), jnp.asarray(alive), jnp.asarray(dvalid),
            thresh))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")

    # all-equal grid: the canonical worst-case tie
    iou = np.full((4, 4), 0.5, np.float32)
    want = sequential(iou, np.ones(4, bool), np.ones(4, bool), 0.3)
    got = np.asarray(greedy_associate(
        jnp.asarray(iou), jnp.ones(4, bool), jnp.ones(4, bool), 0.3))
    np.testing.assert_array_equal(got, want)
