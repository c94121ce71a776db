"""Long-sequence SORT parity stress: 60-frame random scenarios with
occlusions, births, deaths and jitter — exact ID parity vs the float64
scalar oracle, plus distance/speed tolerance with a projector."""
import numpy as np
import pytest

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.geometry import build_projector
from roadvision_tpu.track import build_tracker
from tests.oracles.sort_oracle import SortOracle


def _projector():
    img = [[0, 480], [640, 480], [0, 80], [640, 80]]
    world = [[0.0, 0.0], [6.4, 0.0], [0.0, 40.0], [6.4, 40.0]]
    return build_projector({"projector": {
        "type": "homography", "image_points": img, "world_points": world,
        "origin": [3.2, -1.0], "max_distance": 60.0}})


def _scenario(seed: int, frames: int = 60, objects: int = 8):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(40, 500, (objects, 2))
    vel = rng.uniform(-6, 6, (objects, 2))
    size = rng.uniform(25, 60, (objects, 2))
    birth = rng.randint(0, frames // 2, objects)
    death = birth + rng.randint(8, frames, objects)
    occl_start = rng.randint(5, frames - 5, objects)
    occl_len = rng.randint(0, 4, objects)
    seq = []
    for f in range(frames):
        boxes = []
        for k in range(objects):
            if not (birth[k] <= f < death[k]):
                continue
            if occl_start[k] <= f < occl_start[k] + occl_len[k]:
                continue  # temporary occlusion
            x, y = pos[k] + vel[k] * (f - birth[k])
            jitter = rng.randn(2) * 1.5
            x1, y1 = x + jitter[0], y + jitter[1]
            boxes.append((x1, y1, x1 + size[k, 0], y1 + size[k, 1]))
        seq.append(boxes)
    return seq


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_long_random_sequence_id_parity(seed):
    cfg = {"backend": "sort", "max_staleness": 0.5, "min_hits": 3,
           "iou_threshold": 0.3, "speed_window": 0.75,
           "det_capacity": 16, "track_slots": 32}
    tracker = build_tracker(cfg)
    oracle = SortOracle(0.5, 3, 0.3, 0.75)
    proj = _projector()
    t0 = 1_700_000_000.0
    mismatches = 0
    for f, boxes in enumerate(_scenario(seed)):
        dets = [Detection(*b, 0.8, 2, "car") for b in boxes]
        got = tracker.update(dets, t0 + f / 30.0, projector=proj)
        want = oracle.update([tuple(b) for b in boxes], f / 30.0,
                             projector=proj)
        for g, w in zip(got, want):
            assert g.track_id == w["id"], (seed, f, g.track_id, w["id"])
            if (g.distance_m is None) != (w["distance"] is None):
                mismatches += 1
            elif g.distance_m is not None:
                assert abs(g.distance_m - w["distance"]) < 0.05
            if g.speed_kmh is not None and w["speed_kmh"] is not None:
                assert abs(g.speed_kmh - w["speed_kmh"]) \
                    < 0.05 * max(1.0, w["speed_kmh"])
    assert mismatches == 0
