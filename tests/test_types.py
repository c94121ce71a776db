"""Detection dataclass + SoA round-trip."""
import numpy as np

from roadvision_tpu.detect.types import COCO_NAMES, Detection, DetectionBatch


def test_detection_fields_match_reference_contract():
    d = Detection(1.0, 2.0, 3.0, 4.0, 0.9, 2, "car")
    assert d.track_id is None and d.distance_m is None and d.speed_kmh is None
    assert COCO_NAMES[2] == "car" and COCO_NAMES[7] == "truck"
    assert len(COCO_NAMES) == 80


def test_soa_roundtrip():
    dets = [
        Detection(0, 0, 10, 10, 0.9, 2, "car", track_id=1, distance_m=5.0),
        Detection(5, 5, 20, 25, 0.5, 7, "truck", speed_kmh=36.0),
    ]
    batch = DetectionBatch.from_detections(dets, capacity=8)
    assert batch.capacity == 8
    assert batch.valid.sum() == 2
    back = batch.to_detections()
    assert len(back) == 2
    assert back[0].track_id == 1 and back[0].distance_m == 5.0
    assert back[0].speed_kmh is None
    assert back[1].track_id is None and back[1].speed_kmh == 36.0
    assert back[1].cls_name == "truck"


def test_soa_overflow_truncates():
    dets = [Detection(i, i, i + 1, i + 1, 0.5, 0, "person") for i in range(10)]
    batch = DetectionBatch.from_detections(dets, capacity=4)
    assert batch.valid.sum() == 4
