"""Temporal gating (detect.temporal_gate): motion-adaptive inference.

On near-static scenes the engine skips the detector forward and coasts
the tracker on the last detections (runtime/engine.py build_coast_step —
the "Fast YOLO" pattern, PAPERS.md). Pinned here: the probe gates static
batches and never gates moving ones, identities persist through
coasting, the skip budget forces periodic full batches, and the config
validation rejects unsupported combinations.
"""
import numpy as np
import pytest

from roadvision_tpu.runtime.engine import PipelineEngine


def _engine(extra_detect=None, extra_tracking=None):
    det = {"enabled": True, "model": "missing.pt", "imgsz": 64,
           "conf_thres": 1e-6, "max_det": 8, "device": "cpu",
           "temporal_gate": {"enable": True, "max_skip_batches": 3}}
    det.update(extra_detect or {})
    trk = {"enabled": True, "backend": "sort"}
    trk.update(extra_tracking or {})
    return PipelineEngine({"detect": det, "tracking": trk,
                           "preprocess": {"enabled": False},
                           "tpu": {"batch_size": 2}})


def _batches(n, move=False, seed=0, b=2, h=48, w=64):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (h, w, 3), np.uint8)
    t = 0.0
    for i in range(n):
        frames = []
        for j in range(b):
            if move:
                shift = (i * b + j) * 5
                frames.append(np.roll(base, shift, axis=1))
            else:
                frames.append(base)
        ts = np.array([t, t + 0.033])
        t += 0.066
        yield np.stack(frames), ts


def test_static_scene_coasts_and_refreshes():
    eng = _engine()
    id_sets, coasted_per_batch = [], []
    prev = 0
    for frames, ts in _batches(8):
        res = eng.process_batch(frames, ts)
        coasted_per_batch.append(eng.gate_frames_coasted - prev)
        prev = eng.gate_frames_coasted
        ids = sorted(d.track_id for r in res for d in r.detections)
        id_sets.append(ids)
    # batch 1 is always full (no score yet); afterwards static batches
    # coast, with a full refresh forced after max_skip_batches=3
    assert coasted_per_batch[0] == 0
    assert eng.gate_frames_coasted > 0
    assert sum(1 for c in coasted_per_batch if c == 0) >= 2  # refreshes
    # at most 3 consecutive coasted batches
    run = 0
    for c in coasted_per_batch:
        run = run + 1 if c > 0 else 0
        assert run <= 3
    # identities persist through coasting (random-init detector still
    # emits a stable detection set on identical frames)
    if id_sets[0]:
        for ids in id_sets[1:]:
            assert ids == id_sets[0]


def test_moving_scene_never_coasts():
    eng = _engine()
    for frames, ts in _batches(4, move=True):
        eng.process_batch(frames, ts)
    assert eng.gate_frames_coasted == 0


def test_single_frame_batches_never_coast():
    eng = _engine()
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (1, 48, 64, 3), np.uint8)
    for i in range(3):
        eng.process_batch(frame, np.array([i * 0.033]))
    assert eng.gate_frames_coasted == 0


def test_gate_rejects_unsupported_combinations():
    with pytest.raises(ValueError, match="gmc"):
        _engine(extra_tracking={"gmc": True})
    with pytest.raises(ValueError, match="detect task"):
        _engine(extra_detect={"model": "missing-pose.pt"})
    with pytest.raises(ValueError, match="detect task"):
        _engine(extra_detect={"tiling": {"enable": True, "tile": 64}})
