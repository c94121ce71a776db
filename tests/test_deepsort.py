"""DeepSORT-style re-id backend: descriptor properties, occlusion
identity recovery vs plain SORT, no-embedding degradation, engine
integration, host API.

Beyond-reference tracking (the reference SORT is motion-only,
src/track/sort_tracker.py) — the quality bar mirrors
tests/test_backend_quality.py: the added backend must measurably beat
SORT on the failure mode it targets (identity through occlusion drift).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.track.appearance import EMB_DIM, box_embeddings
from roadvision_tpu.track.deepsort import (DeepSortTracker,
                                           make_deepsort_step)
from roadvision_tpu.track.sort_tpu import (_EMB_DIM, init_state,
                                           make_sort_step)


def _solid_frame(h=96, w=128, boxes_colors=()):
    img = np.full((h, w, 3), 30, np.uint8)
    for (x1, y1, x2, y2), color in boxes_colors:
        img[int(y1):int(y2), int(x1):int(x2)] = color
    return img


def test_emb_dim_consistent():
    assert EMB_DIM == _EMB_DIM


def test_box_embeddings_properties():
    red, blue = (40, 40, 220), (220, 60, 40)
    boxes = np.array([[10, 10, 40, 40], [60, 20, 100, 60],
                      [0, 0, 0, 0]], np.float32)
    frame = _solid_frame(boxes_colors=[(boxes[0], red), (boxes[1], blue)])
    valid = np.array([True, True, False])
    emb = np.asarray(box_embeddings(jnp.asarray(frame),
                                    jnp.asarray(boxes),
                                    jnp.asarray(valid)))
    # unit norm for valid, zeros for invalid
    np.testing.assert_allclose(np.linalg.norm(emb[0]), 1.0, atol=1e-5)
    assert np.abs(emb[2]).max() == 0.0
    # same-color crop elsewhere ≈ same descriptor; different color far
    frame2 = _solid_frame(boxes_colors=[((70, 50, 100, 80), red)])
    emb2 = np.asarray(box_embeddings(
        jnp.asarray(frame2), jnp.asarray([[70, 50, 100, 80]], np.float32),
        jnp.asarray([True])))
    assert float(emb[0] @ emb2[0]) > 0.95
    assert float(emb[1] @ emb2[0]) < 0.5


def _run_occlusion(step, frames, boxes_seq, valid_seq, with_emb=True):
    """Drive a single-object appear→occlude→reappear sequence; returns
    the ids emitted at the first and last frames."""
    state = init_state(16)
    first_id = last_id = None
    for i, (frame, boxes, valid) in enumerate(zip(frames, boxes_seq,
                                                  valid_seq)):
        b = jnp.asarray(boxes)
        v = jnp.asarray(valid)
        cls = jnp.zeros((boxes.shape[0],), jnp.int32)
        conf = jnp.full((boxes.shape[0],), 0.9, jnp.float32)
        ts = jnp.float32(0.1 * (i + 1))
        emb = box_embeddings(jnp.asarray(frame), b, v) if with_emb \
            else None
        state, out = step(state, b, cls, conf, v, ts, None, emb)
        if valid[0]:
            tid = int(out.track_id[0])
            if first_id is None:
                first_id = tid
            last_id = tid
    return first_id, last_id


def _occlusion_scenario():
    """Object moves right at 200 px/s, vanishes 3 frames, reappears
    STOPPED at its last seen spot — the KF prediction has coasted ~3 box
    widths ahead, so predicted IoU with the reappearance is 0."""
    red = (40, 40, 220)
    frames, boxes_seq, valid_seq = [], [], []
    xs = [10, 30, 50]                       # 3 observed frames
    for x in xs:
        box = np.array([[x, 40, x + 20, 60]], np.float32)
        frames.append(_solid_frame(boxes_colors=[(box[0], red)]))
        boxes_seq.append(box)
        valid_seq.append(np.array([True]))
    for _ in range(3):                      # occluded
        frames.append(_solid_frame())
        boxes_seq.append(np.zeros((1, 4), np.float32))
        valid_seq.append(np.array([False]))
    box = np.array([[50, 40, 70, 60]], np.float32)   # reappears, stopped
    frames.append(_solid_frame(boxes_colors=[(box[0], red)]))
    boxes_seq.append(box)
    valid_seq.append(np.array([True]))
    return frames, boxes_seq, valid_seq


def test_appearance_rescues_identity_where_sort_loses_it():
    frames, boxes_seq, valid_seq = _occlusion_scenario()
    kw = dict(iou_threshold=0.3, max_staleness=2.0, speed_window=0.75)

    sort_first, sort_last = _run_occlusion(
        make_sort_step(**kw), frames, boxes_seq, valid_seq,
        with_emb=False)
    assert sort_first != sort_last      # KF drift: SORT fragments the id

    ds_first, ds_last = _run_occlusion(
        make_deepsort_step(**kw, rescue_iou=0.0, app_thresh=0.6),
        frames, boxes_seq, valid_seq)
    assert ds_first == ds_last          # appearance rescue holds it


def test_deepsort_without_embeddings_matches_sort_association():
    """emb=None degrades to the motion-only association — the id
    fragmentation of plain SORT reappears."""
    frames, boxes_seq, valid_seq = _occlusion_scenario()
    kw = dict(iou_threshold=0.3, max_staleness=2.0, speed_window=0.75)
    first, last = _run_occlusion(
        make_deepsort_step(**kw, rescue_iou=0.0), frames, boxes_seq,
        valid_seq, with_emb=False)
    assert first != last


def test_appearance_gate_blocks_different_object():
    """A DIFFERENT-looking object appearing at the same off-prediction
    spot must NOT inherit the occluded track's id."""
    frames, boxes_seq, valid_seq = _occlusion_scenario()
    blue = (220, 60, 40)
    box = np.asarray(boxes_seq[-1])
    frames[-1] = _solid_frame(boxes_colors=[(box[0], blue)])
    kw = dict(iou_threshold=0.3, max_staleness=2.0, speed_window=0.75)
    first, last = _run_occlusion(
        make_deepsort_step(**kw, rescue_iou=0.0, app_thresh=0.6),
        frames, boxes_seq, valid_seq)
    assert first != last


def test_engine_deepsort_backend():
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "backend": "deepsort",
                     "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert getattr(eng._sort_step, "needs_embeddings", False)
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.track_id is not None for d in dets)
    # the appearance memory was populated on device
    assert float(jnp.abs(eng.sort_state.app).max()) > 0.0


def test_host_api_deepsort():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.track.registry import build_tracker

    trk = build_tracker({"backend": "deepsort", "max_staleness": 1.0,
                         "iou_threshold": 0.3, "new_track_thresh": 0.0})
    assert isinstance(trk, DeepSortTracker)
    d = [Detection(10, 10, 30, 30, 0.9, 2, "car")]
    out = trk.update(d, 0.1)
    assert out[0].track_id == 1
    out = trk.update([Detection(12, 10, 32, 30, 0.9, 2, "car")], 0.2)
    assert out[0].track_id == 1
