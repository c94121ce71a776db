"""BoT-SORT backend: two-stage + fused appearance cost + GMC composition.

Quality bar as for the other added backends (tests/test_deepsort.py,
tests/test_bytetrack.py): each property the backend claims must be
demonstrated against the backend that lacks it.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.track.appearance import box_embeddings
from roadvision_tpu.track.botsort import BotSortTracker, make_botsort_step
from roadvision_tpu.track.bytetrack import make_byte_step
from roadvision_tpu.track.sort_tpu import init_state


def _solid_frame(h=96, w=128, boxes_colors=()):
    img = np.full((h, w, 3), 30, np.uint8)
    for (x1, y1, x2, y2), color in boxes_colors:
        img[int(y1):int(y2), int(x1):int(x2)] = color
    return img


def _occlusion_scenario(last_color=(40, 40, 220)):
    """Object moves right, vanishes 3 frames, reappears STOPPED at its
    last seen spot — predicted IoU with the reappearance is 0 (the KF
    has coasted ahead), so only appearance can rescue the identity."""
    red = (40, 40, 220)
    frames, boxes_seq, valid_seq = [], [], []
    for x in [10, 30, 50]:
        box = np.array([[x, 40, x + 20, 60]], np.float32)
        frames.append(_solid_frame(boxes_colors=[(box[0], red)]))
        boxes_seq.append(box)
        valid_seq.append(np.array([True]))
    for _ in range(3):
        frames.append(_solid_frame())
        boxes_seq.append(np.zeros((1, 4), np.float32))
        valid_seq.append(np.array([False]))
    box = np.array([[50, 40, 70, 60]], np.float32)
    frames.append(_solid_frame(boxes_colors=[(box[0], last_color)]))
    boxes_seq.append(box)
    valid_seq.append(np.array([True]))
    return frames, boxes_seq, valid_seq


def _drive(step, frames, boxes_seq, valid_seq, with_emb=True, conf=0.9):
    state = init_state(16)
    first_id = last_id = None
    for i, (frame, boxes, valid) in enumerate(zip(frames, boxes_seq,
                                                  valid_seq)):
        b, v = jnp.asarray(boxes), jnp.asarray(valid)
        cls = jnp.zeros((boxes.shape[0],), jnp.int32)
        cf = jnp.full((boxes.shape[0],), conf, jnp.float32)
        ts = jnp.float32(0.1 * (i + 1))
        emb = box_embeddings(jnp.asarray(frame), b, v) if with_emb else None
        state, out = step(state, b, cls, cf, v, ts, None, emb)
        if valid[0]:
            tid = int(out.track_id[0])
            first_id = tid if first_id is None else first_id
            last_id = tid
    return first_id, last_id


KW = dict(max_staleness=2.0, speed_window=0.75)


def test_without_embeddings_equals_bytetrack():
    """emb=None degrades stage 1 to ByteTrack's IoU pass — outputs of
    the two steps are identical on a random masked stress sequence."""
    bot = make_botsort_step(**KW)
    byte = make_byte_step(**KW)
    rng = np.random.default_rng(7)
    sb, sy = init_state(12), init_state(12)
    for i in range(25):
        d = 6
        xy = rng.uniform(0, 90, (d, 2)).astype(np.float32)
        wh = rng.uniform(5, 25, (d, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        cls = jnp.asarray(rng.integers(0, 3, (d,)), jnp.int32)
        conf = jnp.asarray(rng.uniform(0.05, 1.0, (d,)), jnp.float32)
        valid = jnp.asarray(rng.random(d) < 0.8)
        ts = jnp.float32(0.1 * (i + 1))
        sb, ob = bot(sb, boxes, cls, conf, valid, ts, None)
        sy, oy = byte(sy, boxes, cls, conf, valid, ts, None)
        np.testing.assert_array_equal(np.asarray(ob.track_id),
                                      np.asarray(oy.track_id))
    np.testing.assert_array_equal(np.asarray(sb.ids), np.asarray(sy.ids))
    np.testing.assert_array_equal(np.asarray(sb.alive),
                                  np.asarray(sy.alive))


def test_appearance_rescues_identity_where_bytetrack_loses_it():
    frames, boxes_seq, valid_seq = _occlusion_scenario()
    by_first, by_last = _drive(make_byte_step(**KW), frames, boxes_seq,
                               valid_seq, with_emb=False)
    assert by_first != by_last        # motion-only two-stage fragments

    bo_first, bo_last = _drive(
        make_botsort_step(**KW, rescue_iou=0.0, app_thresh=0.6),
        frames, boxes_seq, valid_seq)
    assert bo_first == bo_last        # fused stage-1 cost holds it


def test_appearance_gate_blocks_different_object():
    frames, boxes_seq, valid_seq = _occlusion_scenario(
        last_color=(220, 60, 40))    # different-looking reappearance
    first, last = _drive(
        make_botsort_step(**KW, rescue_iou=0.0, app_thresh=0.6),
        frames, boxes_seq, valid_seq)
    assert first != last


def test_low_conf_dip_keeps_id_with_embeddings():
    """The ByteTrack property survives the appearance fusion: a
    confidence dip below track_high_thresh re-associates in the
    IoU-only second stage (appearance never sees low boxes)."""
    step = make_botsort_step(**KW, track_high_thresh=0.5,
                             track_low_thresh=0.1)
    state = init_state(16)
    red = (40, 40, 220)
    ids = []
    for i, (x, conf) in enumerate([(10, 0.9), (14, 0.9), (18, 0.2),
                                   (22, 0.2), (26, 0.9)]):
        box = np.array([[x, 40, x + 20, 60]], np.float32)
        frame = _solid_frame(boxes_colors=[(box[0], red)])
        b, v = jnp.asarray(box), jnp.asarray([True])
        emb = box_embeddings(jnp.asarray(frame), b, v)
        state, out = step(state, b, jnp.zeros((1,), jnp.int32),
                          jnp.full((1,), conf, jnp.float32), v,
                          jnp.float32(0.1 * (i + 1)), None, emb)
        ids.append(int(out.track_id[0]))
    assert len(set(ids)) == 1


def test_registry_and_engine_with_gmc():
    """Config path: backend botsort + gmc true — the engine computes
    descriptors AND feeds the camera shift into the same step."""
    from roadvision_tpu.runtime.engine import PipelineEngine
    from roadvision_tpu.track.registry import build_device_step

    step = build_device_step({"backend": "botsort"})
    assert getattr(step, "needs_embeddings", False)

    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "backend": "botsort", "gmc": True,
                     "new_track_thresh": 0.0, "track_high_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.gmc_enabled
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.track_id is not None for d in dets)
    assert float(jnp.abs(eng.sort_state.app).max()) > 0.0  # re-id memory
    assert eng._gmc_prev is not None                       # GMC carry


def test_host_api_botsort():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.track.registry import build_tracker

    trk = build_tracker({"backend": "botsort", "max_staleness": 1.0,
                         "new_track_thresh": 0.0,
                         "track_high_thresh": 0.0})
    assert isinstance(trk, BotSortTracker)
    out = trk.update([Detection(10, 10, 30, 30, 0.9, 2, "car")], 0.1)
    assert out[0].track_id == 1
    out = trk.update([Detection(12, 10, 32, 30, 0.9, 2, "car")], 0.2)
    assert out[0].track_id == 1
