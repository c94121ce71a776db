"""Camera-motion compensation: phase-correlation shift recovery, the
first-frame guard, identity retention through a camera jolt (step and
engine level), and the no-GMC control.

Beyond-reference tracking support (the reference assumes a fixed
camera); track/gmc.py is the translation-model analogue of BoT-SORT's
GMC, formulated as batched FFTs on device.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.track.gmc import (GMC_SIZE, batch_shifts,
                                      gray_thumbnail, phase_shift)
from roadvision_tpu.track.sort_tpu import init_state, make_sort_step


def _textured(h=128, w=128, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (h // 8, w // 8, 3), np.uint8)
    return np.repeat(np.repeat(base, 8, 0), 8, 1)


def test_phase_shift_recovers_known_roll():
    frame = _textured()
    g0 = gray_thumbnail(jnp.asarray(frame))
    for dx, dy in ((24, 0), (0, -16), (12, 20), (-8, -8)):
        rolled = np.roll(np.roll(frame, dy, axis=0), dx, axis=1)
        g1 = gray_thumbnail(jnp.asarray(rolled))
        got = np.asarray(phase_shift(g0, g1))
        np.testing.assert_allclose(got, [dx, dy], atol=1.01)


def test_batch_shifts_first_frame_guard():
    frame = _textured(seed=1)
    g = gray_thumbnail(jnp.asarray(frame))
    grays = jnp.stack([g, g])
    # prev invalid (first batch ever): frame-0 shift forced to 0
    sh = np.asarray(batch_shifts(jnp.zeros_like(g), grays,
                                 jnp.float32(0.0), (1, 1)))
    assert np.abs(sh[0]).max() == 0.0
    assert np.abs(sh[1]).max() <= 1.0      # identical frames: no shift


def _jolt_scenario(jolt=40):
    """Stationary bright object on a textured background; the camera
    jolts ``jolt`` px right between frames 3 and 4 (whole scene and the
    object shift together)."""
    h = w = 128
    bg = _textured(h, w, seed=2)
    box0 = np.array([30.0, 50.0, 54.0, 74.0], np.float32)
    frames, boxes = [], []
    for i in range(5):
        off = jolt if i >= 3 else 0
        img = np.roll(bg, off, axis=1).copy()
        b = box0 + np.array([off, 0, off, 0], np.float32)
        img[int(b[1]):int(b[3]), int(b[0]):int(b[2])] = (250, 250, 250)
        frames.append(img)
        boxes.append(b[None])
    return frames, boxes


def _run(frames, boxes, with_gmc):
    step = make_sort_step(0.3, 2.0, 0.75)
    state = init_state(8)
    ids = []
    prev_g = None
    for i, (frame, b) in enumerate(zip(frames, boxes)):
        g = gray_thumbnail(jnp.asarray(frame))
        shift = None
        if with_gmc and prev_g is not None:
            shift = phase_shift(prev_g, g)      # 128×128: scale 1
        prev_g = g
        state, out = step(state, jnp.asarray(b),
                          jnp.zeros((1,), jnp.int32),
                          jnp.full((1,), 0.9), jnp.asarray([True]),
                          jnp.float32(0.1 * (i + 1)), None, None, shift)
        ids.append(int(out.track_id[0]))
    return ids


def test_gmc_holds_identity_through_camera_jolt():
    frames, boxes = _jolt_scenario(jolt=40)
    ids_plain = _run(frames, boxes, with_gmc=False)
    assert ids_plain[-1] != ids_plain[0]    # 40px jolt: IoU 0, new id
    ids_gmc = _run(frames, boxes, with_gmc=True)
    assert ids_gmc[-1] == ids_gmc[0]        # compensated: same id
    assert len(set(ids_gmc)) == 1


def test_multi_engine_gmc_carry():
    """GMC under the sharded multi-stream engine: per-stream thumbnail
    carry (S, G, G), sharded over the mesh, advancing across batches."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from roadvision_tpu.config import DEFAULTS, merge
    from roadvision_tpu.runtime import MultiStreamEngine

    s, b, h, w = 8, 2, 96, 128
    cfg = merge(DEFAULTS, {
        "camera": {"width": w, "height": h,
                   "sources": [f"synthetic:{2 + i}" for i in range(s)]},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt",
                   "device": "cpu", "max_det": 4, "imgsz": 64,
                   "classes_keep": [], "conf_thres": 0.0},
        "tracking": {"enabled": True, "gmc": True},
        "tpu": {"batch_size": b, "track_slots": 8,
                "mesh": {"enable": True, "axis": "data"}},
    })
    eng = MultiStreamEngine(cfg, num_streams=s)
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (s, b, h, w, 3)), np.uint8)
    ts = np.tile(np.arange(b, dtype=np.float64)[None] / 30.0, (s, 1))
    res = eng.process_batch(frames, ts)
    assert len(res) == s and len(res[0]) == b
    assert eng._gmc_prev is not None
    assert eng._gmc_prev.shape == (s, GMC_SIZE, GMC_SIZE)
    g1 = np.asarray(eng._gmc_prev)
    frames2 = np.asarray(rng.integers(0, 255, (s, b, h, w, 3)), np.uint8)
    eng.process_batch(frames2, ts + b / 30.0)
    assert np.abs(np.asarray(eng._gmc_prev) - g1).max() > 0.0


def test_engine_gmc_config_path():
    from roadvision_tpu.runtime.engine import PipelineEngine

    frames, boxes = _jolt_scenario(jolt=40)

    def make_engine(gmc):
        return PipelineEngine({
            "tpu": {"batch_size": 1, "track_slots": 8},
            "preprocess": {"enabled": False},
            "detect": {"enabled": True, "model": "missing.pt",
                       "device": "cpu", "max_det": 4, "conf_thres": 1e-4,
                       "imgsz": 64, "classes_keep": [],
                       "compute_dtype": "float32"},
            "tracking": {"enabled": True, "gmc": gmc},
            "geometry": {"enabled": False},
        })

    # random-init detections are unusable for the id assertion; instead
    # assert the config path runs, the thumbnail carry persists across
    # batches, and reset clears it
    eng = make_engine(True)
    assert eng.gmc_enabled
    arr = np.stack(frames[:1])
    eng.process_batch(arr, np.array([0.1]))
    assert eng._gmc_prev is not None
    g1 = np.asarray(eng._gmc_prev)
    eng.process_batch(np.stack(frames[3:4]), np.array([0.2]))
    g2 = np.asarray(eng._gmc_prev)
    assert np.abs(g1 - g2).max() > 0.0      # carry advanced
    eng.reset()
    assert eng._gmc_prev is None

    eng0 = make_engine(False)
    assert not eng0.gmc_enabled
    eng0.process_batch(arr, np.array([0.1]))   # plain path still runs
