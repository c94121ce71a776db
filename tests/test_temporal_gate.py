"""Temporal gating (detect.temporal_gate): motion-adaptive inference.

On near-static scenes the engine skips the detector forward and coasts
the tracker on the last detections (runtime/engine.py build_coast_step —
the "Fast YOLO" pattern, PAPERS.md). Pinned here: static batches coast
and the skip budget forces refreshes (bounded even in the PIPELINED
dispatch/collect interleaving), whole-frame AND small localized motion
both block gating, batch-boundary motion is seen via the thumbnail
carry, identities persist through coasting, and the config validation
rejects unsupported combinations.
"""
import numpy as np
import pytest

from roadvision_tpu.runtime.engine import PipelineEngine


def _engine(extra_detect=None, extra_tracking=None, batch=2):
    det = {"enabled": True, "model": "missing.pt", "imgsz": 64,
           "conf_thres": 1e-6, "max_det": 8, "device": "cpu",
           "temporal_gate": {"enable": True, "max_skip_batches": 3}}
    det.update(extra_detect or {})
    trk = {"enabled": True, "backend": "sort"}
    trk.update(extra_tracking or {})
    return PipelineEngine({"detect": det, "tracking": trk,
                           "preprocess": {"enabled": False},
                           "tpu": {"batch_size": batch}})


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
        ts = t + np.arange(b) / 30.0
        t += b / 30.0
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


def test_pipelined_skip_budget_is_exact():
    """The stream()-shaped interleaving (dispatch i+1 before collect i)
    must not overshoot max_skip_batches — skip accounting happens at
    dispatch time."""
    eng = _engine()
    coast_flags = []
    inflight = None
    for frames, ts in _batches(10):
        nxt = eng.dispatch_batch(frames, ts, want_proc=False)
        coast_flags.append(nxt[7])
        if inflight is not None:
            eng.collect_batch(inflight)
        inflight = nxt
    eng.collect_batch(inflight)
    run = 0
    for c in coast_flags:
        run = run + 1 if c else 0
        assert run <= 3
    assert any(coast_flags)


def test_moving_scene_never_coasts():
    eng = _engine()
    for frames, ts in _batches(4, move=True):
        eng.process_batch(frames, ts)
    assert eng.gate_frames_coasted == 0


def test_small_localized_motion_blocks_gating():
    """A distant mover covering a tiny fraction of the frame must still
    block the gate — the probe scores blockwise, not as a whole-frame
    mean that would dilute it to nothing."""
    eng = _engine()
    rng = np.random.RandomState(3)
    h, w = 128, 128
    base = rng.randint(0, 255, (h, w, 3), np.uint8)
    t = 0.0
    for i in range(4):
        frames = []
        for j in range(2):
            f = base.copy()
            x = 8 + (i * 2 + j) * 6     # 16x16-px patch sliding right
            f[56:72, x:x + 16] = 255
            frames.append(f)
        eng.process_batch(np.stack(frames), t + np.arange(2) / 30.0)
        t += 2 / 30.0
    assert eng.gate_frames_coasted == 0


def test_batch_boundary_motion_bounded_by_carry():
    """Content constant WITHIN each batch but changing BETWEEN batches:
    without the cross-batch thumbnail carry every score would be zero
    and the gate would coast through all of it. With the carry, the
    change is seen one batch later, so at most the first transition
    coasts before the scores pin the gate open."""
    eng = _engine()
    rng = np.random.RandomState(4)
    scenes = [rng.randint(0, 255, (48, 64, 3), np.uint8)
              for _ in range(6)]
    t = 0.0
    prev = 0
    coasted_per_batch = []
    for i, scene in enumerate(scenes):
        frames = np.stack([scene, scene])
        eng.process_batch(frames, t + np.arange(2) / 30.0)
        t += 2 / 30.0
        coasted_per_batch.append(eng.gate_frames_coasted - prev)
        prev = eng.gate_frames_coasted
    # exactly the first post-score batch may coast (its own boundary
    # score then exposes the change); afterwards never again
    assert sum(1 for c in coasted_per_batch if c > 0) <= 1
    assert all(c == 0 for c in coasted_per_batch[2:])


def test_single_frame_batches_gate_via_carry():
    """Batch size 1 has no within-batch pair; the carried thumbnail
    supplies the boundary pair, so static single-frame streams still
    gate (and the very first batches, with no history, never do)."""
    eng = _engine(batch=1)
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (1, 48, 64, 3), np.uint8)
    for i in range(5):
        eng.process_batch(frame, np.array([i / 30.0]))
    assert eng.gate_frames_coasted > 0


def test_reset_clears_gate_state():
    eng = _engine()
    for frames, ts in _batches(4):
        eng.process_batch(frames, ts)
    assert eng.gate_frames_coasted > 0
    eng.reset()
    assert eng.gate_frames_coasted == 0
    # the first post-reset batches cannot coast on the dead stream
    for frames, ts in _batches(1, seed=9):
        eng.process_batch(frames, ts)
    assert eng.gate_frames_coasted == 0


def test_gate_rejects_unsupported_combinations():
    with pytest.raises(ValueError, match="gmc"):
        _engine(extra_tracking={"gmc": True})
    with pytest.raises(ValueError, match="detect task"):
        _engine(extra_detect={"model": "missing-pose.pt"})
    with pytest.raises(ValueError, match="detect task"):
        _engine(extra_detect={"tiling": {"enable": True, "tile": 64}})


# ---------------------------------------------------------------------------
# device-resident gate (engine.build_gated_scan_step): the coast/full
# choice as a lax.cond INSIDE the compiled step (VERDICT r3 #4)


def _run_gated_scan(eng, batches, shape):
    import jax
    import jax.numpy as jnp
    step, init_carry = eng.build_gated_scan_step(shape)
    jstep = jax.jit(step)
    params = eng.detector.params
    carry = init_carry()
    coasts, outs_all = [], []
    for frames, ts in batches:
        outs, coast, carry = jstep(params, carry, jnp.asarray(frames),
                                   jnp.asarray(ts.astype(np.float32)))
        coasts.append(bool(coast))
        outs_all.append([np.asarray(a) for a in outs])
    return coasts, outs_all


def test_device_gate_static_coasts_with_skip_budget():
    eng = _engine()
    coasts, _ = _run_gated_scan(eng, _batches(6), (2, 48, 64))
    # full (unknown past), 3 coasts (budget), full refresh, coast again
    assert coasts == [False, True, True, True, False, True]


def test_device_gate_moving_never_coasts():
    eng = _engine()
    coasts, _ = _run_gated_scan(eng, _batches(4, move=True), (2, 48, 64))
    assert coasts == [False, False, False, False]


def test_device_gate_full_branch_matches_raw_step():
    """A full (non-coast) pass through the gated step is bit-identical
    to the plain raw step — the cond only ever skips, never perturbs."""
    import jax
    import jax.numpy as jnp
    eng = _engine()
    frames, ts = next(iter(_batches(1)))
    raw = eng.build_raw_step((2, 48, 64), want_proc=False)
    out = jax.jit(raw)(eng.detector.params, eng.sort_state,
                       jnp.asarray(frames),
                       jnp.asarray(ts.astype(np.float32)))
    outs_ref = out[1]
    coasts, outs_all = _run_gated_scan(eng, _batches(1), (2, 48, 64))
    assert coasts == [False]
    for a, b in zip(outs_ref, outs_all[0]):
        a = np.asarray(a)
        eq_nan = np.issubdtype(a.dtype, np.floating)  # dist/speed are NaN
        assert np.array_equal(a, b, equal_nan=eq_nan)


def test_device_gate_coasted_outputs_replicate_held_set():
    eng = _engine()
    coasts, outs = _run_gated_scan(eng, _batches(2), (2, 48, 64))
    assert coasts == [False, True]
    boxes1, valid1 = outs[0][0], outs[0][3]
    boxes2, valid2 = outs[1][0], outs[1][3]
    # every coasted frame carries batch 0's LAST frame's detections
    for f in range(boxes2.shape[0]):
        assert np.array_equal(boxes2[f], boxes1[-1])
        assert np.array_equal(valid2[f], valid1[-1])
