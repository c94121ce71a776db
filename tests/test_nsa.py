"""NSA Kalman (confidence-adaptive measurement noise, StrongSORT /
GIAOTracker): R̃ = (1 − conf)·R — confident detections correct the
state harder; the knob is ``tracking.nsa`` under every backend.
"""
import numpy as np

import jax.numpy as jnp

from roadvision_tpu.track.sort_tpu import (_kf_update, bbox_to_z,
                                           init_state, make_sort_step,
                                           nsa_r_scale)


def test_nsa_r_scale_floor():
    s = np.asarray(nsa_r_scale(jnp.asarray([0.0, 0.5, 1.0])))
    np.testing.assert_allclose(s, [1.0, 0.5, 1e-3])


def test_kf_update_r_scale_monotone_trust():
    """Smaller R scale (higher conf) → posterior closer to the
    measurement; scale 1 → identical to the plain update."""
    mean = jnp.zeros((1, 7)).at[0, :4].set(
        jnp.asarray([100.0, 100.0, 400.0, 1.0]))
    cov = jnp.tile(jnp.eye(7)[None] * 5.0, (1, 1, 1))
    z = jnp.asarray([[120.0, 100.0, 400.0, 1.0]])

    plain, _ = _kf_update(mean, cov, z)
    same, _ = _kf_update(mean, cov, z, jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(same),
                               rtol=1e-6)

    gaps = []
    for conf in (0.1, 0.5, 0.9, 0.999):
        m, _ = _kf_update(mean, cov, z, nsa_r_scale(jnp.asarray([conf])))
        gaps.append(abs(float(m[0, 0]) - 120.0))
    # trust grows monotonically with confidence
    assert gaps[0] > gaps[1] > gaps[2] > gaps[3]
    assert gaps[3] < 0.1        # near-certain detection ≈ snap to it


def _one_track_two_frames(step, conf2):
    state = init_state(8)
    mk = lambda x: jnp.asarray([[x, 40.0, x + 20.0, 60.0]], jnp.float32)
    cls = jnp.zeros((1,), jnp.int32)
    v = jnp.asarray([True])
    state, _ = step(state, mk(100.0), cls,
                    jnp.asarray([0.9], jnp.float32), v,
                    jnp.float32(0.1), None)
    state, _ = step(state, mk(120.0), cls,
                    jnp.asarray([conf2], jnp.float32), v,
                    jnp.float32(0.2), None)
    return float(state.mean[0, 0])      # posterior cx

def test_nsa_step_snaps_harder_on_confident_detections():
    kw = dict(iou_threshold=0.0, max_staleness=1.0, speed_window=0.75)
    plain = make_sort_step(**kw)
    nsa = make_sort_step(**kw, nsa=True)
    target = 130.0                       # cx of the frame-2 detection
    gap_plain = abs(_one_track_two_frames(plain, 0.99) - target)
    gap_nsa = abs(_one_track_two_frames(nsa, 0.99) - target)
    assert gap_nsa < gap_plain
    # low confidence: NSA ≈ plain (scale → 1)
    d = abs(_one_track_two_frames(nsa, 0.01)
            - _one_track_two_frames(plain, 0.01))
    assert d < 0.05


def test_nsa_reaches_every_backend_from_config():
    from roadvision_tpu.track.registry import build_device_step

    for backend in ("sort", "bytetrack", "ocsort", "deepsort", "botsort"):
        step = build_device_step({"backend": backend, "nsa": True,
                                  "new_track_thresh": 0.0})
        state = init_state(8)
        boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0]], jnp.float32)
        cls = jnp.zeros((1,), jnp.int32)
        conf = jnp.asarray([0.9], jnp.float32)
        v = jnp.asarray([True])
        emb = jnp.zeros((1, 108), jnp.float32) \
            if getattr(step, "needs_embeddings", False) else None
        args = (state, boxes, cls, conf, v, jnp.float32(0.1), None)
        state, out = step(*args, emb) if emb is not None else step(*args)
        assert int(out.track_id[0]) >= 1


def test_nsa_off_is_bit_identical_to_before():
    """nsa=False must not perturb the default path (parity guard)."""
    kw = dict(iou_threshold=0.3, max_staleness=1.0, speed_window=0.75)
    a = make_sort_step(**kw)
    b = make_sort_step(**kw, nsa=False)
    state_a, state_b = init_state(8), init_state(8)
    rng = np.random.default_rng(0)
    for i in range(6):
        boxes = jnp.asarray(rng.uniform(0, 200, (3, 4)).astype(np.float32))
        boxes = boxes.at[:, 2:].set(boxes[:, :2] + 10.0)
        cls = jnp.zeros((3,), jnp.int32)
        conf = jnp.asarray(rng.uniform(0.2, 1.0, 3).astype(np.float32))
        v = jnp.asarray([True, True, i % 2 == 0])
        ts = jnp.float32(0.1 * (i + 1))
        state_a, out_a = a(state_a, boxes, cls, conf, v, ts, None)
        state_b, out_b = b(state_b, boxes, cls, conf, v, ts, None)
        np.testing.assert_array_equal(np.asarray(out_a.track_id),
                                      np.asarray(out_b.track_id))
        np.testing.assert_array_equal(np.asarray(state_a.mean),
                                      np.asarray(state_b.mean))


def test_strongsort_preset():
    """strongsort = deepsort association + NSA default-on + GMC
    default-on in the engine; explicit overrides win."""
    import jax.numpy as jnp

    from roadvision_tpu.runtime.engine import PipelineEngine
    from roadvision_tpu.track.deepsort import DeepSortTracker
    from roadvision_tpu.track.registry import (build_device_step,
                                               build_tracker)

    step = build_device_step({"backend": "strongsort",
                              "new_track_thresh": 0.0})
    assert getattr(step, "needs_embeddings", False)

    # equals deepsort with nsa=True on a scripted sequence
    ds = build_device_step({"backend": "deepsort", "nsa": True,
                            "new_track_thresh": 0.0})
    sa, sb = init_state(8), init_state(8)
    for i, x in enumerate((10.0, 25.0, 45.0)):
        boxes = jnp.asarray([[x, 10.0, x + 20.0, 30.0]], jnp.float32)
        cls = jnp.zeros((1,), jnp.int32)
        conf = jnp.asarray([0.7], jnp.float32)
        v = jnp.asarray([True])
        ts = jnp.float32(0.1 * (i + 1))
        emb = jnp.zeros((1, 108), jnp.float32)
        sa, oa = step(sa, boxes, cls, conf, v, ts, None, emb)
        sb, ob = ds(sb, boxes, cls, conf, v, ts, None, emb)
        np.testing.assert_array_equal(np.asarray(sa.mean),
                                      np.asarray(sb.mean))

    # host API maps to the deepsort tracker class
    assert isinstance(build_tracker({"backend": "strongsort"}),
                      DeepSortTracker)

    # engine defaults gmc on for strongsort, off for deepsort;
    # explicit gmc: false wins
    base = {"tpu": {"batch_size": 1, "track_slots": 8},
            "preprocess": {"enabled": False},
            "detect": {"enabled": True, "model": "missing.pt",
                       "max_det": 4, "conf_thres": 1e-4, "imgsz": 96,
                       "classes_keep": [], "compute_dtype": "float32"},
            "geometry": {"enabled": False}}
    eng = PipelineEngine({**base, "tracking": {
        "enabled": True, "backend": "strongsort"}})
    assert eng.gmc_enabled
    eng = PipelineEngine({**base, "tracking": {
        "enabled": True, "backend": "strongsort", "gmc": False}})
    assert not eng.gmc_enabled
    eng = PipelineEngine({**base, "tracking": {
        "enabled": True, "backend": "deepsort"}})
    assert not eng.gmc_enabled


def test_host_trackers_honor_nsa_like_device_path():
    """The host list-API trackers must read tracking.nsa with the same
    default rule as build_device_step (on for the strongsort preset) —
    they silently dropped it before, so the same config produced
    different Kalman gains on the two paths."""
    from roadvision_tpu.track.registry import build_tracker
    assert build_tracker({"backend": "strongsort"}).nsa
    assert not build_tracker({"backend": "deepsort"}).nsa
    assert not build_tracker({"backend": "sort"}).nsa
    for backend in ("sort", "bytetrack", "ocsort", "deepsort", "botsort"):
        assert build_tracker({"backend": backend, "nsa": True}).nsa, backend
    assert not build_tracker({"backend": "strongsort", "nsa": False}).nsa


def test_host_trackers_all_warn_on_underprovisioned_slots():
    import warnings as _w
    from roadvision_tpu.track.registry import build_tracker
    for backend in ("sort", "bytetrack", "ocsort", "deepsort", "botsort",
                    "strongsort"):
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            build_tracker({"backend": backend, "track_slots": 4,
                           "det_capacity": 16})
        assert any("silently drop tracks" in str(c.message)
                   for c in caught), backend
