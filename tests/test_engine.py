"""End-to-end integration: synthetic video through the fused engine step
(SURVEY.md §4 integration tier)."""
import numpy as np

from roadvision_tpu.config import DEFAULTS, merge
from roadvision_tpu.io_video import VideoSource
from roadvision_tpu.runtime import PipelineEngine


def _cfg(**over):
    cfg = merge(DEFAULTS, {
        "camera": {"source": "synthetic:3", "width": 160, "height": 128},
        "preprocess": {"enabled": True, "chain": [
            {"name": "CLAHEDehaze", "params": {"space": "YCrCb",
                                               "clip_limit": 2.0,
                                               "tile_grid": 8}},
            {"name": "MedianDerain", "params": {"ksize": 3}},
        ]},
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 10, "imgsz": 160, "classes_keep": []},
        "tracking": {"enabled": True},
        "geometry": {"enabled": True, "projector": {
            "type": "homography",
            "image_points": [[0, 128], [160, 128], [0, 50], [160, 50]],
            "world_points": [[0, 0], [6.4, 0], [0, 40], [6.4, 40]],
            "origin": [3.2, 0.0], "max_distance": 100.0}},
        "tpu": {"batch_size": 4, "track_slots": 16},
    })
    return merge(cfg, over)


def test_engine_full_pipeline_runs():
    cfg = _cfg()
    engine = PipelineEngine(cfg)
    vs = VideoSource(source="synthetic:3", width=160, height=128,
                     num_frames=8)
    results = list(engine.stream(vs, max_frames=8))
    assert len(results) == 8
    for r in results:
        assert r.raw.shape == (128, 160, 3)
        assert r.proc.shape == (128, 160, 3)
        assert r.raw.dtype == np.uint8 and r.proc.dtype == np.uint8
    # preprocess actually changed the frames
    assert not np.array_equal(results[0].raw, results[0].proc)


def test_engine_track_state_persists_across_batches():
    engine = PipelineEngine(_cfg())
    vs = VideoSource(source="synthetic:3", width=160, height=128,
                     num_frames=8)
    list(engine.stream(vs, max_frames=8))
    if engine.track_enabled:
        # next_id advanced only if something was detected; state is device-side
        assert int(engine.sort_state.next_id) >= 1


def test_engine_detect_disabled():
    cfg = _cfg(detect={"enabled": False})
    engine = PipelineEngine(cfg)
    vs = VideoSource(source="synthetic:2", width=160, height=128,
                     num_frames=4)
    results = list(engine.stream(vs, max_frames=4))
    assert len(results) == 4
    assert all(r.detections == [] for r in results)


def test_engine_preprocess_disabled_identity():
    cfg = _cfg(preprocess={"enabled": False}, detect={"enabled": False},
               tracking={"enabled": False})
    engine = PipelineEngine(cfg)
    vs = VideoSource(source="synthetic:2", width=160, height=128,
                     num_frames=4)
    results = list(engine.stream(vs, max_frames=4))
    for r in results:
        np.testing.assert_array_equal(r.raw, r.proc)


def test_engine_projector_soft_fail():
    cfg = _cfg(geometry={"enabled": True,
                         "projector": {"type": "homography",
                                       "image_points": [], "world_points": []}})
    engine = PipelineEngine(cfg)  # bad calibration → degraded, no raise
    assert engine.projector is None


def test_main_preview_headless(tmp_path):
    import main_preview
    out = tmp_path / "clip.avi"
    rc = main_preview.main(["--max-frames", "6", "--no-show",
                            "--record", str(out)])
    assert rc == 0
    data = out.read_bytes()
    assert data[:4] == b"RIFF" and data.count(b"\xff\xd8\xff") == 6


def test_engine_rect_letterbox_mode():
    """detect.rect: true runs the minimal-rectangle letterbox end-to-end;
    boxes stay in frame coordinates (reference predict uses rect pad,
    yolo_ultralytics.py:28-35)."""
    cfg = _cfg(detect={"enabled": True, "model": "missing.pt",
                       "device": "cpu", "max_det": 10, "imgsz": 160,
                       "classes_keep": [], "rect": True,
                       "conf_thres": 0.0})
    engine = PipelineEngine(cfg)
    assert engine.detector.rect
    vs = VideoSource(source="synthetic:3", width=160, height=128,
                     num_frames=4)
    results = list(engine.stream(vs, max_frames=4))
    assert len(results) == 4
    dets = [d for r in results for d in r.detections]
    assert dets, "conf_thres=0 should pass boxes even at random init"
    for d in dets:
        assert 0 <= d.x1 <= d.x2 <= 160
        assert 0 <= d.y1 <= d.y2 <= 128


def test_engine_watchdog_fires_and_stays_quiet():
    frames = np.zeros((2, 64, 96, 3), np.uint8)
    ts = np.arange(2) / 30.0

    # default threshold: never fires on a healthy step
    quiet = PipelineEngine(_cfg(camera={"width": 96, "height": 64},
                                tpu={"batch_size": 2, "track_slots": 16}))
    quiet.process_batch(frames, ts)
    quiet.process_batch(frames, 1.0 + ts)
    assert not quiet.watchdog_fired.is_set()

    # microscopic threshold: fires on the first post-compile step (the
    # compile call itself is exempt)
    slow = PipelineEngine(_cfg(camera={"width": 96, "height": 64},
                               tpu={"batch_size": 2, "track_slots": 16,
                                    "watchdog_s": 1e-4}))
    slow.process_batch(frames, ts)
    assert not slow.watchdog_fired.is_set()  # compile call exempt
    slow.process_batch(frames, 1.0 + ts)
    slow.watchdog_fired.wait(timeout=2.0)
    assert slow.watchdog_fired.is_set()


def test_engine_sampled_fast_path_matches_full():
    """want_proc=False engages the sampled-preprocess fast path at
    slice-resize geometries (192x288 -> 96 is stride 3 on both axes);
    detections must match the full-preprocess path bit-for-bit."""
    cfg = _cfg(camera={"width": 288, "height": 192},
               detect={"enabled": True, "model": "missing.pt",
                       "imgsz": 96, "max_det": 10, "classes_keep": [],
                       "conf_thres": 0.0},
               tpu={"batch_size": 2, "track_slots": 16,
                    "sampled_preprocess": True})
    frames = np.random.RandomState(11).randint(
        0, 256, (2, 192, 288, 3), np.uint8)
    ts = np.arange(2) / 30.0

    full = PipelineEngine(cfg)
    res_full = full.process_batch(frames, ts, want_proc=True)

    fast = PipelineEngine(cfg)
    # confirm the fast path actually engages for this geometry
    assert fast.pipeline.supports_sampled()
    from roadvision_tpu.ops.letterbox import axis_plan
    assert axis_plan(192, 64)[0] == "slice"
    assert axis_plan(288, 96)[0] == "slice"
    res_fast = fast.process_batch(frames, ts, want_proc=False)

    for rf, rs in zip(res_full, res_fast):
        assert len(rf.detections) == len(rs.detections)
        for df, ds in zip(rf.detections, rs.detections):
            assert (df.x1, df.y1, df.x2, df.y2) == (ds.x1, ds.y1,
                                                    ds.x2, ds.y2)
            assert df.conf == ds.conf and df.cls_id == ds.cls_id
            assert df.track_id == ds.track_id


def test_main_preview_event_gated_recording(tmp_path):
    """preview.record.events_only routes through EventGatedWriter: no
    trigger → empty recording; min_detections 0 → every frame."""
    import yaml

    import main_preview
    base = {"camera": {"source": "synthetic:3", "width": 96,
                       "height": 64}}
    out = tmp_path / "gated.avi"
    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(yaml.safe_dump({
        **base, "preview": {"record": {
            "events_only": True, "pre_roll": 2, "post_roll": 2,
            "min_detections": 99}}}))
    rc = main_preview.main(["--config", str(cfgp), "--max-frames", "6",
                            "--no-show", "--record", str(out)])
    assert rc == 0
    # nothing triggered → the lazy writer never even opened the file
    assert (not out.exists()
            or out.read_bytes().count(b"\xff\xd8\xff") == 0)

    cfgp.write_text(yaml.safe_dump({
        **base, "preview": {"record": {
            "events_only": True, "min_detections": 0}}}))
    rc = main_preview.main(["--config", str(cfgp), "--max-frames", "6",
                            "--no-show", "--record", str(out)])
    assert rc == 0
    assert out.read_bytes().count(b"\xff\xd8\xff") == 6
