"""High-level library API (roadvision_tpu/api.py).

The reference exposes only a script driver (main_preview.py:36-149);
Pipeline is the library face over the same config schema and engine.
"""
from __future__ import annotations

import numpy as np
import pytest

import roadvision_tpu as rv

SMALL = {
    "camera": {"source": "synthetic:3", "width": 128, "height": 128},
    "preprocess": {"enabled": True,
                   "chain": [{"name": "CLAHEDehaze",
                              "params": {"space": "YCrCb",
                                         "clip_limit": 2.0,
                                         "tile_grid": 4}}]},
    "detect": {"enabled": True, "model": "assets/yolov8n_synthetic_256.npz",
               "imgsz": 128, "conf_thres": 0.25, "max_det": 10,
               "classes_keep": [2]},
    "tracking": {"enabled": True, "backend": "sort"},
    "geometry": {"enabled": False},
    "tpu": {"batch_size": 2, "track_slots": 16},
}


@pytest.fixture(scope="module")
def pipe():
    return rv.Pipeline(SMALL)


def test_lazy_import_surface():
    assert hasattr(rv, "Pipeline")
    with pytest.raises(AttributeError):
        rv.nope  # noqa: B018


def test_config_merge_and_overrides():
    p = rv.Pipeline(SMALL, detect={"enabled": False})
    assert p.cfg["detect"]["enabled"] is False
    assert p.cfg["camera"]["width"] == 128  # base dict survived the merge
    assert p.engine.detector is None


def test_stream_call(pipe):
    results = list(pipe("synthetic:4", max_frames=6))
    assert len(results) == 6
    assert all(r.raw.shape == (128, 128, 3) for r in results)
    assert all(r.raw.dtype == np.uint8 for r in results)
    ts = [r.ts for r in results]
    assert ts == sorted(ts)


def test_process_frames_and_reset(pipe):
    pipe.reset()
    rng = np.random.RandomState(0)
    batch = rng.randint(0, 255, (2, 128, 128, 3), np.uint8)
    out = pipe.process_frames(batch)
    assert len(out) == 2
    # auto-timestamps advance across calls
    out2 = pipe.process_frames(batch)
    assert out2[0].ts > out[-1].ts
    pipe.reset()
    out3 = pipe.process_frames(batch)
    assert out3[0].ts == out[0].ts
    # single frame promotes to a batch of one
    assert len(pipe.process_frames(batch[0])) == 1


def test_detect_image(pipe):
    from roadvision_tpu.io_video.capture import SyntheticRoadSource
    src = SyntheticRoadSource(128, 128, num_vehicles=3)
    frame = src.render(0)
    dets = pipe.detect_image(frame)
    assert isinstance(dets, list)
    for d in dets:
        assert isinstance(d, rv.Detection)
        assert d.cls_id == 2  # classes_keep


def test_detect_image_disabled_raises():
    p = rv.Pipeline(SMALL, detect={"enabled": False})
    with pytest.raises(RuntimeError, match="disabled"):
        p.detect_image(np.zeros((64, 64, 3), np.uint8))


def test_streams_multi_camera():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    p = rv.Pipeline(SMALL,
                    camera={"width": 128, "height": 128,
                            "sources": [f"synthetic:{2 + i}"
                                        for i in range(4)]},
                    tpu={"batch_size": 2, "track_slots": 16,
                         "mesh": {"enable": True, "axis": "data"}})
    batches = list(p.streams(max_frames=4))
    assert len(batches) == 2  # 4 frames / batch 2
    for per_stream in batches:
        assert len(per_stream) == 4  # streams
        for frames in per_stream:
            assert len(frames) == 2  # batch
            assert frames[0].raw.shape == (128, 128, 3)
    # explicit source specs override the config list
    batches2 = list(p.streams(["synthetic:2", "synthetic:3"],
                              max_frames=2))
    assert len(batches2[0]) == 2


def test_process_video_records(tmp_path, pipe):
    pipe.reset()
    out = tmp_path / "out.avi"
    summary = pipe.process_video("synthetic:4", output=str(out),
                                 max_frames=8)
    assert summary["frames"] == 8
    assert summary["output"] == str(out)
    data = out.read_bytes()
    assert data[:4] == b"RIFF"
    assert data.count(b"\xff\xd8\xff") == 8
    # synthetic vehicles + shipped checkpoint → some tracks confirmed
    assert summary["unique_tracks"] >= 0
