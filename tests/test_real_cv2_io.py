"""Real-OpenCV IO paths: mp4 codec write → cv2.VideoCapture read-back.

Rounds 1-2 could only shim-test the cv2-gated paths
(tests/test_fake_cv2.py); with opencv-python present, the reference's
actual deployment shape — ``cv2.VideoWriter`` mp4 output
(main_preview.py:130-137 in the reference, dead code there, real here)
and ``cv2.VideoCapture`` file decode (src/io_video/capture.py:13) — is
exercised against the real library. Live-camera and GUI-window paths
remain env-blocked (no /dev/video*, no display).
"""
import os

import numpy as np
import pytest

# cv2 ships in this image; a regression must fail loudly, not skip
# (see tests/test_cv2_crosscheck.py). RVT_ALLOW_NO_CV2=1 restores the
# skip for genuinely cv2-less environments.
if os.environ.get("RVT_ALLOW_NO_CV2", "0") == "1":
    cv2 = pytest.importorskip("cv2")
else:
    import cv2

from roadvision_tpu.io_video import VideoSource, make_writer
from roadvision_tpu.io_video.capture import OpenCVSource

W, H, N = 128, 96, 10


def _frames():
    """Deterministic low-frequency frames (codec-friendly, distinct)."""
    out = []
    for i in range(N):
        f = np.zeros((H, W, 3), np.uint8)
        f[:, :, 0] = np.linspace(0, 200, W, dtype=np.uint8)[None, :]
        f[:, :, 1] = 20 * i
        f[:, :, 2] = np.linspace(0, 200, H, dtype=np.uint8)[:, None]
        out.append(f)
    return out


def test_mp4_roundtrip_through_real_cv2(tmp_path):
    path = str(tmp_path / "clip.mp4")
    writer = make_writer(path, fps=30)
    frames = _frames()
    for f in frames:
        writer.write(f)
    writer.release()

    src = VideoSource(source=path, width=W, height=H, fps_request=30)
    try:
        got, ts, n = src.read_batch(N)
        assert n == N and got.shape == (N, H, W, 3)
        # mp4v is lossy: per-frame mean error small, frames distinguishable
        for i, f in enumerate(frames):
            err = np.abs(got[i].astype(int) - f.astype(int)).mean()
            assert err < 8.0, f"frame {i}: mean err {err}"
        g = np.asarray([g[:, :, 1].mean() for g in got])
        assert (np.diff(g) > 5).all()  # green ramp survives the codec
        # frame-paced PTS for file media
        assert np.allclose(np.diff(ts), 1 / 30, atol=1e-6)
        assert not src.read().ok  # EOF after N
    finally:
        src.release()


def test_video_file_routes_to_real_opencv_source(tmp_path):
    path = str(tmp_path / "clip.mp4")
    writer = make_writer(path, fps=30)
    for f in _frames():
        writer.write(f)
    writer.release()
    src = VideoSource(source=path, width=W, height=H, fps_request=30)
    try:
        assert isinstance(src._src, OpenCVSource)
    finally:
        src.release()


def test_engine_streams_real_mp4(tmp_path):
    """Full decode→device pipeline over a real codec file."""
    from roadvision_tpu.config import DEFAULTS, merge
    from roadvision_tpu.runtime import PipelineEngine

    path = str(tmp_path / "clip.mp4")
    writer = make_writer(path, fps=30)
    for f in _frames():
        writer.write(f)
    writer.release()

    cfg = merge(DEFAULTS, {
        "camera": {"source": path, "width": W, "height": H},
        "preprocess": {"enabled": True, "chain": [
            {"name": "MedianDerain", "params": {"ksize": 3}}]},
        "detect": {"enabled": False},
        "tracking": {"enabled": False},
        "tpu": {"batch_size": 4},
    })
    engine = PipelineEngine(cfg)
    src = VideoSource(source=path, width=W, height=H, fps_request=30)
    results = list(engine.stream(src, max_frames=8))
    assert len(results) == 8
    assert results[0].proc.shape == (H, W, 3)
