"""FFmpegPipeSource: any-codec decode through a rawvideo pipe.

No real ffmpeg in this environment — fake ffmpeg/ffprobe executables on
PATH emit a known rawvideo stream, covering probe parsing, frame
framing, EOF, release, and the resolver's cv2-less fallback.
"""
import os
import stat

import numpy as np
import pytest

from roadvision_tpu.io_video import VideoSource
from roadvision_tpu.io_video.capture import FFmpegPipeSource

W, H, N = 64, 48, 6


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    # deterministic frames: frame i filled with value i
    raw = tmp_path / "frames.raw"
    data = np.stack([np.full((H, W, 3), i, np.uint8) for i in range(N)])
    raw.write_bytes(data.tobytes())

    ffmpeg = tmp_path / "ffmpeg"
    ffmpeg.write_text(f"#!/bin/sh\ncat {raw}\n")
    ffprobe = tmp_path / "ffprobe"
    ffprobe.write_text(f'#!/bin/sh\necho "{W},{H},30/1"\n')
    for p in (ffmpeg, ffprobe):
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    return tmp_path


def test_ffmpeg_pipe_reads_probed_frames(fake_ffmpeg):
    src = FFmpegPipeSource("clip.mkv")
    assert (src.w, src.h) == (W, H) and src.fps == 30.0
    for i in range(N):
        ok, img = src.read_frame()
        assert ok and img.shape == (H, W, 3)
        assert (img == i).all()
    ok, img = src.read_frame()
    assert not ok  # EOF
    src.release()
    assert src.proc.poll() is not None


def test_ffmpeg_prefix_routes_and_streams(fake_ffmpeg):
    vs = VideoSource(source="ffmpeg:clip.mkv", width=W, height=H)
    frames, ts, m = vs.read_batch(4)
    assert m == 4 and frames.shape == (4, H, W, 3)
    assert (np.diff(ts) > 0).all()  # paced PTS
    vs.release()


def test_cv2less_codec_file_falls_back_to_ffmpeg(fake_ffmpeg, monkeypatch):
    from roadvision_tpu.io_video import capture
    monkeypatch.setattr(capture, "_HAS_CV2", False)
    vs = VideoSource(source="clip.mp4", width=W, height=H)
    assert isinstance(vs._src, FFmpegPipeSource)
    assert vs.read().ok
    vs.release()


def test_missing_ffmpeg_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(RuntimeError, match="not on PATH"):
        FFmpegPipeSource("clip.mkv")
