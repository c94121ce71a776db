"""Host IO: sources, batch reads, FPS meter, MJPEG-AVI recorder."""
import struct

import numpy as np
import pytest

from roadvision_tpu.io_video import (FPSMeter, MJPEGAVIWriter, NpyWriter,
                                     SyntheticRoadSource, VideoSource,
                                     make_writer)


def test_synthetic_source_deterministic_and_bounded():
    src = SyntheticRoadSource(320, 240, num_vehicles=3)
    ok, img = src.read_frame()
    assert ok and img.shape == (240, 320, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(src.render(0), SyntheticRoadSource(320, 240, 3).render(0))
    boxes = src.gt_boxes(5)
    assert boxes
    for x1, y1, x2, y2, v in boxes:
        assert 0 <= x1 < x2 <= 320 and 0 <= y1 < y2 <= 240


def test_videosource_synthetic_read_and_batch():
    vs = VideoSource(source="synthetic:2", width=160, height=120,
                     num_frames=5)
    fr = vs.read()
    assert fr.ok and fr.image.shape == (120, 160, 3) and fr.ts > 0
    frames, ts, m = vs.read_batch(10)
    assert m == 4  # 5 total, 1 already consumed
    assert frames.shape == (4, 120, 160, 3)
    assert (np.diff(ts) >= 0).all()
    frames, ts, m = vs.read_batch(4)
    assert m == 0


def test_npy_source_roundtrip(tmp_path):
    stack = np.random.RandomState(0).randint(0, 255, (6, 32, 48, 3), np.uint8)
    p = tmp_path / "clip.npy"
    np.save(p, stack)
    vs = VideoSource(source=str(p))
    frames, _, m = vs.read_batch(100)
    assert m == 6
    np.testing.assert_array_equal(frames, stack)


def test_image_dir_source(tmp_path):
    from PIL import Image
    for i in range(3):
        arr = np.full((16, 16, 3), i * 40, np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    vs = VideoSource(source=str(tmp_path))
    frames, _, m = vs.read_batch(10)
    assert m == 3 and frames.shape == (3, 16, 16, 3)
    assert frames[1].mean() == 40


def test_fps_meter_ema():
    m = FPSMeter(alpha=0.1)
    assert m.tick(now=1.0) == 0.0
    fps = m.tick(now=1.1)  # inst = 10
    assert abs(fps - 1.0) < 1e-9  # 0.9*0 + 0.1*10
    fps = m.tick(now=1.2)
    assert abs(fps - (0.9 * 1.0 + 0.1 * 10.0)) < 1e-9


def test_mjpeg_avi_writer_valid_riff(tmp_path):
    path = tmp_path / "out.avi"
    w = MJPEGAVIWriter(str(path), fps=15)
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
    w.release()
    data = path.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8
    assert b"MJPG" in data and b"movi" in data and b"idx1" in data
    assert data.count(b"00dc") >= 8  # 4 chunks + 4 index entries
    # every JPEG frame present
    assert data.count(b"\xff\xd8\xff") == 4


def test_mjpeg_avi_writer_pooled_matches_sync(tmp_path):
    """Forced encode pool: same frames in, byte-identical AVI out (muxed
    strictly in submission order), and snapshotting makes buffer reuse
    by the caller safe."""
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (48, 64, 3), np.uint8) for _ in range(9)]

    p_sync, p_pool = tmp_path / "s.avi", tmp_path / "p.avi"
    w = MJPEGAVIWriter(str(p_sync), fps=15, workers=0)
    for f in frames:
        w.write(f)
    w.release()

    w = MJPEGAVIWriter(str(p_pool), fps=15, workers=2)
    buf = np.empty((48, 64, 3), np.uint8)
    for f in frames:
        buf[:] = f
        w.write(buf)          # reused buffer: write() must snapshot
    w.release()

    assert p_pool.read_bytes() == p_sync.read_bytes()


def test_npy_writer(tmp_path):
    path = tmp_path / "out.npy"
    w = NpyWriter(str(path))
    frames = [np.full((8, 8, 3), i, np.uint8) for i in range(3)]
    for f in frames:
        w.write(f)
    w.release()
    np.testing.assert_array_equal(np.load(path), np.stack(frames))


def test_make_writer_mp4_fallback(tmp_path):
    w = make_writer(str(tmp_path / "clip.mp4"), fps=30)
    w.write(np.zeros((16, 16, 3), np.uint8))
    w.release()
    assert (tmp_path / "clip.avi").exists() or (tmp_path / "clip.mp4").exists()


def test_make_writer_unknown_format(tmp_path):
    with pytest.raises(ValueError):
        make_writer(str(tmp_path / "x.webm"))


def test_y4m_roundtrip(tmp_path):
    from roadvision_tpu.io_video import Y4MReader, Y4MWriter
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (32, 48, 3), np.uint8) for _ in range(3)]
    path = tmp_path / "clip.y4m"
    w = Y4MWriter(str(path), fps=25)
    for f in frames:
        w.write(f)
    w.release()
    head = path.read_bytes()[:40]
    assert head.startswith(b"YUV4MPEG2 W48 H32 F25:1")
    r = Y4MReader(str(path))
    back = list(r)
    assert len(back) == 3 and r.fps == 25.0
    for orig, got in zip(frames, back):
        # BT.601 limited-range roundtrip loses a little precision
        err = np.abs(got.astype(int) - orig.astype(int))
        assert err.mean() < 2.0 and np.percentile(err, 99) <= 6


def test_y4m_via_videosource_and_writer(tmp_path):
    from roadvision_tpu.io_video import VideoSource, make_writer
    path = tmp_path / "clip.y4m"
    w = make_writer(str(path), fps=30)
    for i in range(4):
        w.write(np.full((16, 16, 3), 50 + i * 20, np.uint8))
    w.release()
    vs = VideoSource(source=str(path))
    frames, ts, m = vs.read_batch(10)
    assert m == 4 and frames.shape == (4, 16, 16, 3)
    assert abs(int(frames[2].mean()) - 90) <= 2


class _SpyWriter:
    def __init__(self):
        self.frames = []
        self.released = False

    def write(self, f):
        self.frames.append(f)

    def release(self):
        self.released = True


def test_event_gated_writer_pre_post_roll():
    from roadvision_tpu.io_video import EventGatedWriter
    spy = _SpyWriter()
    w = EventGatedWriter(spy, pre_roll=2, post_roll=2)
    for i in range(10):
        w.write_gated(i, triggered=(i == 5))
    # pre-roll ring [3,4] flushed, trigger 5, post-roll 6,7
    assert spy.frames == [3, 4, 5, 6, 7]
    assert w.segments == 1
    assert w.frames_seen == 10 and w.frames_written == 5
    w.release()
    assert spy.released


def test_event_gated_writer_merges_overlapping_triggers():
    from roadvision_tpu.io_video import EventGatedWriter
    spy = _SpyWriter()
    w = EventGatedWriter(spy, pre_roll=1, post_roll=2)
    for i in range(8):
        w.write_gated(i, triggered=(i in (2, 4)))
    # one contiguous segment: pre [1], 2, post 3, re-trigger 4, post 5,6
    assert spy.frames == [1, 2, 3, 4, 5, 6]
    assert w.segments == 1


def test_event_gated_writer_separate_segments_and_zero_preroll():
    from roadvision_tpu.io_video import EventGatedWriter
    spy = _SpyWriter()
    w = EventGatedWriter(spy, pre_roll=0, post_roll=1)
    for i in range(12):
        w.write_gated(i, triggered=(i in (1, 8)))
    assert spy.frames == [1, 2, 8, 9]
    assert w.segments == 2
    assert w.summary() == {"frames_seen": 12, "frames_written": 4,
                           "segments": 2}


def test_event_gated_writer_quiet_run_writes_nothing(tmp_path):
    from roadvision_tpu.io_video import EventGatedWriter, make_writer
    import numpy as np
    path = tmp_path / "quiet.avi"
    w = EventGatedWriter(make_writer(str(path)), pre_roll=3, post_roll=3)
    frame = np.zeros((32, 48, 3), np.uint8)
    for _ in range(10):
        w.write_gated(frame, triggered=False)
    w.release()
    assert w.frames_written == 0
    # the AVI writer opens lazily on the first frame: a fully quiet run
    # leaves no file (or an empty one on writers that open eagerly)
    assert (not path.exists()
            or path.read_bytes().count(b"\xff\xd8\xff") == 0)


def test_fogged_synthetic_source():
    """camera.source 'synthetic_fog:<level>[:<n>]' — the reference-tool
    fog over the synthetic scene, temporally frozen, via VideoSource."""
    from roadvision_tpu.io_video.capture import (FoggedSyntheticRoadSource,
                                                 SyntheticRoadSource,
                                                 VideoSource)

    vs = VideoSource(source="synthetic_fog:heavy:3", width=96, height=96,
                     num_frames=4)
    frames, ts, m = vs.read_batch(4)
    assert m == 4 and frames.shape == (4, 96, 96, 3)
    assert frames.dtype == np.uint8

    # fog actually degrades: gray span compressed vs the clean scene
    clean = SyntheticRoadSource(96, 96, num_vehicles=3).render(0)
    fogged = FoggedSyntheticRoadSource("heavy", 96, 96,
                                       num_vehicles=3).render(0)
    def span(img):
        g = (0.114 * img[..., 0] + 0.587 * img[..., 1]
             + 0.299 * img[..., 2]).astype(np.uint8)
        return int(g.max()) - int(g.min())
    assert span(fogged) < span(clean)

    # temporally frozen: identical scene frame → identical fogged frame
    a = FoggedSyntheticRoadSource("medium", 96, 96, num_vehicles=3)
    b = FoggedSyntheticRoadSource("medium", 96, 96, num_vehicles=3)
    assert np.array_equal(a.render(2), b.render(2))

    import pytest
    with pytest.raises(ValueError, match="fog level"):
        FoggedSyntheticRoadSource("blizzard", 96, 96)
