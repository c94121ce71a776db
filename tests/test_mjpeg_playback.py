"""MJPEG-AVI playback (io_video/mjpeg_avi.py) + native JPEG decode
(runtime/native/jpeg_dec.cpp): record→replay round trip with zero
codec dependencies, index/no-index parsing, decode-path equivalence."""
import io
import struct

import numpy as np
import pytest

from roadvision_tpu.io_video.capture import VideoSource
from roadvision_tpu.io_video.mjpeg_avi import MJPEGAviReader, decode_jpeg_bgr
from roadvision_tpu.io_video.writer import MJPEGAVIWriter, encode_jpeg_bgr


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        img = np.zeros((h, w, 3), np.uint8)
        img[:] = (20 * i) % 200
        img[10:30, 8 + 4 * i: 24 + 4 * i] = (40, 180, 220)
        img += rng.randint(0, 8, img.shape).astype(np.uint8)
        out.append(img)
    return out


def _write_avi(path, frames, fps=25.0, quality=95):
    wr = MJPEGAVIWriter(str(path), fps=fps, quality=quality, workers=0)
    for f in frames:
        wr.write(f)
    wr.release()


def test_round_trip_counts_geometry_content(tmp_path):
    frames = _frames(6)
    p = tmp_path / "clip.avi"
    _write_avi(p, frames, fps=25.0)
    rd = MJPEGAviReader(str(p))
    assert len(rd) == 6
    assert rd.fps == pytest.approx(25.0, rel=0.01)
    for i, ref in enumerate(frames):
        ok, img = rd.read_frame()
        assert ok and img.shape == ref.shape and img.dtype == np.uint8
        # JPEG is lossy; q=95 keeps the content close
        assert np.abs(img.astype(int) - ref.astype(int)).mean() < 4.0
    assert rd.read_frame() == (False, None)
    rd.release()


def test_videosource_fronts_avi_and_paces_pts(tmp_path):
    frames = _frames(5)
    p = tmp_path / "clip.avi"
    _write_avi(p, frames, fps=10.0)
    vs = VideoSource(str(p), width=64, height=48, fps_request=30)
    stamps = []
    n = 0
    while True:
        fr = vs.read()
        if not fr.ok:
            break
        stamps.append(fr.ts)
        n += 1
    vs.release()
    assert n == 5
    # PTS paced by the FILE's fps (10), not the 30 fps request
    dts = np.diff(stamps)
    assert np.allclose(dts, 0.1, atol=1e-6)


def test_sequential_walk_without_index(tmp_path):
    """Strip idx1 (and leave RIFF/movi sizes stale) — the reader must
    fall back to walking movi chunks, as after a crashed recording."""
    frames = _frames(4)
    p = tmp_path / "clip.avi"
    _write_avi(p, frames)
    data = bytearray(p.read_bytes())
    idx = data.rfind(b"idx1")
    assert idx > 0
    del data[idx:]  # drop the index wholesale
    p2 = tmp_path / "noidx.avi"
    p2.write_bytes(bytes(data))
    rd = MJPEGAviReader(str(p2))
    assert len(rd) == 4
    ok, img = rd.read_frame()
    assert ok and img.shape == frames[0].shape
    rd.release()


def test_truncated_tail_plays_leading_frames(tmp_path):
    """Cut the file mid-frame: everything before the cut still plays."""
    frames = _frames(5)
    p = tmp_path / "clip.avi"
    _write_avi(p, frames)
    data = p.read_bytes()
    idx = data.rfind(b"idx1")
    cut = idx - 100  # inside the last frame's chunk
    p2 = tmp_path / "trunc.avi"
    p2.write_bytes(data[:cut])
    rd = MJPEGAviReader(str(p2))
    assert 1 <= len(rd) < 5
    ok, img = rd.read_frame()
    assert ok and img.shape == frames[0].shape
    rd.release()


def test_absolute_offset_index_convention(tmp_path):
    """Rewrite idx1 offsets as absolute-in-file (the other muxer
    convention) — the probe must detect it and still resolve frames."""
    frames = _frames(3)
    p = tmp_path / "clip.avi"
    _write_avi(p, frames)
    data = bytearray(p.read_bytes())
    movi = data.find(b"movi")
    idx = data.rfind(b"idx1")
    (size,) = struct.unpack_from("<I", data, idx + 4)
    n = size // 16
    for i in range(n):
        e = idx + 8 + 16 * i
        (off,) = struct.unpack_from("<I", data, e + 8)
        struct.pack_into("<I", data, e + 8, off + movi)  # rel → abs
    p2 = tmp_path / "abs.avi"
    p2.write_bytes(bytes(data))
    rd = MJPEGAviReader(str(p2))
    assert len(rd) == 3
    ok, img = rd.read_frame()
    assert ok and img.shape == frames[0].shape
    rd.release()


def test_non_avi_rejected(tmp_path):
    p = tmp_path / "x.avi"
    p.write_bytes(b"not an avi at all")
    with pytest.raises(ValueError):
        MJPEGAviReader(str(p))
    p2 = tmp_path / "empty.avi"
    p2.write_bytes(b"")
    with pytest.raises(ValueError):
        MJPEGAviReader(str(p2))


def test_decode_matches_pil_bit_exact():
    """Native libjpeg-turbo decode (JDCT_ISLOW) vs PIL on the same
    stream — both sit on libjpeg, outputs must agree bit-for-bit."""
    from PIL import Image

    from roadvision_tpu.runtime import native

    frame = _frames(1, h=40, w=56, seed=3)[0]
    data = encode_jpeg_bgr(frame, quality=90)
    img_native = native.jpeg_decode_bgr(data)
    if img_native is None:
        pytest.skip("native jpeg decode unavailable (no -ljpeg)")
    rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    img_pil = rgb[..., ::-1]
    assert img_native.shape == img_pil.shape
    assert np.array_equal(img_native, img_pil)


def test_decode_rejects_garbage():
    from roadvision_tpu.runtime import native

    if native.get_jdec_lib() is False:
        pytest.skip("native jpeg decode unavailable")
    assert native.jpeg_decode_bgr(b"\x00" * 64) is None


def test_engine_streams_from_recorded_avi(tmp_path):
    """The full loop: synthetic scene → recorder → playback source →
    pipeline engine (preprocess only, CPU-fast)."""
    from roadvision_tpu.config import load_config
    from roadvision_tpu.runtime.engine import PipelineEngine

    frames = _frames(8, h=64, w=96)
    p = tmp_path / "rec.avi"
    _write_avi(p, frames, fps=30.0)

    cfg = load_config(None)
    cfg["camera"].update(source=str(p), width=96, height=64)
    cfg["detect"]["enabled"] = False
    cfg["tracking"]["enabled"] = False
    cfg["tpu"]["batch_size"] = 4
    engine = PipelineEngine(cfg)
    vs = VideoSource(str(p), width=96, height=64, fps_request=30)
    n = 0
    for res in engine.stream(vs, max_frames=8):
        assert res.proc.shape == (64, 96, 3)
        n += 1
    assert n == 8
    vs.release()
