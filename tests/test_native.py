"""Native C++ host ops vs the pure-numpy rasterizer (bit-identical)."""
import numpy as np
import pytest

from roadvision_tpu.runtime import native
from roadvision_tpu.vis import draw as draw_mod
from roadvision_tpu.vis.font5x7 import render_text_mask

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _numpy_draw(fn, *args, **kw):
    """Run a draw.py primitive with the native path disabled."""
    saved = draw_mod._NATIVE
    draw_mod._NATIVE = False
    try:
        fn(*args, **kw)
    finally:
        draw_mod._NATIVE = saved


def test_fill_rect_matches_numpy():
    a = np.zeros((40, 50, 3), np.uint8)
    b = a.copy()
    native.fill_rect(a, 5, 7, 30, 20, (10, 20, 30))
    _numpy_draw(draw_mod.fill_rect, b, 5, 7, 30, 20, (10, 20, 30))
    np.testing.assert_array_equal(a, b)
    # clipping
    a2, b2 = a.copy(), b.copy()
    native.fill_rect(a2, -5, -5, 100, 100, (1, 2, 3))
    _numpy_draw(draw_mod.fill_rect, b2, -5, -5, 100, 100, (1, 2, 3))
    np.testing.assert_array_equal(a2, b2)


@pytest.mark.parametrize("t", [1, 2, 3])
def test_draw_rect_matches_numpy(t):
    a = np.zeros((40, 50, 3), np.uint8)
    b = a.copy()
    native.draw_rect(a, 5, 7, 30, 20, (200, 100, 50), t)
    _numpy_draw(draw_mod.draw_rect, b, 5, 7, 30, 20, (200, 100, 50), t)
    np.testing.assert_array_equal(a, b)


def test_blit_mask_matches_numpy():
    mask = render_text_mask("ID 7 | CAR 0.93", 2)
    a = np.zeros((40, 200, 3), np.uint8)
    b = a.copy()
    native.blit_mask(a, mask, 3, 5, (255, 255, 255))
    _numpy_draw(draw_mod._blit, b, mask, 3, 5, (255, 255, 255))
    np.testing.assert_array_equal(a, b)
    # negative offsets clip identically
    a2, b2 = a.copy(), b.copy()
    native.blit_mask(a2, mask, -4, -3, (9, 9, 9))
    _numpy_draw(draw_mod._blit, b2, mask, -4, -3, (9, 9, 9))
    np.testing.assert_array_equal(a2, b2)


@pytest.mark.parametrize("layout", ["h", "v"])
def test_canvas_matches_numpy(layout):
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 255, (32, 48, 3), np.uint8)
    proc = rng.randint(0, 255, (32, 48, 3), np.uint8)
    got = native.canvas(raw, proc, layout, 4)
    if layout == "h":
        want = np.hstack([raw, np.full((32, 4, 3), 40, np.uint8), proc])
    else:
        want = np.vstack([raw, np.full((4, 48, 3), 40, np.uint8), proc])
    np.testing.assert_array_equal(got, want)


def test_draw_detections_native_equals_numpy():
    from roadvision_tpu.detect.types import Detection
    dets = [Detection(5, 8, 30, 28, 0.9, 2, "car", track_id=1,
                      distance_m=12.0, speed_kmh=30.0)]
    a = np.zeros((64, 96, 3), np.uint8)
    b = a.copy()
    draw_mod.draw_detections(a, dets)          # native path (if available)
    _numpy_draw(draw_mod.draw_detections, b, dets)
    np.testing.assert_array_equal(a, b)


def test_native_jpeg_encoder_decodes_back():
    """The libjpeg-turbo tail produces a valid JPEG whose decoded pixels
    match the input to normal lossy tolerance, in the right channel order
    (JCS_EXT_BGR must not swap R/B)."""
    import io

    from PIL import Image

    if native.get_jpeg_lib() in (None, False):
        pytest.skip("libjpeg unavailable")
    h, w = 60, 90
    frame = np.zeros((h, w, 3), np.uint8)
    frame[:, : w // 3] = (255, 0, 0)      # pure blue in BGR
    frame[:, w // 3: 2 * w // 3] = (0, 255, 0)
    frame[:, 2 * w // 3:] = (0, 0, 255)   # pure red in BGR
    data = native.jpeg_encode_bgr(frame, quality=95)
    assert data is not None and data[:3] == b"\xff\xd8\xff"
    rgb = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # left third must decode blue (high B, low R) — catches channel swap
    assert rgb[h // 2, 5, 2] > 200 and rgb[h // 2, 5, 0] < 60
    assert rgb[h // 2, w - 5, 0] > 200 and rgb[h // 2, w - 5, 2] < 60
    bgr = rgb[..., ::-1]
    assert np.mean(np.abs(bgr.astype(int) - frame.astype(int))) < 8


def test_writer_encode_uses_native_and_matches_pil_closely():
    """encode_jpeg_bgr routes through the native tail when available and
    the result decodes within lossy tolerance of the PIL fallback."""
    import io

    from PIL import Image

    from roadvision_tpu.io_video import writer as writer_mod

    if native.get_jpeg_lib() in (None, False):
        pytest.skip("libjpeg unavailable")
    rng = np.random.RandomState(7)
    frame = np.clip(
        np.linspace(0, 200, 120)[None, :, None]
        + rng.normal(0, 6, (80, 120, 3)), 0, 255).astype(np.uint8)
    data = writer_mod.encode_jpeg_bgr(frame, quality=90)
    nat = native.jpeg_encode_bgr(frame, quality=90, fast_dct=False)
    assert data == nat  # the writer picked the native path

    img = Image.frombuffer("RGB", (120, 80), np.ascontiguousarray(frame),
                           "raw", "BGR", 0, 1)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=90)
    a = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), int)
    b = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"), int)
    assert np.mean(np.abs(a - b)) < 3.0
