"""Overlay rasterizer + compare canvas geometry."""
import numpy as np

from roadvision_tpu.detect.types import Detection
from roadvision_tpu.vis import COLOR_TABLE, draw_detections, make_canvas
from roadvision_tpu.vis.font5x7 import render_text_mask


def test_font_renders_nonempty():
    m = render_text_mask("ID 3 | CAR 0.85", scale=2)
    assert m.any() and m.shape[0] == 14


def test_draw_detections_paints_box_and_skips_degenerate():
    img = np.zeros((100, 120, 3), np.uint8)
    dets = [
        Detection(10, 40, 60, 90, 0.9, 2, "car", track_id=3,
                  distance_m=12.3, speed_kmh=45.6),
        Detection(70, 40, 70, 90, 0.9, 0, "person"),  # degenerate: skipped
        None,
    ]
    draw_detections(img, dets)
    color = np.array(COLOR_TABLE[2], np.uint8)
    # box edge painted with the class color
    assert (img[40, 10:60] == color).all(axis=-1).any()
    # degenerate box area untouched (above the first det's clamped
    # bottom-label box, which spans y>=80)
    assert (img[60:78, 69:72] == 0).all()
    # labels contain white text pixels
    assert (img == 255).all(axis=-1).any()


def test_make_canvas_h_layout_geometry():
    raw = np.full((48, 64, 3), 10, np.uint8)
    proc = np.full((48, 64, 3), 200, np.uint8)
    canvas = make_canvas(raw, proc, layout="h", divider_px=4, fps=30.0)
    assert canvas.shape == (48, 64 + 4 + 64, 3)
    np.testing.assert_array_equal(canvas[40, 64:68], [[40, 40, 40]] * 4)
    # raw region between the RAW label (rows ≤30) and FPS overlay (rows ≥39)
    assert (canvas[35, :10] == 10).all()
    assert (canvas[35, 100] == 200).all()   # proc region


def test_make_canvas_v_layout_geometry():
    raw = np.full((40, 64, 3), 10, np.uint8)
    proc = np.full((40, 64, 3), 200, np.uint8)
    canvas = make_canvas(raw, proc, layout="v", divider_px=6, fps=None,
                         show_fps=False)
    assert canvas.shape == (40 + 6 + 40, 64, 3)
    np.testing.assert_array_equal(canvas[42, 0], [40, 40, 40])


def test_make_canvas_no_divider():
    raw = np.zeros((32, 32, 3), np.uint8)
    canvas = make_canvas(raw, raw.copy(), layout="h", divider_px=0,
                         show_fps=False)
    assert canvas.shape == (32, 64, 3)


def test_legacy_draw_detections():
    """Parity stub for the reference's dead bis/draw.py: boxes + class
    label only, no id/distance/speed labels."""
    from roadvision_tpu.vis import legacy
    img = np.zeros((60, 80, 3), np.uint8)
    legacy.draw_detections(img, [
        Detection(10, 20, 50, 50, 0.9, 2, "car", track_id=7,
                  distance_m=5.0, speed_kmh=10.0)])
    color = np.array(COLOR_TABLE[2], np.uint8)
    assert (img[20, 10:50] == color).all(axis=-1).any()   # box drawn
    assert (img == 255).all(axis=-1).any()                 # label text
    # no bottom metrics label: area below the box stays empty
    assert (img[52:, 10:50] == 0).all()


def test_trail_renderer_draws_identity_path():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.vis import COLOR_TABLE, TrailRenderer

    tr = TrailRenderer(length=8, stale_after=1.0)
    img = np.zeros((64, 128, 3), np.uint8)
    for i, x in enumerate((10, 30, 50)):
        d = Detection(x - 5, 20, x + 5, 40, 0.9, 2, "car", track_id=1)
        tr.update([d], 0.1 * (i + 1))
    tr.draw(img, thickness=1)
    color = COLOR_TABLE[1 % 10]
    # the polyline covers the anchor row (y2=40) between x 10 and 50
    assert (img[40, 10:51] == color).all(axis=-1).sum() >= 38
    # nothing above the anchor row
    assert img[:39].max() == 0


def test_trail_renderer_length_cap_and_staleness():
    from roadvision_tpu.detect.types import Detection
    from roadvision_tpu.vis import TrailRenderer

    tr = TrailRenderer(length=4, stale_after=0.5)
    for i in range(10):
        d = Detection(i, 0, i + 2, 10, 0.9, 0, "p", track_id=3)
        tr.update([d], 0.1 * i)
    assert len(tr._hist[3]) == 4
    # identity idle past stale_after vanishes
    tr.update([], 2.0)
    assert 3 not in tr._hist
    # untracked detections are ignored
    tr.update([Detection(0, 0, 5, 5, 0.9, 0, "p")], 2.1)
    assert not tr._hist
