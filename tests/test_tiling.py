"""Tiled small-object inference (ops/tiling.py): grid geometry, static
extraction, source-coordinate merge exactness with a deterministic blob
detector, YOLOJax/engine integration."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.ops.letterbox import letterbox_u8
from roadvision_tpu.ops.nms import nms_batch
from roadvision_tpu.ops.tiling import (TilePlan, extract_tiles, tile_plan,
                                       tiled_candidates)


# ---------------------------------------------------------------- plan
def test_plan_small_frame_single_tile():
    p = tile_plan(96, 128, tile=640)
    assert p.offsets == ((0, 0),) and (p.th, p.tw) == (96, 128)


def test_plan_covers_frame_with_overlap():
    h, w, tile, ov = 1080, 1920, 640, 0.25
    p = tile_plan(h, w, tile=tile, overlap=ov)
    assert (p.th, p.tw) == (tile, tile)
    ys = sorted({y for y, _ in p.offsets})
    xs = sorted({x for _, x in p.offsets})
    # flush edges and full coverage with >= requested overlap
    assert ys[0] == 0 and ys[-1] == h - tile
    assert xs[0] == 0 and xs[-1] == w - tile
    for seq, dim in ((ys, h), (xs, w)):
        for a, b in zip(seq, seq[1:]):
            assert b - a <= tile - int(round(tile * ov)) + 1
    assert p.num_tiles == len(ys) * len(xs)


def test_plan_is_static_python():
    p = tile_plan(720, 1280, tile=512, overlap=0.2)
    assert all(isinstance(v, int) for yx in p.offsets for v in yx)


# ----------------------------------------------------------- extraction
def test_extract_tiles_matches_numpy():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 200, 300, 3)).astype(np.uint8)
    p = tile_plan(200, 300, tile=128, overlap=0.25)
    tiles = np.asarray(extract_tiles(jnp.asarray(frames), p))
    assert tiles.shape == (2, p.num_tiles, 128, 128, 3)
    for t, (y, x) in enumerate(p.offsets):
        np.testing.assert_array_equal(tiles[:, t],
                                      frames[:, y:y + 128, x:x + 128])


# ------------------------------------------------- deterministic merge
class _BlobDet:
    """Single-class bright-blob 'detector': the box is the bounding box
    of pixels brighter than 0.7, score = 0.9 if any. Pure and jittable —
    exercises the whole tiled path with exact, known geometry."""
    imgsz, rect = 64, False
    conf, iou, max_det, keep = 0.25, 0.5, 8, ()
    task = "detect"

    def letterbox(self, frames_u8):
        return letterbox_u8(frames_u8, size=self.imgsz)

    def forward_fn(self, params, imgs):
        n = imgs.shape[1]
        bright = jnp.max(imgs, -1) > 0.7
        idx = jnp.arange(n, dtype=jnp.float32)
        big = jnp.float32(1e9)
        row, col = jnp.any(bright, axis=2), jnp.any(bright, axis=1)
        y1 = jnp.min(jnp.where(row, idx, big), axis=1)
        y2 = jnp.max(jnp.where(row, idx + 1, -big), axis=1)
        x1 = jnp.min(jnp.where(col, idx, big), axis=1)
        x2 = jnp.max(jnp.where(col, idx + 1, -big), axis=1)
        found = jnp.any(bright, axis=(1, 2))
        boxes = jnp.stack([x1, y1, x2, y2], -1)[:, None, :]
        scores = jnp.where(found, 0.9, 0.0)[:, None, None]
        return boxes, scores


def _square_frame(h, w, box):
    img = np.zeros((h, w, 3), np.uint8)
    x1, y1, x2, y2 = box
    img[y1:y2, x1:x2] = 255
    return img


def test_tiled_merge_recovers_exact_source_box():
    """A small bright square fully inside ≥2 overlapping tiles comes
    back as EXACTLY ONE detection at its exact source coordinates (the
    cross-tile duplicates suppress in the single global NMS)."""
    h, w, gt = 192, 256, (150, 70, 158, 78)
    p = tile_plan(h, w, tile=64, overlap=0.25)
    # precondition: every tile contains the square fully or not at all
    # (partial cuts would legitimately yield sliver candidates — real
    # detectors score those low; the blob stub cannot)
    full = sum((x <= gt[0] and gt[2] <= x + p.tw and
                y <= gt[1] and gt[3] <= y + p.th)
               for (y, x) in p.offsets)
    partial = sum((gt[0] < x + p.tw and x < gt[2] and
                   gt[1] < y + p.th and y < gt[3])
                  for (y, x) in p.offsets)
    assert full >= 2 and partial == full

    det = _BlobDet()
    frames = jnp.asarray(_square_frame(h, w, gt)[None])
    boxes_all, scores_all = tiled_candidates(det, {}, frames, p,
                                             full_frame=False)
    assert boxes_all.shape == (1, p.num_tiles, 4)
    b, c, k, v = nms_batch(boxes_all, scores_all, conf_thres=0.25,
                           iou_thres=0.5, max_det=8, pre_topk=16)
    nv = int(np.sum(np.asarray(v)))
    assert nv == 1
    np.testing.assert_allclose(np.asarray(b[0, 0]), np.asarray(gt),
                               atol=1e-4)


def test_full_frame_pass_catches_object_larger_than_tile():
    """full_frame=True: an object bigger than any tile (every tile sees
    only a cut) is still detected via the whole-frame candidates."""
    h, w = 192, 256
    gt = (20, 20, 236, 172)                 # larger than a 64px tile
    p = tile_plan(h, w, tile=64, overlap=0.25)
    det = _BlobDet()
    frames = jnp.asarray(_square_frame(h, w, gt)[None])
    boxes_all, scores_all = tiled_candidates(det, {}, frames, p,
                                             full_frame=True)
    assert boxes_all.shape[1] == p.num_tiles + 1
    b, c, k, v = nms_batch(boxes_all, scores_all, conf_thres=0.25,
                           iou_thres=0.5, max_det=32, pre_topk=64)
    vb = np.asarray(b[0])[np.asarray(v[0])]
    # the top-area candidate spans (close to) the ground truth; tile
    # slivers may coexist (different geometry → below the IoU threshold)
    areas = (vb[:, 2] - vb[:, 0]) * (vb[:, 3] - vb[:, 1])
    big = vb[int(np.argmax(areas))]
    np.testing.assert_allclose(big, np.asarray(gt), atol=4.0)


# ------------------------------------------------------- integration
def test_yolojax_tiling_rejects_non_detect_task():
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    with pytest.raises(ValueError, match="detect task only"):
        YOLOJax({"model": "missing-seg.pt", "device": "cpu",
                 "tiling": {"enable": True}})


def test_yolojax_tiled_infer_smoke():
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    det = YOLOJax({"model": "missing.pt", "device": "cpu", "imgsz": 64,
                   "conf_thres": 1e-4, "max_det": 8,
                   "compute_dtype": "float32",
                   "tiling": {"enable": True, "tile": 64,
                              "overlap": 0.25}})
    assert det.tile_cfg == {"tile": 64, "overlap": 0.25,
                            "full_frame": True}
    frame = np.random.default_rng(0).integers(
        0, 255, (96, 128, 3)).astype(np.uint8)
    dets = det.infer(frame)
    for d in dets:
        assert 0 <= d.x1 <= d.x2 <= 128 and 0 <= d.y1 <= d.y2 <= 96


def test_engine_tiled_step_with_tracking():
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2, "track_slots": 16},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 64, "classes_keep": [],
                   "compute_dtype": "float32",
                   "tiling": {"enable": True, "tile": 64,
                              "overlap": 0.25, "full_frame": True}},
        "tracking": {"enabled": True},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 96, 128, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.track_id is not None for d in dets)
    for d in dets:
        assert 0 <= d.x1 <= d.x2 <= 128 and 0 <= d.y1 <= d.y2 <= 96
