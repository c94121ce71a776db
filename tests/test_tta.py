"""Test-time augmentation (detect.tta) — the ultralytics augment=True
surface, pinned against an independent torch twin.

The twin re-implements scale_img (F.interpolate + F.pad 0.447),
_descale_pred (unscale then mirror in the base width), and
_clip_augmented (first pass drops its stride-32 tail, last pass its
stride-8 head) in torch/numpy over tests/oracles/torch_yolo.v8_forward,
and the candidate sets must agree in fp32. Plus the static clip-index
arithmetic and end-to-end reachability (detector + engine).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from roadvision_tpu.models.yolo import init_params, yolov8
from roadvision_tpu.ops.tta import (TTA_HFLIP, TTA_SCALES, clip_bounds,
                                    scale_img, tta_candidates)

from tests.oracles import torch_yolo


def _torch_scale_img(x_nhwc: np.ndarray, ratio: float, gs: int = 32):
    """ultralytics torch_utils.scale_img, NCHW torch semantics."""
    x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    if ratio != 1.0:
        h, w = x.shape[2:]
        s = (int(h * ratio), int(w * ratio))
        x = F.interpolate(x, size=s, mode="bilinear", align_corners=False)
        h, w = (math.ceil(v * ratio / gs) * gs for v in (h, w))
        x = F.pad(x, [0, w - s[1], 0, h - s[0]], value=0.447)
    return x.numpy().transpose(0, 2, 3, 1)


def _twin_tta(params, imgs: np.ndarray):
    """The full augmented-candidates twin over torch_yolo.v8_forward."""
    w_base = imgs.shape[2]
    boxes_out, scores_out = [], []
    for i, (s, hflip) in enumerate(zip(TTA_SCALES, TTA_HFLIP)):
        xi = imgs[:, :, ::-1, :] if hflip else imgs
        xi = _torch_scale_img(xi, s)
        boxes, scores = torch_yolo.v8_forward(params, xi)
        boxes = boxes / s
        if hflip:
            boxes = np.concatenate(
                [w_base - boxes[..., 2:3], boxes[..., 1:2],
                 w_base - boxes[..., 0:1], boxes[..., 3:4]], axis=-1)
        n = boxes.shape[1]
        g = 21
        start, stop = 0, n
        if i == 0:
            stop = n - n // g
        if i == len(TTA_SCALES) - 1:
            start = (n // g) * 16
        boxes_out.append(boxes[:, start:stop])
        scores_out.append(scores[:, start:stop])
    return (np.concatenate(boxes_out, axis=1),
            np.concatenate(scores_out, axis=1))


def test_clip_bounds_arithmetic():
    # 640x384 rect canvas: levels 80x48 / 40x24 / 20x12
    n = 80 * 48 + 40 * 24 + 20 * 12
    assert n % 21 == 0 and n // 21 == 20 * 12
    start, stop = clip_bounds(n, 0, 3)
    assert (start, stop) == (0, n - 20 * 12)      # the whole stride-32 level
    start, stop = clip_bounds(n, 2, 3)
    assert (start, stop) == (80 * 48, n)          # the whole stride-8 level
    start, stop = clip_bounds(n, 1, 3)
    assert (start, stop) == (0, n)                # middle pass untouched


def test_scale_img_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 96, 160, 3).astype(np.float32)
    for ratio in (0.83, 0.67, 1.0):
        ours = np.asarray(scale_img(jnp.asarray(x), ratio))
        ref = _torch_scale_img(x, ratio)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_tta_candidates_match_torch_twin():
    params = init_params(jax.random.PRNGKey(0), "n")
    rng = np.random.RandomState(5)
    imgs = rng.rand(1, 96, 160, 3).astype(np.float32)

    def fwd(p, x):
        return yolov8.forward_raw(p, x, "n", 80)

    boxes_j, scores_j = jax.jit(
        lambda p, x: tta_candidates(fwd, p, x))(params, jnp.asarray(imgs))
    boxes_t, scores_t = _twin_tta(params, imgs)
    assert boxes_j.shape == boxes_t.shape
    np.testing.assert_allclose(np.asarray(scores_j), scores_t,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(boxes_j), boxes_t,
                               rtol=1e-4, atol=5e-3)


def test_detector_tta_end_to_end():
    from roadvision_tpu.detect.yolo_jax import YOLOJax
    det = YOLOJax({"model": "missing.pt", "device": "cpu", "imgsz": 96,
                   "max_det": 8, "conf_thres": 0.0, "classes_keep": [],
                   "tta": True})
    rng = np.random.RandomState(9)
    frame = rng.randint(0, 256, (72, 96, 3), dtype=np.uint8)
    dets = det.infer(frame)
    assert len(dets) == 8
    for d in dets:
        assert 0.0 <= d.x1 <= d.x2 <= 96.0
        assert 0.0 <= d.y1 <= d.y2 <= 72.0


def test_tta_task_and_tiling_guards():
    from roadvision_tpu.detect.yolo_jax import YOLOJax
    with pytest.raises(ValueError, match="tta"):
        YOLOJax({"model": "missing-pose.pt", "device": "cpu", "tta": True})
    with pytest.raises(ValueError, match="mutually exclusive"):
        YOLOJax({"model": "missing.pt", "device": "cpu", "tta": True,
                 "tiling": {"enable": True}})
    # clip_bounds trims whole LEVELS only on stride-32 canvases; with
    # rect:false a non-multiple imgsz would silently trim misaligned
    # anchor ranges (ADVICE r3) — must be rejected at construction
    with pytest.raises(ValueError, match="multiple of 32"):
        YOLOJax({"model": "missing.pt", "device": "cpu", "tta": True,
                 "imgsz": 100})


def test_engine_tta_smoke():
    from roadvision_tpu.config import DEFAULTS, merge
    from roadvision_tpu.runtime import PipelineEngine
    cfg = merge(DEFAULTS, {
        "camera": {"width": 96, "height": 72},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "missing.pt", "device": "cpu",
                   "max_det": 8, "imgsz": 96, "classes_keep": [],
                   "conf_thres": 0.0, "tta": True},
        "tracking": {"enabled": True},
        "tpu": {"batch_size": 2, "track_slots": 8},
    })
    eng = PipelineEngine(cfg)
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (2, 72, 96, 3), dtype=np.uint8)
    ts = np.asarray([0.0, 1 / 30.0], np.float32)
    results = eng.process_batch(frames, ts)
    assert len(results) == 2
    assert all(len(r.detections) == 8 for r in results)
