"""YOLOv8-pose: keypoint-estimation head, natively in JAX.

Model-family addition beyond the reference (its wrapper serves detection
checkpoints only, src/detect/yolo_ultralytics.py:16; the ultralytics API
it wraps also ships ``yolov8*-pose.pt``). Architecture follows the
ultralytics Pose head convention so real ``-pose`` checkpoints import
1:1 (models/yolo/weights.py:state_dict_to_params_pose):

  * the detection backbone/neck/head of yolov8.py — or YOLO11's
    (``arch="11"``: the same cv4 branch on detect layer 23, so
    ``yolo11*-pose.pt`` imports 1:1 too);
  * ``cv4`` — a third per-level branch predicting ``nk = 17·3`` raw
    keypoint values per anchor (Conv k3 → Conv k3 → 1×1 to nk), the
    COCO 17-keypoint (x, y, visibility) layout;
  * decode (ultralytics ``kpts_decode``): xy = (raw·2 + anchor − 0.5) ·
    stride (anchor = grid center + 0.5, so the −0.5 lands on the cell
    origin); visibility = sigmoid(raw).

TPU-first: one fused decode over the concatenated anchor axis (no
per-level Python loops at trace time beyond the static 3 levels),
static (B, N, 17, 3) output gathered post-NMS by kept-source index —
the same fixed-shape pattern as the seg coefficients.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .yolov8 import (_conv, _init_conv, anchor_points, backbone_head_forward,
                     base_init, base_spec, decode)

KPT_SHAPE = (17, 3)   # COCO keypoints: (x, y, visibility)
NK = KPT_SHAPE[0] * KPT_SHAPE[1]

# COCO skeleton (keypoint index pairs) for overlay rendering
SKELETON = ((15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11),
            (6, 12), (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2),
            (0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 6))


def pose_spec(size: str = "n", nc: int = 1,
              arch: str = "v8") -> Dict[str, Any]:
    """arch spec (v8 or 11) + the pose head's channel plan (nc defaults
    to 1: ``-pose`` checkpoints are person-only)."""
    spec = base_spec(size, nc, arch)
    spec["nk"] = NK
    spec["c4"] = max(spec["ch_det"][0] // 4, NK)
    return spec


def init_params_pose(key, size: str = "n", nc: int = 1,
                     arch: str = "v8") -> Dict[str, Any]:
    kd, kc = jax.random.split(key)
    p = base_init(kd, size, nc, arch)
    spec = pose_spec(size, nc, arch)
    c4, nk = spec["c4"], spec["nk"]
    cv4 = []
    for lvl, ch in enumerate(spec["ch_det"]):
        ks = jax.random.split(jax.random.fold_in(kc, lvl), 3)
        cv4.append([
            _init_conv(ks[0], ch, c4, 3),
            _init_conv(ks[1], c4, c4, 3),
            _init_conv(ks[2], c4, nk, 1),
        ])
    p[spec["head"]]["cv4"] = cv4
    return p


def forward_kpts_raw(params, feats, spec, dtype=jnp.float32) -> jnp.ndarray:
    """Per-level cv4 branch → concatenated (B, N, nk) raw values."""
    cv4 = params[spec.get("head", "22")]["cv4"]
    outs = []
    for lvl, f in enumerate(feats):
        k = _conv(f, cv4[lvl][0], dtype=dtype)
        k = _conv(k, cv4[lvl][1], dtype=dtype)
        k = _conv(k, cv4[lvl][2], act=False, dtype=dtype)
        outs.append(k.reshape(k.shape[0], -1, spec["nk"]))
    return jnp.concatenate(outs, axis=1)


def decode_kpts(raw: jnp.ndarray, hw_per_level) -> jnp.ndarray:
    """(B, N, nk) raw → (B, N, 17, 3) with xy in input pixels and
    sigmoid visibility (ultralytics kpts_decode semantics)."""
    pts, strides = anchor_points(hw_per_level)     # pts = grid + 0.5
    b, n = raw.shape[:2]
    y = raw.reshape(b, n, KPT_SHAPE[0], KPT_SHAPE[1])
    xy = (y[..., :2] * 2.0 + (pts[None, :, None, :] - 0.5)) \
        * strides[None, :, None, None]
    vis = jax.nn.sigmoid(y[..., 2:3])
    return jnp.concatenate([xy, vis], axis=-1)


def forward_pose_raw(params, x, size: str = "n", nc: int = 1,
                     dtype=jnp.float32, arch: str = "v8"):
    """(B, H, W, 3) float [0,1] → (boxes (B,N,4), scores (B,N,nc),
    kpts (B,N,17,3) in input pixels). Un-jitted — compose inside larger
    jitted steps (same contract as yolov8.forward_raw)."""
    spec = pose_spec(size, nc, arch)
    feats, outs = backbone_head_forward(params, x, spec, dtype)
    boxes, scores = decode(outs, nc)
    hw = [(o[0].shape[1], o[0].shape[2]) for o in outs]
    kpts = decode_kpts(forward_kpts_raw(params, feats, spec, dtype), hw)
    return boxes, scores, kpts


forward_pose = jax.jit(forward_pose_raw, static_argnames=("size", "nc",
                                                          "dtype", "arch"))


def scale_kpts(kpts: jnp.ndarray, ratio, pad, orig_hw) -> jnp.ndarray:
    """Letterbox-space keypoints → source-frame pixels (the kpt analogue
    of ops.letterbox.scale_boxes); visibility passes through."""
    h, w = orig_hw
    x = jnp.clip((kpts[..., 0] - pad[0]) / ratio, 0, w)
    y = jnp.clip((kpts[..., 1] - pad[1]) / ratio, 0, h)
    return jnp.stack([x, y, kpts[..., 2]], axis=-1)
