"""YOLOv8-OBB: oriented-bounding-box head, natively in JAX.

Model-family addition beyond the reference (its wrapper serves
axis-aligned detection checkpoints only,
src/detect/yolo_ultralytics.py:16; the ultralytics API it wraps also
ships ``yolov8*-obb.pt``, trained on DOTA aerial imagery). Architecture
follows the ultralytics OBB head convention so real ``-obb``
checkpoints import 1:1 (models/yolo/weights.py:
state_dict_to_params_obb):

  * the detection backbone/neck/head of yolov8.py — or YOLO11's
    (``arch="11"``: the same cv4 angle branch on detect layer 23,
    so ``yolo11*-obb.pt`` imports 1:1 too);
  * ``cv4`` — a third per-level branch predicting ``ne = 1`` raw angle
    value per anchor (Conv k3 → Conv k3 → 1×1 to ne);
  * angle decode: θ = (sigmoid(raw) − 0.25)·π, i.e. [−π/4, 3π/4);
  * box decode (ultralytics ``dist2rbox``): the DFL ltrb offsets are
    re-centered ((rb − lt)/2 rotated by θ, added to the anchor) and
    the size is lt + rb — a rotated box (cx, cy, w, h) · stride.

TPU-first: one fused decode over the concatenated anchor axis, static
(B, N, 5) rbox output; suppression is the exact-greedy ProbIoU NMS of
ops/obb.py (no polygon clipping anywhere on the device path).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .yolov8 import (REG_MAX, _conv, _init_conv, anchor_points,
                     backbone_head_forward, base_init, base_spec,
                     dfl_decode)

NE = 1   # raw angle channels per anchor

# DOTA-v1.0 category names (the dataset ultralytics' -obb checkpoints
# are trained on), index order of the released models
DOTA_NAMES = (
    "plane", "ship", "storage tank", "baseball diamond", "tennis court",
    "basketball court", "ground track field", "harbor", "bridge",
    "large vehicle", "small vehicle", "helicopter", "roundabout",
    "soccer ball field", "swimming pool",
)


def obb_spec(size: str = "n", nc: int = 15,
             arch: str = "v8") -> Dict[str, Any]:
    """arch spec (v8 or 11) + the OBB head's channel plan (nc defaults
    to 15: ``-obb`` checkpoints are DOTA-trained)."""
    spec = base_spec(size, nc, arch)
    spec["ne"] = NE
    spec["c4"] = max(spec["ch_det"][0] // 4, NE)
    return spec


def init_params_obb(key, size: str = "n", nc: int = 15,
                    arch: str = "v8") -> Dict[str, Any]:
    kd, kc = jax.random.split(key)
    p = base_init(kd, size, nc, arch)
    spec = obb_spec(size, nc, arch)
    c4, ne = spec["c4"], spec["ne"]
    cv4 = []
    for lvl, ch in enumerate(spec["ch_det"]):
        ks = jax.random.split(jax.random.fold_in(kc, lvl), 3)
        cv4.append([
            _init_conv(ks[0], ch, c4, 3),
            _init_conv(ks[1], c4, c4, 3),
            _init_conv(ks[2], c4, ne, 1),
        ])
    p[spec["head"]]["cv4"] = cv4
    return p


def forward_angle_raw(params, feats, spec, dtype=jnp.float32) -> jnp.ndarray:
    """Per-level cv4 branch → concatenated (B, N) raw angle logits."""
    cv4 = params[spec.get("head", "22")]["cv4"]
    outs = []
    for lvl, f in enumerate(feats):
        a = _conv(f, cv4[lvl][0], dtype=dtype)
        a = _conv(a, cv4[lvl][1], dtype=dtype)
        a = _conv(a, cv4[lvl][2], act=False, dtype=dtype)
        outs.append(a.reshape(a.shape[0], -1))
    return jnp.concatenate(outs, axis=1)


def decode_angle(raw: jnp.ndarray) -> jnp.ndarray:
    """Raw angle logits → θ radians in [−π/4, 3π/4) (the ultralytics
    OBB convention)."""
    return (jax.nn.sigmoid(raw) - 0.25) * jnp.pi


def decode_rbox(box_logits: jnp.ndarray, angle: jnp.ndarray,
                hw_per_level) -> jnp.ndarray:
    """DFL box logits (B, N, 4·REG_MAX) + θ (B, N) → rotated boxes
    (B, N, 5) cx, cy, w, h in input pixels, θ radians (ultralytics
    ``dist2rbox`` semantics: the ltrb offset midpoint is rotated by θ
    about the anchor before the stride scale)."""
    pts, strides = anchor_points(hw_per_level)
    ltrb = dfl_decode(box_logits)                  # grid units
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    xf = (rb[..., 0] - lt[..., 0]) / 2.0
    yf = (rb[..., 1] - lt[..., 1]) / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    cx = (xf * cos - yf * sin + pts[None, :, 0]) * strides[None]
    cy = (xf * sin + yf * cos + pts[None, :, 1]) * strides[None]
    wh = (lt + rb) * strides[None, :, None]
    return jnp.stack([cx, cy, wh[..., 0], wh[..., 1], angle], axis=-1)


def forward_obb_raw(params, x, size: str = "n", nc: int = 15,
                    dtype=jnp.float32, arch: str = "v8"):
    """(B, H, W, 3) float [0,1] → (rboxes (B,N,5) cx,cy,w,h px + θ rad,
    scores (B,N,nc)). Un-jitted — compose inside larger jitted steps
    (same contract as yolov8.forward_raw)."""
    spec = obb_spec(size, nc, arch)
    feats, outs = backbone_head_forward(params, x, spec, dtype)
    hw = [(o[0].shape[1], o[0].shape[2]) for o in outs]
    bs = x.shape[0]
    box_logits = jnp.concatenate(
        [o[0].reshape(bs, -1, 4 * REG_MAX) for o in outs], axis=1)
    cls_logits = jnp.concatenate(
        [o[1].reshape(bs, -1, nc) for o in outs], axis=1)
    angle = decode_angle(forward_angle_raw(params, feats, spec, dtype))
    rboxes = decode_rbox(box_logits, angle, hw)
    return rboxes, jax.nn.sigmoid(cls_logits)


forward_obb = jax.jit(forward_obb_raw, static_argnames=("size", "nc",
                                                        "dtype", "arch"))
