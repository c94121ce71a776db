"""Instance-mask composition for YOLOv8-seg: fixed-shape, gather-free.

Device side of the segment task (models/yolo/yolov8_seg.py). Follows the
ultralytics ``process_mask`` semantics (sigmoid of coefficient·prototype
dot, crop to the box, threshold 0.5) so imported ``-seg`` checkpoints
reproduce ultralytics' masks — but formulated TPU-first:

  * the coefficient×prototype contraction is ONE einsum over the whole
    fixed-capacity detection set (B, K, nm)·(B, mh, mw, nm) → a single
    MXU matmul per image, invalid slots included (masked after — branch-
    free beats sparse here, K·mh·mw·nm is tiny next to the backbone);
  * the box crop is a broadcast comparison against iota row/col grids —
    no gather, no dynamic shapes;
  * masks stay at prototype resolution (input/4) on the device; pasting
    to source-frame pixels is a host-side, per-valid-detection step
    (:func:`paste_masks`) since full-resolution per-instance canvases
    are pure HBM/PCIe waste for K≈100 slots.

The reference has no segmentation path (its wrapper loads detection
checkpoints only, src/detect/yolo_ultralytics.py:16); this module is part
of the beyond-reference segment task. Oracle-tested in
tests/test_masks.py; end-to-end torch parity in tests/test_seg_parity.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compose_masks(coeffs: jnp.ndarray, protos: jnp.ndarray,
                  boxes: jnp.ndarray, valid: jnp.ndarray,
                  stride: float = 4.0) -> jnp.ndarray:
    """Per-instance soft masks at prototype resolution.

    coeffs (B, K, nm) — kept detections' mask coefficients;
    protos (B, mh, mw, nm) — prototype masks (input/4 resolution);
    boxes  (B, K, 4) xyxy in LETTERBOXED-INPUT pixels (pre-rescale);
    valid  (B, K) bool.

    Returns (B, K, mh, mw) float32 in [0, 1]: sigmoid(coeffs·protos)
    zeroed outside each instance's box (ultralytics crop_mask semantics:
    col ≥ x1 ∧ col < x2, on box coords divided by ``stride``) and zeroed
    for invalid slots.
    """
    logits = jnp.einsum("bkn,bhwn->bkhw", coeffs.astype(jnp.float32),
                        protos.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    m = jax.nn.sigmoid(logits)
    bb = boxes / stride
    mh, mw = m.shape[2], m.shape[3]
    col = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
    row = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
    x1 = bb[..., 0][:, :, None, None]
    y1 = bb[..., 1][:, :, None, None]
    x2 = bb[..., 2][:, :, None, None]
    y2 = bb[..., 3][:, :, None, None]
    inside = (col >= x1) & (col < x2) & (row >= y1) & (row < y2)
    return jnp.where(inside & valid[:, :, None, None], m, 0.0)


def _bilinear_resize(m: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """align_corners=False bilinear (the F.interpolate default ultralytics
    uses), host numpy, float32 in/out."""
    in_h, in_w = m.shape
    if in_h == out_h and in_w == out_w:
        return m.astype(np.float32)
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    m = m.astype(np.float64)
    top = m[y0][:, x0] * (1 - wx) + m[y0][:, x1] * wx
    bot = m[y1][:, x0] * (1 - wx) + m[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def paste_masks(masks: np.ndarray, valid: np.ndarray,
                ratio: float, pad: Tuple[float, float],
                orig_hw: Tuple[int, int],
                thresh: Optional[float] = 0.5) -> np.ndarray:
    """Prototype-resolution masks → source-frame pixel masks (host).

    masks (K, mh, mw) float32 from :func:`compose_masks` (one image);
    valid (K,) bool; ``ratio`` (scalar r) and ``pad`` ((left, top) in
    letterbox-target pixels) are the metadata the detector already
    returns for box rescale (ops/letterbox.py:90-145); orig_hw the
    source frame size.

    Returns (K, H, W) — bool when ``thresh`` is set (ultralytics' 0.5
    cut), float32 soft masks when ``thresh`` is None. Invalid slots are
    all-zero. Un-letterboxing happens at prototype scale: the padded
    border is cut (pad and the scaled content extent divided by the
    prototype stride 4) and the content is bilinearly resized to the
    source frame.
    """
    k, mh, mw = masks.shape
    oh, ow = int(orig_hw[0]), int(orig_hw[1])
    r = float(np.asarray(ratio).reshape(-1)[0])
    left, top = (float(v) for v in np.asarray(pad).reshape(-1)[:2])
    cy0 = int(round(top / 4.0))
    cx0 = int(round(left / 4.0))
    ch = max(1, int(round(oh * r / 4.0)))
    cw = max(1, int(round(ow * r / 4.0)))
    cy1 = min(mh, cy0 + ch)
    cx1 = min(mw, cx0 + cw)
    out_dtype = bool if thresh is not None else np.float32
    out = np.zeros((k, oh, ow), out_dtype)
    for i in range(k):
        if not valid[i]:
            continue
        crop = masks[i, cy0:cy1, cx0:cx1]
        full = _bilinear_resize(crop, oh, ow)
        out[i] = full > thresh if thresh is not None else full
    return out


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two boolean masks (host, eval/test helper)."""
    a = a.astype(bool)
    b = b.astype(bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 0.0
