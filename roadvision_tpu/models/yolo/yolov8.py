"""YOLOv8 re-implemented natively in JAX (no torch at runtime).

TPU-native replacement for the reference's Ultralytics wrapper
(src/detect/yolo_ultralytics.py:16,28 — SURVEY.md §2.3): Conv+SiLU stem,
C2f stages, SPPF, FPN/PAN head, decoupled detect head with DFL box
regression at strides 8/16/32. All model sizes (n/s/m/l/x) supported via
the standard depth/width/max-channel multiples.

Design notes (TPU-first):
  * NHWC layout + HWIO kernels — XLA's preferred convolution layout on TPU;
  * BatchNorm is stored FUSED into conv weight+bias (the reference calls
    ``model.fuse()`` at load, yolo_ultralytics.py:17; the importer fuses at
    conversion time, and random init simply has biases);
  * params are a plain nested-dict pytree keyed by the ultralytics layer
    indices ("0".."22"), which makes the .pt checkpoint mapping 1:1 and
    sharding rules easy to express;
  * compute dtype is configurable: bf16 for the conv path with f32
    accumulation (``preferred_element_type``) is the TPU fast path;
  * static shapes throughout; the decode step emits a fixed (B, N, 4+nc)
    tensor for the fixed-shape NMS.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# depth_multiple, width_multiple, max_channels per model size
SIZE_CFG = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}
STRIDES = (8, 16, 32)
REG_MAX = 16


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor))


def _scale_ch(ch: int, width: float, max_ch: int) -> int:
    return _make_divisible(min(ch, max_ch) * width, 8)


def _scale_depth(n: int, depth: float) -> int:
    return max(1, round(n * depth))


def arch_spec(size: str = "n", nc: int = 80) -> Dict[str, Any]:
    """Static architecture description for one model size."""
    depth, width, max_ch = SIZE_CFG[size]
    w = [_scale_ch(c, width, max_ch) for c in (64, 128, 256, 512, 1024)]
    n1 = _scale_depth(3, depth)
    n2 = _scale_depth(6, depth)
    ch_det = (w[2], w[3], w[4])
    c2 = max(16, ch_det[0] // 4, REG_MAX * 4)
    c3 = max(ch_det[0], min(nc, 100))
    return dict(size=size, nc=nc, widths=w, n1=n1, n2=n2, ch_det=ch_det,
                c2=c2, c3=c3)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _init_conv(key, cin: int, cout: int, k: int) -> Dict[str, jnp.ndarray]:
    fan_in = cin * k * k
    std = math.sqrt(2.0 / fan_in)
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32) * std
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _init_c2f(key, cin: int, cout: int, n: int) -> Dict[str, Any]:
    c = cout // 2
    keys = jax.random.split(key, 2 + 2 * n)
    params: Dict[str, Any] = {
        "cv1": _init_conv(keys[0], cin, 2 * c, 1),
        "cv2": _init_conv(keys[1], (2 + n) * c, cout, 1),
        "m": [],
    }
    for j in range(n):
        params["m"].append({
            "cv1": _init_conv(keys[2 + 2 * j], c, c, 3),
            "cv2": _init_conv(keys[3 + 2 * j], c, c, 3),
        })
    return params


def init_params(key, size: str = "n", nc: int = 80) -> Dict[str, Any]:
    spec = arch_spec(size, nc)
    w, n1, n2 = spec["widths"], spec["n1"], spec["n2"]
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {}
    p["0"] = _init_conv(next(keys), 3, w[0], 3)
    p["1"] = _init_conv(next(keys), w[0], w[1], 3)
    p["2"] = _init_c2f(next(keys), w[1], w[1], n1)
    p["3"] = _init_conv(next(keys), w[1], w[2], 3)
    p["4"] = _init_c2f(next(keys), w[2], w[2], n2)
    p["5"] = _init_conv(next(keys), w[2], w[3], 3)
    p["6"] = _init_c2f(next(keys), w[3], w[3], n2)
    p["7"] = _init_conv(next(keys), w[3], w[4], 3)
    p["8"] = _init_c2f(next(keys), w[4], w[4], n1)
    p["9"] = {  # SPPF
        "cv1": _init_conv(next(keys), w[4], w[4] // 2, 1),
        "cv2": _init_conv(next(keys), (w[4] // 2) * 4, w[4], 1),
    }
    p["12"] = _init_c2f(next(keys), w[4] + w[3], w[3], n1)
    p["15"] = _init_c2f(next(keys), w[3] + w[2], w[2], n1)
    p["16"] = _init_conv(next(keys), w[2], w[2], 3)
    p["18"] = _init_c2f(next(keys), w[3] + w[2], w[3], n1)
    p["19"] = _init_conv(next(keys), w[3], w[3], 3)
    p["21"] = _init_c2f(next(keys), w[4] + w[3], w[4], n1)

    c2, c3 = spec["c2"], spec["c3"]
    det: Dict[str, Any] = {"cv2": [], "cv3": []}
    for lvl, ch in enumerate(spec["ch_det"]):
        kb = jax.random.split(next(keys), 6)
        box = [
            _init_conv(kb[0], ch, c2, 3),
            _init_conv(kb[1], c2, c2, 3),
            _init_conv(kb[2], c2, 4 * REG_MAX, 1),
        ]
        cls = [
            _init_conv(kb[3], ch, c3, 3),
            _init_conv(kb[4], c3, c3, 3),
            _init_conv(kb[5], c3, nc, 1),
        ]
        # ultralytics bias init: box = 1.0; cls = log(5/nc/(640/stride)²)
        stride = STRIDES[lvl]
        box[2]["b"] = jnp.ones((4 * REG_MAX,), jnp.float32)
        cls[2]["b"] = jnp.full(
            (nc,), math.log(5.0 / nc / (640.0 / stride) ** 2), jnp.float32)
        det["cv2"].append(box)
        det["cv3"].append(cls)
    p["22"] = det
    return p


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _conv(x, p, stride: int = 1, act: bool = True,
          dtype=jnp.float32, pad: int = None) -> jnp.ndarray:
    """Fused Conv(+bias)+SiLU, autopad k//2 (override for e.g. the v5
    6×6/p=2 stem), NHWC/HWIO. Dispatches to the int8 path when the param
    dict holds quantized weights (models/yolo/quant.py). Grouped/depthwise
    convs (YOLO11's DWConv head, C2PSA positional encoding) are inferred
    from the kernel's input-channel width — no metadata needed."""
    if "w_i8" in p:
        from .quant import conv_i8
        return conv_i8(x, p, stride=stride, act=act, pad=pad)
    k = p["w"].shape[0]
    pad = k // 2 if pad is None else pad
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1] // p["w"].shape[2],
        preferred_element_type=jnp.float32)
    out = out + p["b"]
    if not act:
        return out  # head/decode consumers stay f32
    # bias+SiLU accumulate in f32; the MATERIALIZED activation goes back
    # to the compute dtype — halves inter-layer HBM traffic on the bf16
    # path (f32 path: no-op)
    return jax.nn.silu(out).astype(dtype)


def _c2f(x, p, shortcut: bool, dtype=jnp.float32) -> jnp.ndarray:
    y = _conv(x, p["cv1"], dtype=dtype)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for mp in p["m"]:
        h = _conv(parts[-1], mp["cv1"], dtype=dtype)
        h = _conv(h, mp["cv2"], dtype=dtype)
        parts.append(parts[-1] + h if shortcut else h)
    return _conv(jnp.concatenate(parts, axis=-1), p["cv2"], dtype=dtype)


def _sppf(x, p, dtype=jnp.float32) -> jnp.ndarray:
    y = _conv(x, p["cv1"], dtype=dtype)

    def pool(v):
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            [(0, 0), (2, 2), (2, 2), (0, 0)])

    y1 = pool(y)
    y2 = pool(y1)
    y3 = pool(y2)
    return _conv(jnp.concatenate([y, y1, y2, y3], axis=-1), p["cv2"],
                 dtype=dtype)


def _upsample2(x) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def forward_features(params, x, spec, dtype=jnp.float32):
    """Backbone + neck. x: (B, H, W, 3) float in [0,1]. Returns 3 level maps
    [(B, H/8, W/8, c3), (B, H/16, W/16, c4), (B, H/32, W/32, c5)]."""
    n1 = spec["n1"]
    del n1  # depth baked into param tree
    y = _conv(x, params["0"], stride=2, dtype=dtype)
    y = _conv(y, params["1"], stride=2, dtype=dtype)
    y = _c2f(y, params["2"], True, dtype)
    y = _conv(y, params["3"], stride=2, dtype=dtype)
    p3 = _c2f(y, params["4"], True, dtype)
    y = _conv(p3, params["5"], stride=2, dtype=dtype)
    p4 = _c2f(y, params["6"], True, dtype)
    y = _conv(p4, params["7"], stride=2, dtype=dtype)
    y = _c2f(y, params["8"], True, dtype)
    p5 = _sppf(y, params["9"], dtype)

    u = jnp.concatenate([_upsample2(p5), p4], axis=-1)
    h4 = _c2f(u, params["12"], False, dtype)
    u = jnp.concatenate([_upsample2(h4), p3], axis=-1)
    out3 = _c2f(u, params["15"], False, dtype)
    u = jnp.concatenate([_conv(out3, params["16"], stride=2, dtype=dtype), h4],
                        axis=-1)
    out4 = _c2f(u, params["18"], False, dtype)
    u = jnp.concatenate([_conv(out4, params["19"], stride=2, dtype=dtype), p5],
                        axis=-1)
    out5 = _c2f(u, params["21"], False, dtype)
    return [out3, out4, out5]


def forward_head(params, feats, spec, dtype=jnp.float32):
    """Detect head. Returns per-level (box_logits (B,h,w,64), cls_logits
    (B,h,w,nc)) — raw, for the loss or for decode()."""
    det = params["22"]
    outs = []
    for lvl, f in enumerate(feats):
        b = _conv(f, det["cv2"][lvl][0], dtype=dtype)
        b = _conv(b, det["cv2"][lvl][1], dtype=dtype)
        b = _conv(b, det["cv2"][lvl][2], act=False, dtype=dtype)
        c = _conv(f, det["cv3"][lvl][0], dtype=dtype)
        c = _conv(c, det["cv3"][lvl][1], dtype=dtype)
        c = _conv(c, det["cv3"][lvl][2], act=False, dtype=dtype)
        outs.append((b, c))
    return outs


def anchor_points(hw_per_level: Sequence[Tuple[int, int]]):
    """Anchor centers (N, 2) in feature-grid units + per-anchor stride (N,)."""
    pts, strides = [], []
    for (h, w), s in zip(hw_per_level, STRIDES):
        yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                              jnp.arange(w, dtype=jnp.float32) + 0.5,
                              indexing="ij")
        pts.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strides.append(jnp.full((h * w,), float(s), jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strides)


def dfl_decode(box_logits: jnp.ndarray) -> jnp.ndarray:
    """(..., 4*REG_MAX) logits → (..., 4) expected ltrb distances."""
    shape = box_logits.shape[:-1] + (4, REG_MAX)
    probs = jax.nn.softmax(box_logits.reshape(shape), axis=-1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)


def decode(level_outputs, nc: int):
    """Raw head outputs → (boxes_xyxy (B, N, 4) in input-pixel space,
    scores (B, N, nc) sigmoid probabilities)."""
    hw = [(b.shape[1], b.shape[2]) for b, _ in level_outputs]
    pts, strides = anchor_points(hw)
    box_l, cls_l = [], []
    for (b, c) in level_outputs:
        bs = b.shape[0]
        box_l.append(b.reshape(bs, -1, 4 * REG_MAX))
        cls_l.append(c.reshape(bs, -1, nc))
    box_logits = jnp.concatenate(box_l, axis=1)
    cls_logits = jnp.concatenate(cls_l, axis=1)
    ltrb = dfl_decode(box_logits)  # (B, N, 4) in grid units
    x1y1 = (pts[None] - ltrb[..., :2]) * strides[None, :, None]
    x2y2 = (pts[None] + ltrb[..., 2:]) * strides[None, :, None]
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    return boxes, jax.nn.sigmoid(cls_logits)


def forward_raw(params, x, size: str = "n", nc: int = 80,
                dtype=jnp.float32):
    """Un-jitted inference graph — compose inside larger jitted steps,
    or trace directly (int8 calibration walks the live param dicts:
    models/yolo/quant.py capture_scales/assign_scales need the
    un-jitted body so conv order and dict identity are observable).

    Full inference graph: (B, H, W, 3) float [0,1] → (boxes, scores)."""
    spec = arch_spec(size, nc)
    feats = forward_features(params, x, spec, dtype)
    outs = forward_head(params, feats, spec, dtype)
    return decode(outs, nc)


forward = jax.jit(forward_raw, static_argnames=("size", "nc", "dtype"))


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Arch dispatch (v8 | 11) — the task heads (seg/pose/obb) attach the same
# cv4/proto branches to either generation's detect layer ("22" vs "23")
# ---------------------------------------------------------------------------

def base_spec(size: str, nc: int, arch: str = "v8") -> Dict[str, Any]:
    """arch_spec of the requested generation + the head layer key."""
    if arch == "11":
        from .yolo11 import arch_spec_11
        spec = arch_spec_11(size, nc)
    else:
        spec = arch_spec(size, nc)
    spec["arch"] = arch
    spec["head"] = "23" if arch == "11" else "22"
    return spec


def base_init(key, size: str, nc: int, arch: str = "v8") -> Dict[str, Any]:
    if arch == "11":
        from .yolo11 import init_params_11
        return init_params_11(key, size, nc)
    return init_params(key, size, nc)


def backbone_head_forward(params, x, spec, dtype=jnp.float32):
    """(feats, per-level head outputs) for the spec's generation."""
    if spec.get("arch", "v8") == "11":
        from .yolo11 import forward_features_11, forward_head_11
        feats = forward_features_11(params, x, spec, dtype)
        return feats, forward_head_11(params, feats, spec, dtype)
    feats = forward_features(params, x, spec, dtype)
    return feats, forward_head(params, feats, spec, dtype)
