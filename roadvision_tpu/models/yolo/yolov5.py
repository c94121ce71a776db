"""YOLOv5 (v6.0 layout) natively in JAX — the reference's alternate model.

The reference config offers ``yolov5n.pt`` as a drop-in detector weight
(configs/default.yaml:39 comment); this implements the matching
architecture: 6×6 stem Conv, C3 stages, SPPF, FPN/PAN neck, and the
anchor-based coupled Detect head with the v5 decode
(xy = (2σ−0.5+grid)·stride, wh = (2σ)²·anchor, obj×cls scores).

Sizes n/s/m/l/x via the standard depth/width multiples. Param tree is
keyed by ultralytics layer indices ("0".."24") so the .pt state-dict
mapping stays 1:1 (weights.py handles import + BN fusion).
Conv/SPPF/upsample building blocks are shared with yolov8.py.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .yolov8 import (_conv, _init_conv, _sppf, _upsample2, _make_divisible)

SIZE_CFG = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}
STRIDES = (8, 16, 32)
NUM_ANCHORS = 3
# v5 anchor priors (w, h) in input pixels per level
ANCHORS = np.array([
    [[10, 13], [16, 30], [33, 23]],
    [[30, 61], [62, 45], [59, 119]],
    [[116, 90], [156, 198], [373, 326]],
], np.float32)


def _scale_ch(ch: int, width: float) -> int:
    return _make_divisible(ch * width, 8)


def _scale_depth(n: int, depth: float) -> int:
    return max(1, round(n * depth))


def arch_spec(size: str = "n", nc: int = 80) -> Dict[str, Any]:
    depth, width = SIZE_CFG[size]
    w = [_scale_ch(c, width) for c in (64, 128, 256, 512, 1024)]
    return dict(size=size, nc=nc, widths=w,
                d3=_scale_depth(3, depth), d6=_scale_depth(6, depth),
                d9=_scale_depth(9, depth), ch_det=(w[2], w[3], w[4]))


def _init_c3(key, cin: int, cout: int, n: int) -> Dict[str, Any]:
    c = cout // 2
    keys = jax.random.split(key, 3 + 2 * n)
    p: Dict[str, Any] = {
        "cv1": _init_conv(keys[0], cin, c, 1),
        "cv2": _init_conv(keys[1], cin, c, 1),
        "cv3": _init_conv(keys[2], 2 * c, cout, 1),
        "m": [],
    }
    for j in range(n):
        p["m"].append({
            "cv1": _init_conv(keys[3 + 2 * j], c, c, 1),
            "cv2": _init_conv(keys[4 + 2 * j], c, c, 3),
        })
    return p


def init_params(key, size: str = "n", nc: int = 80) -> Dict[str, Any]:
    spec = arch_spec(size, nc)
    w = spec["widths"]
    d3, d6, d9 = spec["d3"], spec["d6"], spec["d9"]
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {}
    p["0"] = _init_conv(next(keys), 3, w[0], 6)
    p["1"] = _init_conv(next(keys), w[0], w[1], 3)
    p["2"] = _init_c3(next(keys), w[1], w[1], d3)
    p["3"] = _init_conv(next(keys), w[1], w[2], 3)
    p["4"] = _init_c3(next(keys), w[2], w[2], d6)
    p["5"] = _init_conv(next(keys), w[2], w[3], 3)
    p["6"] = _init_c3(next(keys), w[3], w[3], d9)
    p["7"] = _init_conv(next(keys), w[3], w[4], 3)
    p["8"] = _init_c3(next(keys), w[4], w[4], d3)
    p["9"] = {"cv1": _init_conv(next(keys), w[4], w[4] // 2, 1),
              "cv2": _init_conv(next(keys), (w[4] // 2) * 4, w[4], 1)}
    p["10"] = _init_conv(next(keys), w[4], w[3], 1)
    p["13"] = _init_c3(next(keys), 2 * w[3], w[3], d3)
    p["14"] = _init_conv(next(keys), w[3], w[2], 1)
    p["17"] = _init_c3(next(keys), 2 * w[2], w[2], d3)
    p["18"] = _init_conv(next(keys), w[2], w[2], 3)
    p["20"] = _init_c3(next(keys), 2 * w[2], w[3], d3)
    p["21"] = _init_conv(next(keys), w[3], w[3], 3)
    p["23"] = _init_c3(next(keys), 2 * w[3], w[4], d3)

    det: List[Dict[str, jnp.ndarray]] = []
    no = NUM_ANCHORS * (5 + nc)
    for lvl, ch in enumerate(spec["ch_det"]):
        conv = _init_conv(next(keys), ch, no, 1)
        # v5 bias init: obj = log(8/(640/s)²), cls = log(0.6/(nc-0.99))
        b = np.zeros((NUM_ANCHORS, 5 + nc), np.float32)
        b[:, 4] = math.log(8.0 / (640.0 / STRIDES[lvl]) ** 2)
        b[:, 5:] = math.log(0.6 / (nc - 0.99))
        conv["b"] = jnp.asarray(b.reshape(-1))
        det.append(conv)
    p["24"] = {"m": det}
    return p


def _c3(x, p, shortcut: bool, dtype=jnp.float32) -> jnp.ndarray:
    a = _conv(x, p["cv1"], dtype=dtype)
    for mp in p["m"]:
        h = _conv(a, mp["cv1"], dtype=dtype)
        h = _conv(h, mp["cv2"], dtype=dtype)
        a = a + h if shortcut else h
    b = _conv(x, p["cv2"], dtype=dtype)
    return _conv(jnp.concatenate([a, b], axis=-1), p["cv3"], dtype=dtype)


def forward_features(params, x, spec, dtype=jnp.float32):
    y = _conv(x, params["0"], stride=2, dtype=dtype, pad=2)  # 6x6 stem, p=2
    y = _conv(y, params["1"], stride=2, dtype=dtype)
    y = _c3(y, params["2"], True, dtype)
    y = _conv(y, params["3"], stride=2, dtype=dtype)
    p3 = _c3(y, params["4"], True, dtype)
    y = _conv(p3, params["5"], stride=2, dtype=dtype)
    p4 = _c3(y, params["6"], True, dtype)
    y = _conv(p4, params["7"], stride=2, dtype=dtype)
    y = _c3(y, params["8"], True, dtype)
    p5 = _sppf(y, params["9"], dtype)

    h5 = _conv(p5, params["10"], dtype=dtype)
    u = jnp.concatenate([_upsample2(h5), p4], axis=-1)
    y = _c3(u, params["13"], False, dtype)
    h4 = _conv(y, params["14"], dtype=dtype)
    u = jnp.concatenate([_upsample2(h4), p3], axis=-1)
    out3 = _c3(u, params["17"], False, dtype)
    u = jnp.concatenate([_conv(out3, params["18"], stride=2, dtype=dtype),
                         h4], axis=-1)
    out4 = _c3(u, params["20"], False, dtype)
    u = jnp.concatenate([_conv(out4, params["21"], stride=2, dtype=dtype),
                         h5], axis=-1)
    out5 = _c3(u, params["23"], False, dtype)
    return [out3, out4, out5]


def decode(level_maps, nc: int):
    """Anchor-based decode → (boxes_xyxy (B, N, 4), scores (B, N, nc))."""
    boxes_l, scores_l = [], []
    for lvl, raw in enumerate(level_maps):
        bs, h, w, _ = raw.shape
        stride = float(STRIDES[lvl])
        raw = raw.reshape(bs, h, w, NUM_ANCHORS, 5 + nc)
        sig = jax.nn.sigmoid(raw)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
        anchors = jnp.asarray(ANCHORS[lvl])[None, None, None, :, :]
        xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = (sig[..., 2:4] * 2.0) ** 2 * anchors
        obj = sig[..., 4:5]
        cls = sig[..., 5:] * obj
        x1y1 = xy - wh / 2
        x2y2 = xy + wh / 2
        boxes_l.append(jnp.concatenate([x1y1, x2y2], -1).reshape(bs, -1, 4))
        scores_l.append(cls.reshape(bs, -1, nc))
    return jnp.concatenate(boxes_l, 1), jnp.concatenate(scores_l, 1)


def forward_head(params, feats, spec, dtype=jnp.float32):
    return [_conv(f, params["24"]["m"][lvl], act=False, dtype=dtype)
            for lvl, f in enumerate(feats)]


def forward_raw(params, x, size: str = "n", nc: int = 80,
                dtype=jnp.float32):
    """Un-jitted inference graph — compose inside larger jitted steps,
    or trace directly (int8 calibration walks the live param dicts:
    models/yolo/quant.py capture_scales/assign_scales need the
    un-jitted body so conv order and dict identity are observable)."""
    spec = arch_spec(size, nc)
    feats = forward_features(params, x, spec, dtype)
    return decode(forward_head(params, feats, spec, dtype), nc)


forward = jax.jit(forward_raw, static_argnames=("size", "nc", "dtype"))
