"""YOLO11 re-implemented natively in JAX (no torch at runtime).

Model-family addition beyond the reference: the reference wrapper pins
``yolov8n.pt`` (src/detect/yolo_ultralytics.py:16), but the ultralytics
API it wraps now DEFAULTS to the YOLO11 generation — a user switching
over brings ``yolo11*.pt`` checkpoints. Architecture follows the
ultralytics ``yolo11.yaml`` so those import 1:1
(models/yolo/weights.py: state_dict_to_params_11):

  * C3k2 everywhere C2f was — a C2f whose inner modules are either
    plain Bottlenecks (e=0.5, unlike C2f's e=1.0) or full C3k blocks
    (a C3 with 3×3 bottlenecks); sizes m/l/x force c3k=True on every
    block (the ultralytics parse_model scale rule);
  * C2PSA after SPPF — n PSA blocks (multi-head attention with a
    depthwise-conv positional encoding + a 2× conv FFN) over half the
    channels, concat with the untouched half;
  * Detect head with depthwise-separable cls branch (DWConv→1×1 twice)
    — the ``legacy=False`` head;
  * detect layer index 23 (the yaml has 24 entries).

TPU-first: attention is three einsums over static (B, N, heads, d)
shapes — N = H·W/1024 at stride 32 is small (400 at 640²), so the
(N, N) score matrix is tiny and MXU-friendly; depthwise convs lower to
``feature_group_count`` grouped convolutions which XLA maps to the VPU.
Everything else (NHWC/HWIO, fused BN, bf16 materialization, fixed-shape
decode) matches yolov8.py.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .yolov8 import (REG_MAX, STRIDES, _conv, _init_conv, _make_divisible,
                     _sppf, _upsample2, decode)

# depth_multiple, width_multiple, max_channels per YOLO11 size
SIZE_CFG_11 = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def _scale_ch(ch: int, width: float, max_ch: int) -> int:
    return _make_divisible(min(ch, max_ch) * width, 8)


def arch_spec_11(size: str = "n", nc: int = 80) -> Dict[str, Any]:
    """Static architecture description for one YOLO11 size."""
    depth, width, max_ch = SIZE_CFG_11[size]
    w = [_scale_ch(c, width, max_ch) for c in (64, 128, 256, 512, 1024)]
    n = max(1, round(2 * depth))            # every block repeats 2·depth
    force_c3k = size in ("m", "l", "x")     # parse_model scale rule
    # (cin, cout, c3k, e) for the 8 C3k2 blocks, keyed by layer index
    c3k2 = {
        "2": (w[1], w[2], force_c3k, 0.25),
        "4": (w[2], w[3], force_c3k, 0.25),
        "6": (w[3], w[3], True, 0.5),
        "8": (w[4], w[4], True, 0.5),
        "13": (w[4] + w[3], w[3], force_c3k, 0.5),
        "16": (w[3] + w[3], w[2], force_c3k, 0.5),
        "19": (w[2] + w[3], w[3], force_c3k, 0.5),
        "22": (w[3] + w[4], w[4], True, 0.5),
    }
    ch_det = (w[2], w[3], w[4])
    c2 = max(16, ch_det[0] // 4, REG_MAX * 4)
    c3 = max(ch_det[0], min(nc, 100))
    return dict(size=size, nc=nc, widths=w, n=n, c3k2=c3k2,
                ch_det=ch_det, c2=c2, c3=c3)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _init_bottleneck(key, c: int) -> Dict[str, Any]:
    """C3k2's plain Bottleneck: 3×3 c→c/2 then 3×3 c/2→c (e=0.5)."""
    k1, k2 = jax.random.split(key)
    ch = int(c * 0.5)
    return {"cv1": _init_conv(k1, c, ch, 3), "cv2": _init_conv(k2, ch, c, 3)}


def _init_c3k(key, c: int) -> Dict[str, Any]:
    """C3k(c, c, n=2): C3 with two e=1.0 3×3 bottlenecks."""
    ks = jax.random.split(key, 7)
    ch = int(c * 0.5)
    return {
        "cv1": _init_conv(ks[0], c, ch, 1),
        "cv2": _init_conv(ks[1], c, ch, 1),
        "cv3": _init_conv(ks[2], 2 * ch, c, 1),
        "m": [{"cv1": _init_conv(ks[3 + 2 * j], ch, ch, 3),
               "cv2": _init_conv(ks[4 + 2 * j], ch, ch, 3)}
              for j in range(2)],
    }


def _init_c3k2(key, cin: int, cout: int, n: int, c3k: bool,
               e: float) -> Dict[str, Any]:
    c = int(cout * e)
    keys = jax.random.split(key, 2 + n)
    p: Dict[str, Any] = {
        "cv1": _init_conv(keys[0], cin, 2 * c, 1),
        "cv2": _init_conv(keys[1], (2 + n) * c, cout, 1),
        "m": [(_init_c3k(keys[2 + j], c) if c3k
               else _init_bottleneck(keys[2 + j], c)) for j in range(n)],
    }
    return p


def _init_attn(key, dim: int) -> Dict[str, Any]:
    """Attention(dim, num_heads=dim//64, attn_ratio=0.5)."""
    nh = dim // 64
    hd = dim // nh
    kd = int(hd * 0.5)
    h = dim + nh * kd * 2
    k1, k2, k3 = jax.random.split(key, 3)
    pe = _init_conv(k3, 1, dim, 3)      # depthwise: HWIO (3,3,1,dim)
    return {"qkv": _init_conv(k1, dim, h, 1),
            "proj": _init_conv(k2, dim, dim, 1),
            "pe": pe}


def _init_psablock(key, c: int) -> Dict[str, Any]:
    ka, k1, k2 = jax.random.split(key, 3)
    return {"attn": _init_attn(ka, c),
            "ffn": [_init_conv(k1, c, c * 2, 1),
                    _init_conv(k2, c * 2, c, 1)]}


def _init_c2psa(key, c1: int, n: int) -> Dict[str, Any]:
    c = int(c1 * 0.5)
    keys = jax.random.split(key, 2 + n)
    return {"cv1": _init_conv(keys[0], c1, 2 * c, 1),
            "cv2": _init_conv(keys[1], 2 * c, c1, 1),
            "m": [_init_psablock(keys[2 + j], c) for j in range(n)]}


def init_params_11(key, size: str = "n", nc: int = 80) -> Dict[str, Any]:
    spec = arch_spec_11(size, nc)
    w, n = spec["widths"], spec["n"]
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {}
    p["0"] = _init_conv(next(keys), 3, w[0], 3)
    p["1"] = _init_conv(next(keys), w[0], w[1], 3)
    p["3"] = _init_conv(next(keys), w[2], w[2], 3)
    p["5"] = _init_conv(next(keys), w[3], w[3], 3)
    p["7"] = _init_conv(next(keys), w[3], w[4], 3)
    p["17"] = _init_conv(next(keys), w[2], w[2], 3)
    p["20"] = _init_conv(next(keys), w[3], w[3], 3)
    for i, (cin, cout, c3k, e) in spec["c3k2"].items():
        p[i] = _init_c3k2(next(keys), cin, cout, n, c3k, e)
    p["9"] = {"cv1": _init_conv(next(keys), w[4], w[4] // 2, 1),
              "cv2": _init_conv(next(keys), (w[4] // 2) * 4, w[4], 1)}
    p["10"] = _init_c2psa(next(keys), w[4], n)

    c2, c3 = spec["c2"], spec["c3"]
    det: Dict[str, Any] = {"cv2": [], "cv3": []}
    for lvl, ch in enumerate(spec["ch_det"]):
        kb = jax.random.split(next(keys), 7)
        box = [
            _init_conv(kb[0], ch, c2, 3),
            _init_conv(kb[1], c2, c2, 3),
            _init_conv(kb[2], c2, 4 * REG_MAX, 1),
        ]
        # depthwise-separable cls branch (legacy=False head)
        cls = [
            {"dw": _init_conv(kb[3], 1, ch, 3),      # HWIO (3,3,1,ch)
             "pw": _init_conv(kb[4], ch, c3, 1)},
            {"dw": _init_conv(kb[5], 1, c3, 3),
             "pw": _init_conv(kb[6], c3, c3, 1)},
            _init_conv(jax.random.fold_in(kb[6], 1), c3, nc, 1),
        ]
        stride = STRIDES[lvl]
        box[2]["b"] = jnp.ones((4 * REG_MAX,), jnp.float32)
        cls[2]["b"] = jnp.full(
            (nc,), math.log(5.0 / nc / (640.0 / stride) ** 2), jnp.float32)
        det["cv2"].append(box)
        det["cv3"].append(cls)
    p["23"] = det
    return p


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _c3k(x, p, dtype=jnp.float32) -> jnp.ndarray:
    y1 = _conv(x, p["cv1"], dtype=dtype)
    for mp in p["m"]:
        h = _conv(y1, mp["cv1"], dtype=dtype)
        h = _conv(h, mp["cv2"], dtype=dtype)
        y1 = y1 + h                       # e=1.0 bottlenecks, shortcut
    y2 = _conv(x, p["cv2"], dtype=dtype)
    return _conv(jnp.concatenate([y1, y2], axis=-1), p["cv3"], dtype=dtype)


def _c3k2(x, p, dtype=jnp.float32) -> jnp.ndarray:
    """C3k2 forward — the C2f split/concat with per-module dispatch:
    a param entry holding "cv3" is a C3k block, else a Bottleneck."""
    y = _conv(x, p["cv1"], dtype=dtype)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for mp in p["m"]:
        if "cv3" in mp:
            parts.append(_c3k(parts[-1], mp, dtype))
        else:
            h = _conv(parts[-1], mp["cv1"], dtype=dtype)
            h = _conv(h, mp["cv2"], dtype=dtype)
            parts.append(parts[-1] + h)   # shortcut (c→c overall)
    return _conv(jnp.concatenate(parts, axis=-1), p["cv2"], dtype=dtype)


def _attention(x, p, dtype=jnp.float32) -> jnp.ndarray:
    """Ultralytics ``Attention``: 1×1 qkv → per-head scaled dot-product
    over the flattened spatial axis → +depthwise positional encoding of
    v → 1×1 proj. x: (B, H, W, C)."""
    b, hh, ww, c = x.shape
    n = hh * ww
    nh = c // 64
    hd = c // nh
    kd = int(hd * 0.5)
    qkv = _conv(x, p["qkv"], act=False, dtype=dtype)     # (B,H,W,nh·(2kd+hd))
    qkv = qkv.reshape(b, n, nh, 2 * kd + hd)
    q, k, v = (qkv[..., :kd], qkv[..., kd:2 * kd], qkv[..., 2 * kd:])
    attn = jnp.einsum("bihd,bjhd->bhij", q, k,
                      preferred_element_type=jnp.float32) * (kd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhij,bjhd->bihd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = out.reshape(b, hh, ww, c)
    vmap = v.reshape(b, hh, ww, c)
    out = out + _conv(vmap, p["pe"], act=False, dtype=dtype)
    return _conv(out.astype(dtype), p["proj"], act=False, dtype=dtype)


def _psablock(x, p, dtype=jnp.float32) -> jnp.ndarray:
    x = x + _attention(x, p["attn"], dtype)
    h = _conv(x.astype(dtype), p["ffn"][0], dtype=dtype)
    h = _conv(h, p["ffn"][1], act=False, dtype=dtype)
    return x + h


def _c2psa(x, p, dtype=jnp.float32) -> jnp.ndarray:
    y = _conv(x, p["cv1"], dtype=dtype)
    c = y.shape[-1] // 2
    a, bpart = y[..., :c], y[..., c:]
    for mp in p["m"]:
        bpart = _psablock(bpart, mp, dtype)
    return _conv(jnp.concatenate([a, bpart.astype(dtype)], axis=-1),
                 p["cv2"], dtype=dtype)


def forward_features_11(params, x, spec, dtype=jnp.float32):
    """Backbone + neck. x: (B, H, W, 3) float [0,1] → 3 level maps."""
    y = _conv(x, params["0"], stride=2, dtype=dtype)
    y = _conv(y, params["1"], stride=2, dtype=dtype)
    y = _c3k2(y, params["2"], dtype)
    y = _conv(y, params["3"], stride=2, dtype=dtype)
    p3 = _c3k2(y, params["4"], dtype)
    y = _conv(p3, params["5"], stride=2, dtype=dtype)
    p4 = _c3k2(y, params["6"], dtype)
    y = _conv(p4, params["7"], stride=2, dtype=dtype)
    y = _c3k2(y, params["8"], dtype)
    y = _sppf(y, params["9"], dtype)
    p5 = _c2psa(y, params["10"], dtype)

    u = jnp.concatenate([_upsample2(p5), p4], axis=-1)
    h4 = _c3k2(u, params["13"], dtype)
    u = jnp.concatenate([_upsample2(h4), p3], axis=-1)
    out3 = _c3k2(u, params["16"], dtype)
    u = jnp.concatenate([_conv(out3, params["17"], stride=2, dtype=dtype),
                         h4], axis=-1)
    out4 = _c3k2(u, params["19"], dtype)
    u = jnp.concatenate([_conv(out4, params["20"], stride=2, dtype=dtype),
                         p5], axis=-1)
    out5 = _c3k2(u, params["22"], dtype)
    return [out3, out4, out5]


def forward_head_11(params, feats, spec, dtype=jnp.float32):
    """Detect head (legacy=False): v8 box branch + depthwise-separable
    cls branch. Returns per-level (box_logits, cls_logits)."""
    det = params["23"]
    outs = []
    for lvl, f in enumerate(feats):
        b = _conv(f, det["cv2"][lvl][0], dtype=dtype)
        b = _conv(b, det["cv2"][lvl][1], dtype=dtype)
        b = _conv(b, det["cv2"][lvl][2], act=False, dtype=dtype)
        c = f
        for blk in det["cv3"][lvl][:2]:
            c = _conv(c, blk["dw"], dtype=dtype)     # depthwise 3×3
            c = _conv(c, blk["pw"], dtype=dtype)     # 1×1
        c = _conv(c, det["cv3"][lvl][2], act=False, dtype=dtype)
        outs.append((b, c))
    return outs


def forward_raw_11(params, x, size: str = "n", nc: int = 80,
                   dtype=jnp.float32):
    """Full inference graph: (B, H, W, 3) float [0,1] → (boxes, scores).
    Un-jitted — compose inside larger jitted steps (same contract as
    yolov8.forward_raw)."""
    spec = arch_spec_11(size, nc)
    feats = forward_features_11(params, x, spec, dtype)
    outs = forward_head_11(params, feats, spec, dtype)
    return decode(outs, nc)


forward_11 = jax.jit(forward_raw_11, static_argnames=("size", "nc",
                                                      "dtype"))
