"""YOLOv8-seg: instance segmentation head, natively in JAX.

TPU-native model-family addition beyond the reference (the reference's
detector wrapper loads detection checkpoints only,
src/detect/yolo_ultralytics.py:16 — but the ultralytics API surface it
wraps also serves ``yolov8*-seg.pt``; a user switching from the
reference finds the segment task here). Architecture follows the
ultralytics Segment head convention so real ``-seg`` checkpoints import
1:1 (models/yolo/weights.py:state_dict_to_params_seg):

  * the detection backbone/neck/head of yolov8.py — or YOLO11's
    (``arch="11"``: the same cv4/proto branches on detect layer
    23, so ``yolo11*-seg.pt`` imports 1:1 too);
  * ``cv4`` — a third per-level branch predicting ``nm`` mask
    coefficients per anchor (Conv k3 → Conv k3 → 1×1 to nm);
  * ``proto`` — a prototype-mask head on the P3 (stride-8) feature:
    Conv k3 → 2× learned upsample (ConvTranspose 2×2 s2) → Conv k3 →
    1×1-to-nm Conv, giving ``nm`` prototype masks at input/4 resolution.

Per-instance masks are the sigmoid of a linear combination of the
prototypes with that instance's coefficients (composed after NMS in
ops/masks.py — fixed-shape, gather-free).

TPU-first notes: the ConvTranspose upsample is expressed as one einsum
(pixel × 2×2-kernel → MXU matmul) followed by a reshape-interleave —
no scatter, no lax.conv_transpose edge cases; everything else reuses the
NHWC/HWIO fused-conv primitives of yolov8.py. Static shapes throughout;
the decode emits fixed (B, N, nm) coefficients alongside the detection
decode so the NMS stays the fixed-shape kernel of ops/nms.py.

Channel scaling: ``nm`` (32) is size-invariant; the prototype channel
count ``npr`` (256) scales with the width multiple like every other
channel (ultralytics parse_model convention).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .yolov8 import (REG_MAX, SIZE_CFG, _conv, _init_conv, _scale_ch,
                     backbone_head_forward, base_init, base_spec, decode)

NM = 32          # prototype / coefficient count (size-invariant)
NPR = 256        # prototype head width before width-multiple scaling


def seg_spec(size: str = "n", nc: int = 80,
             arch: str = "v8") -> Dict[str, Any]:
    """arch spec (v8 or 11) + the segmentation head's channel plan."""
    spec = base_spec(size, nc, arch)
    if arch == "11":
        from .yolo11 import SIZE_CFG_11
        _, width, max_ch = SIZE_CFG_11[size]
    else:
        _, width, max_ch = SIZE_CFG[size]
    spec["nm"] = NM
    spec["npr"] = _scale_ch(NPR, width, max_ch)
    spec["c4"] = max(spec["ch_det"][0] // 4, NM)
    return spec


def init_params_seg(key, size: str = "n", nc: int = 80,
                    arch: str = "v8") -> Dict[str, Any]:
    """Detection pytree + head ``cv4`` + ``proto`` (random init)."""
    kd, kc, kp = jax.random.split(key, 3)
    p = base_init(kd, size, nc, arch)
    spec = seg_spec(size, nc, arch)
    c4, nm, npr = spec["c4"], spec["nm"], spec["npr"]

    cv4 = []
    for lvl, ch in enumerate(spec["ch_det"]):
        ks = jax.random.split(jax.random.fold_in(kc, lvl), 3)
        cv4.append([
            _init_conv(ks[0], ch, c4, 3),
            _init_conv(ks[1], c4, c4, 3),
            _init_conv(ks[2], c4, nm, 1),
        ])
    p[spec["head"]]["cv4"] = cv4

    kp1, kup, kp2, kp3 = jax.random.split(kp, 4)
    ch_p3 = spec["ch_det"][0]
    fan = npr * 2 * 2
    p[spec["head"]]["proto"] = {
        "cv1": _init_conv(kp1, ch_p3, npr, 3),
        # ConvTranspose 2×2 s2 kernel, stored HWIO (2, 2, npr, npr)
        "up_w": jax.random.normal(kup, (2, 2, npr, npr), jnp.float32)
        * math.sqrt(2.0 / fan),
        "up_b": jnp.zeros((npr,), jnp.float32),
        "cv2": _init_conv(kp2, npr, npr, 3),
        "cv3": _init_conv(kp3, npr, nm, 1),
    }
    return p


def _upsample_deconv2(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2) as einsum + interleave.

    With kernel 2 and stride 2 every output pixel receives exactly one
    kernel tap: out[2i+di, 2j+dj] = Σ_c in[i,j,c]·K[di,dj,c,o]. That is
    a (C → 4·O) matmul per pixel (MXU) and a reshape — cheaper and
    simpler on TPU than the general transposed-conv lowering.
    """
    bsz, h, wd, _ = x.shape
    o = w.shape[-1]
    y = jnp.einsum("bhwc,ijco->bhwijo", x.astype(dtype), w.astype(dtype),
                   preferred_element_type=jnp.float32)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * h, 2 * wd, o)
    return y + b


def _proto_forward(p: Dict[str, Any], x: jnp.ndarray,
                   dtype=jnp.float32) -> jnp.ndarray:
    """P3 feature (B, H/8, W/8, ch) → prototypes (B, H/4, W/4, nm)."""
    y = _conv(x, p["cv1"], dtype=dtype)
    y = _upsample_deconv2(y, p["up_w"], p["up_b"], dtype=dtype)
    # ultralytics' ConvTranspose2d is bias-only (no BN/act); SiLU comes
    # with the next Conv block
    y = _conv(y.astype(dtype), p["cv2"], dtype=dtype)
    return _conv(y, p["cv3"], dtype=dtype)


def forward_coeffs(params, feats, spec, dtype=jnp.float32) -> jnp.ndarray:
    """Per-level cv4 branch → concatenated (B, N, nm) coefficients
    (raw linear outputs — composition applies sigmoid after the dot)."""
    cv4 = params[spec.get("head", "22")]["cv4"]
    outs = []
    for lvl, f in enumerate(feats):
        m = _conv(f, cv4[lvl][0], dtype=dtype)
        m = _conv(m, cv4[lvl][1], dtype=dtype)
        m = _conv(m, cv4[lvl][2], act=False, dtype=dtype)
        outs.append(m.reshape(m.shape[0], -1, spec["nm"]))
    return jnp.concatenate(outs, axis=1)


def forward_seg_raw(params, x, size: str = "n", nc: int = 80,
                    dtype=jnp.float32, arch: str = "v8"):
    """(B, H, W, 3) float [0,1] → (boxes (B,N,4), scores (B,N,nc),
    coeffs (B,N,nm), protos (B,H/4,W/4,nm)). Un-jitted — compose inside
    larger jitted steps (same contract as yolov8.forward_raw)."""
    spec = seg_spec(size, nc, arch)
    feats, outs = backbone_head_forward(params, x, spec, dtype)
    boxes, scores = decode(outs, nc)
    coeffs = forward_coeffs(params, feats, spec, dtype)
    protos = _proto_forward(params[spec["head"]]["proto"], feats[0], dtype)
    return boxes, scores, coeffs, protos


forward_seg = jax.jit(forward_seg_raw, static_argnames=("size", "nc",
                                                        "dtype", "arch"))
