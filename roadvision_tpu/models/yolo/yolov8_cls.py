"""YOLOv8-cls: image classification head, natively in JAX.

Model-family addition beyond the reference (its wrapper serves detection
checkpoints only, src/detect/yolo_ultralytics.py:16; the ultralytics API
it wraps also ships ``yolov8*-cls.pt``). Architecture follows the
ultralytics classify convention so real ``-cls`` checkpoints import 1:1
(models/yolo/weights.py:state_dict_to_params_cls):

  * the detection BACKBONE stem + C2f stages (layers 0-8 of yolov8.py)
    without SPPF or neck — the classify yaml ends the backbone at the
    stride-32 C2f;
  * ``Classify`` head (layer 9): 1×1 Conv to 1280 (size-invariant) →
    global average pool → Linear to nc.

TPU-first: everything reuses the NHWC/HWIO fused-conv primitives; the
global pool + linear collapse to a mean and one matmul. Static shapes;
``forward_cls`` returns raw logits (softmax on the host/consumer side).

Classify scaling note: all sizes keep max_channels 1024 (the detection
l/x clamp to 512), so the deep stages are wider than the detect
backbone at l/x.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .yolov8 import (SIZE_CFG, _conv, _c2f, _init_c2f, _init_conv,
                     _scale_ch, _scale_depth)

C_HEAD = 1280       # Classify hidden width (size-invariant)
CLS_MAX_CH = 1024   # classify yaml keeps 1024 for every size


def cls_spec(size: str = "n", nc: int = 1000) -> Dict[str, Any]:
    depth, width, _ = SIZE_CFG[size]
    w = [_scale_ch(c, width, CLS_MAX_CH) for c in (64, 128, 256, 512,
                                                   1024)]
    return dict(size=size, nc=nc, widths=w,
                n1=_scale_depth(3, depth), n2=_scale_depth(6, depth))


def init_params_cls(key, size: str = "n", nc: int = 1000) -> Dict[str, Any]:
    spec = cls_spec(size, nc)
    w, n1, n2 = spec["widths"], spec["n1"], spec["n2"]
    keys = iter(jax.random.split(key, 16))
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
    kc, kl = jax.random.split(next(keys))
    p["9"] = {
        "conv": _init_conv(kc, w[4], C_HEAD, 1),
        "lin_w": jax.random.normal(kl, (C_HEAD, nc), jnp.float32)
        * math.sqrt(1.0 / C_HEAD),
        "lin_b": jnp.zeros((nc,), jnp.float32),
    }
    return p


def forward_cls_raw(params, x, size: str = "n", nc: int = 1000,
                    dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, W, 3) float [0,1] → (B, nc) raw logits."""
    del size, nc  # depth/width are baked into the param tree
    y = _conv(x, params["0"], stride=2, dtype=dtype)
    y = _conv(y, params["1"], stride=2, dtype=dtype)
    y = _c2f(y, params["2"], True, dtype)
    y = _conv(y, params["3"], stride=2, dtype=dtype)
    y = _c2f(y, params["4"], True, dtype)
    y = _conv(y, params["5"], stride=2, dtype=dtype)
    y = _c2f(y, params["6"], True, dtype)
    y = _conv(y, params["7"], stride=2, dtype=dtype)
    y = _c2f(y, params["8"], True, dtype)
    y = _conv(y, params["9"]["conv"], dtype=dtype)     # 1×1 → 1280, SiLU
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # global avg
    return pooled @ params["9"]["lin_w"] + params["9"]["lin_b"]


forward_cls = jax.jit(forward_cls_raw, static_argnames=("size", "nc",
                                                        "dtype"))


class YOLOCls:
    """Minimal classify surface: ``predict(bgr_u8) -> (cls_id, probs)``.

    Preprocessing follows the ultralytics classify transform in spirit
    (center-crop to square, bilinear resize to imgsz, RGB [0,1]); exact
    torchvision CenterCrop parity is not claimed.
    """

    def __init__(self, cfg: Dict[str, Any]):
        from . import weights as W
        model_ref = cfg.get("model", "yolov8n-cls.pt")
        self.imgsz = int(cfg.get("imgsz", 224))
        size = "n"
        for s in ("n", "s", "m", "l", "x"):
            if f"yolov8{s}" in str(model_ref).lower():
                size = s
        self.size = size
        loaded_sd = None
        from pathlib import Path
        pth = Path(str(model_ref))
        if pth.exists():
            loaded_sd = W._load_torch(pth) if pth.suffix == ".pt" \
                else dict(np.load(pth))
        if loaded_sd is not None:
            self.params = W.state_dict_to_params_cls(loaded_sd)
            self.size = W.infer_size_from_state_dict(loaded_sd)
            self.loaded = True
        else:
            nc = int(cfg.get("nc", 1000))
            self.params = init_params_cls(jax.random.PRNGKey(0), size, nc)
            self.loaded = False
        self.nc = int(self.params["9"]["lin_b"].shape[0])

    def predict(self, bgr_u8):
        x = np.asarray(bgr_u8)
        if x.ndim == 3:
            x = x[None]
        b, h, w = x.shape[:3]
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        crop = x[:, y0:y0 + s, x0:x0 + s, ::-1]      # center square, RGB
        img = jax.image.resize(jnp.asarray(crop, jnp.float32),
                               (b, self.imgsz, self.imgsz, 3),
                               method="bilinear") / 255.0
        logits = forward_cls(self.params, img, size=self.size, nc=self.nc)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        return probs.argmax(-1), probs
