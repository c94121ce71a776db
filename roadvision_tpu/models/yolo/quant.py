"""Int8 quantized inference for the YOLO conv path (opt-in experiment).

TPU MXUs execute int8×int8 → int32 at twice the bf16 rate and a quarter
of the weight HBM traffic; this module provides the standard symmetric
scheme (ROADMAP "int8 quantization of the YOLO conv path"):

  * weights: per-output-channel symmetric int8
    (scale = max|w[..., o]| / 127), quantized once at load;
  * activations: per-tensor symmetric int8 — **dynamic** by default
    (scale from each tensor's live abs-max, zero setup, but one extra
    full reduction pass per conv), or **static** after calibration
    (:func:`capture_scales` + :func:`assign_scales`, or
    ``YOLOJax.calibrate_int8``): per-conv scales measured once over
    calibration batches (running abs-max) and baked into the param
    pytree as ``a_scale`` leaves, removing the per-conv reduction —
    the measured reason dynamic int8 trailed bf16 on the dev attach;
  * accumulation in int32, dequantized with the product of scales, bias
    added in f32, SiLU in f32.

Calibration mechanics: convs execute in a deterministic, shape-
independent order, so one traced pass collects each conv's dynamic
scale in order (the collector list is filled with tracers at trace
time and returned as a stacked array), and one eager pass over the
same code path pops the reduced scales back into the live param dicts.

Enabled via ``detect.compute_dtype: "int8"``. Accuracy: quantization is
lossy by design (this is why it is opt-in) — tests bound the deviation
of boxes/scores vs the f32 forward; static scales additionally clip
activations outside the calibration range (standard post-training
quantization behavior).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

# calibration hooks (module-level: conv_i8 is called from deep inside the
# model graph; both are None outside the two calibration passes)
_CAPTURE: Optional[List] = None   # pass 1: collect dynamic scales (traced)
_ASSIGN: Optional[Any] = None     # pass 2: iterator of final scales (eager)


def quantize_conv(p: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """{"w" (H,W,I,O), "b"} → {"w_i8", "w_scale" (O,), "b"}."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    w_i8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w_i8": w_i8, "w_scale": scale, "b": p["b"]}


def quantize_params(params: Any) -> Any:
    """Quantize every conv leaf-dict in a YOLO param pytree."""
    if isinstance(params, dict):
        if "w" in params and "b" in params and params["w"].ndim == 4:
            return quantize_conv(params)
        return {k: quantize_params(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(quantize_params(v) for v in params)
    return params


def conv_i8(x: jnp.ndarray, p: Dict[str, jnp.ndarray], stride: int = 1,
            act=True, pad: int = None) -> jnp.ndarray:
    """Quantized counterpart of yolov8._conv (and rtdetr._conv):
    per-tensor activation quant (dynamic, or static when the dict
    carries a calibrated ``a_scale``), int8×int8 conv with int32
    accumulation, f32 dequant + activation. ``act``: True/"silu",
    "relu", "gelu", or False/None."""
    global _ASSIGN
    k = p["w_i8"].shape[0]
    pad = k // 2 if pad is None else pad
    xf = x.astype(jnp.float32)
    if _ASSIGN is not None:
        # calibration pass 2 (eager): bake the next reduced scale into
        # the LIVE param dict, in the same execution order pass 1 saw
        p["a_scale"] = jnp.float32(next(_ASSIGN))
    dyn = None
    if "a_scale" not in p or _CAPTURE is not None:
        dyn = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    if _CAPTURE is not None:
        _CAPTURE.append(dyn)
    a_scale = p["a_scale"] if "a_scale" in p else dyn
    x_i8 = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_i8, p["w_i8"],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1] // p["w_i8"].shape[2],
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * p["w_scale"]) + p["b"]
    if act is True or act == "silu":
        return jax.nn.silu(out)
    if act == "relu":
        return jax.nn.relu(out)
    if act == "gelu":
        return jax.nn.gelu(out)
    return out


def capture_scales(forward, params, imgs) -> jnp.ndarray:
    """Run ``forward(params, imgs)`` collecting every conv's DYNAMIC
    activation scale, in execution order → (n_convs,) f32.

    jit-safe: under trace the collector fills with tracers that become
    part of the returned value; already-calibrated convs still report
    their live dynamic scale (so re-calibration sees fresh data).
    """
    global _CAPTURE
    prev = _CAPTURE
    _CAPTURE = scales = []
    try:
        forward(params, imgs)
    finally:
        _CAPTURE = prev
    if not scales:
        raise RuntimeError("no quantized convs executed — was the model "
                           "quantized (quantize_params)?")
    return jnp.stack(scales)


def assign_scales(forward, params, scales, imgs_tiny) -> int:
    """Bake reduced calibration ``scales`` (n_convs,) into the live param
    pytree as per-conv ``a_scale`` leaves.

    Runs one EAGER forward over a tiny image: eager execution visits the
    actual param dicts (not tracers), in the identical order
    :func:`capture_scales` recorded — shape-independent, so ``imgs_tiny``
    can be minimal. Returns the number of scales assigned; raises on a
    count mismatch (a changed model graph between the two passes).
    """
    global _ASSIGN
    vals = [float(s) for s in np.asarray(scales).ravel()]
    _ASSIGN = it = iter(vals)
    try:
        forward(params, imgs_tiny)
    finally:
        _ASSIGN = None
    leftover = sum(1 for _ in it)
    if leftover:
        raise RuntimeError(
            f"calibration mismatch: {leftover} of {len(vals)} scales "
            f"unconsumed — model graph changed between passes")
    return len(vals)


def has_static_scales(params: Any) -> bool:
    """True when every quantized conv dict carries a calibrated a_scale."""
    found = []

    def walk(t):
        if isinstance(t, dict):
            if "w_i8" in t:
                found.append("a_scale" in t)
            for v in t.values():
                walk(v)
        elif isinstance(t, (list, tuple)):
            for v in t:
                walk(v)

    walk(params)
    return bool(found) and all(found)


def clear_static_scales(params: Any) -> None:
    """Drop calibrated a_scale leaves (back to dynamic quantization)."""
    if isinstance(params, dict):
        params.pop("a_scale", None)
        for v in params.values():
            clear_static_scales(v)
    elif isinstance(params, (list, tuple)):
        for v in params:
            clear_static_scales(v)
