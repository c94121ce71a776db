"""Int8 quantized inference for the YOLO conv path (opt-in experiment).

TPU MXUs execute int8×int8 → int32 at twice the bf16 rate and a quarter
of the weight HBM traffic; this module provides the standard symmetric
scheme (ROADMAP "int8 quantization of the YOLO conv path"):

  * weights: per-output-channel symmetric int8
    (scale = max|w[..., o]| / 127), quantized once at load;
  * activations: dynamic per-tensor symmetric int8, quantized on the fly
    inside the conv wrapper;
  * accumulation in int32, dequantized with the product of scales, bias
    added in f32, SiLU in f32.

Enabled via ``detect.compute_dtype: "int8"``. Accuracy: quantization is
lossy by design (this is why it is opt-in) — tests bound the deviation
of boxes/scores vs the f32 forward.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


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
            act: bool = True, pad: int = None) -> jnp.ndarray:
    """Quantized counterpart of yolov8._conv: dynamic per-tensor activation
    quant, int8×int8 conv with int32 accumulation, f32 dequant + SiLU."""
    k = p["w_i8"].shape[0]
    pad = k // 2 if pad is None else pad
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    x_i8 = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_i8, p["w_i8"],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * p["w_scale"]) + p["b"]
    return jax.nn.silu(out) if act else out
