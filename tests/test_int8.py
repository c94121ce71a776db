"""Int8 quantized conv path (models/yolo/quant.py, opt-in experiment)."""
import numpy as np

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import yolov8
from roadvision_tpu.models.yolo.quant import (conv_i8, quantize_conv,
                                              quantize_params)


def test_quantize_conv_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 8, 16).astype(np.float32) * 0.2
    p = {"w": jnp.asarray(w), "b": jnp.zeros(16)}
    q = quantize_conv(p)
    assert q["w_i8"].dtype == jnp.int8
    deq = np.asarray(q["w_i8"]).astype(np.float32) * np.asarray(q["w_scale"])
    # per-channel symmetric: error within half a quantization step
    step = np.asarray(q["w_scale"])
    assert (np.abs(deq - w) <= step / 2 + 1e-7).all()


def test_conv_i8_close_to_f32():
    rng = np.random.RandomState(1)
    p = {"w": jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32) * 0.3),
         "b": jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)}
    x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    ref = yolov8._conv(x, p)
    got = conv_i8(x, quantize_conv(p))
    err = np.abs(np.asarray(ref) - np.asarray(got))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale


def test_quantized_forward_close_to_f32():
    params = yolov8.init_params(jax.random.PRNGKey(2), "n")
    qparams = quantize_params(params)
    # every conv kernel got quantized: any remaining 4-D leaf is int8
    for leaf in jax.tree_util.tree_leaves(qparams):
        if leaf.ndim == 4:
            assert leaf.dtype == jnp.int8
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    b32, s32 = yolov8.forward(params, x, size="n", nc=80,
                              dtype=jnp.float32)
    b8, s8 = yolov8.forward(qparams, x, size="n", nc=80, dtype=jnp.float32)
    # scores are sigmoid probabilities; random init keeps them mid-range,
    # quantization noise accumulates over ~60 convs — bound loosely
    assert np.abs(np.asarray(s32) - np.asarray(s8)).max() < 0.15
    # decoded boxes within a few pixels at 128 input
    assert np.abs(np.asarray(b32) - np.asarray(b8)).max() < 8.0


def test_detector_int8_config_runs():
    from roadvision_tpu.detect.yolo_jax import YOLOJax
    det = YOLOJax({"model": "missing.pt", "compute_dtype": "int8",
                   "imgsz": 128, "max_det": 10, "conf_thres": 0.0,
                   "classes_keep": []})
    assert det.int8
    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    out = det.infer_batch(frames)
    assert out.boxes.shape == (2, 10, 4)
    assert out.valid.any()
