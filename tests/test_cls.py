"""YOLOv8-cls: torch-twin parity, importer, predict surface.

Classification is a beyond-reference model family (the reference wrapper
serves detection only, src/detect/yolo_ultralytics.py:16); same parity
strategy as the detect/seg families: one param pytree through two
independent implementations (tests/oracles/torch_yolo.py:v8_cls_forward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import weights, yolov8_cls

from tests.oracles import torch_yolo


def _max_err(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def test_cls_spec_widths():
    s = yolov8_cls.cls_spec("n")
    assert s["widths"] == [16, 32, 64, 128, 256]
    # classify keeps max_channels 1024: the l backbone ends at 1024,
    # where the detect arch clamps to 512
    assert yolov8_cls.cls_spec("l")["widths"][-1] == 1024


def test_cls_forward_matches_torch():
    params = yolov8_cls.init_params_cls(jax.random.PRNGKey(2), "n",
                                        nc=10)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 96, 96, 3).astype(np.float32)
    jl = yolov8_cls.forward_cls(params, jnp.asarray(x), size="n", nc=10,
                                dtype=jnp.float32)
    tl = torch_yolo.v8_cls_forward(params, x)
    assert jl.shape == tl.shape == (2, 10)
    assert _max_err(jl, tl) < 2e-3, _max_err(jl, tl)


def test_cls_state_dict_import():
    torch = pytest.importorskip("torch")
    ref = yolov8_cls.init_params_cls(jax.random.PRNGKey(0), "n", nc=5)
    g = torch.Generator().manual_seed(3)
    sd = {}

    def add_convbn(prefix, tree):
        k, _, cin, cout = tree["w"].shape
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, k, k,
                                                  generator=g) * 0.05
        sd[f"{prefix}.bn.weight"] = torch.rand(cout, generator=g) + 0.5
        sd[f"{prefix}.bn.bias"] = torch.randn(cout, generator=g) * 0.01
        sd[f"{prefix}.bn.running_mean"] = torch.randn(cout,
                                                      generator=g) * 0.01
        sd[f"{prefix}.bn.running_var"] = torch.rand(cout, generator=g) + 0.5

    for i in ("0", "1", "3", "5", "7"):
        add_convbn(f"model.{i}", ref[i])
    for i in ("2", "4", "6", "8"):
        blk = ref[i]
        add_convbn(f"model.{i}.cv1", blk["cv1"])
        add_convbn(f"model.{i}.cv2", blk["cv2"])
        for j, m in enumerate(blk["m"]):
            add_convbn(f"model.{i}.m.{j}.cv1", m["cv1"])
            add_convbn(f"model.{i}.m.{j}.cv2", m["cv2"])
    add_convbn("model.9.conv", ref["9"]["conv"])
    sd["model.9.linear.weight"] = torch.randn(5, 1280, generator=g) * 0.02
    sd["model.9.linear.bias"] = torch.randn(5, generator=g) * 0.01

    assert weights.detect_task(sd) == "classify"
    params = weights.state_dict_to_params_cls(sd)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    # imported tree agrees with the torch twin end-to-end
    rng = np.random.RandomState(1)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    jl = yolov8_cls.forward_cls(params, jnp.asarray(x), size="n", nc=5,
                                dtype=jnp.float32)
    tl = torch_yolo.v8_cls_forward(params, x)
    assert _max_err(jl, tl) < 2e-3
    # linear transpose is the torch convention ((nc, 1280) → x @ W)
    np.testing.assert_allclose(
        np.asarray(params["9"]["lin_w"]),
        sd["model.9.linear.weight"].numpy().T, atol=1e-6)


def test_cls_predict_surface():
    m = yolov8_cls.YOLOCls({"model": "yolov8n-cls.pt", "nc": 7,
                            "imgsz": 64})
    assert not m.loaded and m.nc == 7
    frame = np.random.default_rng(0).integers(
        0, 255, (48, 80, 3)).astype(np.uint8)
    ids, probs = m.predict(frame)
    assert ids.shape == (1,) and probs.shape == (1, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert 0 <= int(ids[0]) < 7
