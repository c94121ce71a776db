"""YOLOv5-JAX: arch shapes, anchored decode analytics, importer, backend."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import yolov5, weights


def test_arch_spec_sizes():
    n = yolov5.arch_spec("n")
    assert n["widths"] == [16, 32, 64, 128, 256]
    assert (n["d3"], n["d6"], n["d9"]) == (1, 2, 3)
    s = yolov5.arch_spec("s")
    assert s["widths"] == [32, 64, 128, 256, 512]


def test_param_count_yolov5n():
    params = yolov5.init_params(jax.random.PRNGKey(0), "n")
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params))
    # ultralytics yolov5n ~1.9M params
    assert 1.6e6 < n < 2.1e6, n


def test_forward_shapes():
    params = yolov5.init_params(jax.random.PRNGKey(0), "n")
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    boxes, scores = yolov5.forward(params, x, size="n", nc=80)
    n_anchors = 3 * (40 * 40 + 20 * 20 + 10 * 10)
    assert boxes.shape == (1, n_anchors, 4)
    assert scores.shape == (1, n_anchors, 80)
    assert float(scores.min()) >= 0 and float(scores.max()) <= 1


def test_v5_decode_analytic():
    """Zero logits → σ=0.5 → xy at (2·0.5−0.5+grid)·stride, wh = anchor."""
    nc = 2
    h = w = 2
    raw = np.zeros((1, h, w, 3 * (5 + nc)), np.float32)
    boxes, scores = yolov5.decode([jnp.asarray(raw)], nc)
    b = np.asarray(boxes).reshape(h, w, 3, 4)
    # grid cell (0,0), anchor 0 at stride 8: center (0.5*8, 0.5*8) = (4, 4),
    # wh = (2*0.5)^2 * (10, 13) = (10, 13)
    np.testing.assert_allclose(b[0, 0, 0], [4 - 5, 4 - 6.5, 4 + 5, 4 + 6.5],
                               atol=1e-5)
    # cell (1, 0) → center x = 1.5*8
    np.testing.assert_allclose(b[0, 1, 0, 0], 12 - 5, atol=1e-5)
    # scores = obj(0.5) * cls(0.5)
    np.testing.assert_allclose(np.asarray(scores), 0.25, atol=1e-6)


def test_v5_state_dict_import():
    torch = pytest.importorskip("torch")
    ref = yolov5.init_params(jax.random.PRNGKey(0), "n")
    sd = {}

    def add_convbn(prefix, tree, k=None):
        w = tree["w"]
        k = k or w.shape[0]
        sd[f"{prefix}.conv.weight"] = torch.randn(w.shape[3], w.shape[2],
                                                  w.shape[0], w.shape[1])
        for name, val in [("weight", torch.ones), ("bias", torch.zeros),
                          ("running_mean", torch.zeros)]:
            sd[f"{prefix}.bn.{name}"] = val(w.shape[3])
        sd[f"{prefix}.bn.running_var"] = torch.ones(w.shape[3]) - 1e-3

    for i in weights._V5_CONV_LAYERS:
        add_convbn(f"model.{i}", ref[i])
    for i in weights._V5_C3_LAYERS:
        for part in ("cv1", "cv2", "cv3"):
            add_convbn(f"model.{i}.{part}", ref[i][part])
        for j, m in enumerate(ref[i]["m"]):
            add_convbn(f"model.{i}.m.{j}.cv1", m["cv1"])
            add_convbn(f"model.{i}.m.{j}.cv2", m["cv2"])
    add_convbn("model.9.cv1", ref["9"]["cv1"])
    add_convbn("model.9.cv2", ref["9"]["cv2"])
    for lvl in range(3):
        w = ref["24"]["m"][lvl]["w"]
        sd[f"model.24.m.{lvl}.weight"] = torch.randn(w.shape[3], w.shape[2],
                                                     1, 1)
        sd[f"model.24.m.{lvl}.bias"] = torch.randn(w.shape[3])
    sd["model.24.anchors"] = torch.zeros(3, 3, 2)

    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and arch == "v5" and size == "n"
    assert jax.tree_util.tree_structure(params) \
        == jax.tree_util.tree_structure(ref)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes, scores = yolov5.forward(params, x, size="n", nc=80)
    assert boxes.shape[1] == 3 * (8 * 8 + 4 * 4 + 2 * 2)


def test_v5_backend_runs():
    from roadvision_tpu.detect import build_detector
    det = build_detector({"backend": "ultralytics", "model": "yolov5n.pt",
                          "device": "cpu", "conf_thres": 0.25,
                          "iou_thres": 0.7, "max_det": 10, "imgsz": 128,
                          "classes_keep": []})
    assert det.arch == "v5"
    frame = np.random.RandomState(0).randint(0, 255, (96, 128, 3), np.uint8)
    out = det.infer(frame)
    assert isinstance(out, list)


def test_param_count_yolov5s():
    params = yolov5.init_params(jax.random.PRNGKey(0), "s")
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert 6.5e6 < n < 7.6e6, n  # ultralytics yolov5s ~7.2M
