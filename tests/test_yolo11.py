"""YOLO11 model family: ultralytics-exact parameter counts, torch-twin
forward parity, checkpoint import, end-to-end detector, npz round-trip.

Beyond-reference family (the reference wrapper pins yolov8n.pt,
src/detect/yolo_ultralytics.py:16, but the ultralytics API it wraps now
defaults to YOLO11) — same parity strategy as the other families
(tests/oracles/torch_yolo.py:v11_forward).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import weights
from roadvision_tpu.models.yolo.yolo11 import (arch_spec_11,
                                               forward_raw_11,
                                               init_params_11)
from roadvision_tpu.models.yolo.yolov8 import count_params

from tests.oracles import torch_yolo


def test_param_counts_match_ultralytics():
    """Trainable-parameter counts equal the published ultralytics
    numbers minus the 16 fixed (non-trainable) DFL arange weights —
    the strongest whole-architecture structural check available
    without a checkpoint blob."""
    published = {"n": 2_616_248, "s": 9_443_760}
    for size, total in published.items():
        p = init_params_11(jax.random.PRNGKey(0), size, 80)
        assert count_params(p) == total - 16, size


def test_v11_forward_matches_torch_twin():
    p = init_params_11(jax.random.PRNGKey(1), "n", 12)
    x = np.random.RandomState(0).rand(2, 96, 64, 3).astype(np.float32)
    jb, js = forward_raw_11(p, jnp.asarray(x), size="n", nc=12)
    tb, ts = torch_yolo.v11_forward(p, x)
    assert float(np.abs(np.asarray(jb) - tb).max()) < 1e-3
    assert float(np.abs(np.asarray(js) - ts).max()) < 1e-5


def test_c3k_blocks_present_where_expected():
    spec = arch_spec_11("n")
    # n/s: backbone layers 6/8 and head layer 22 are C3k, the rest plain
    assert [spec["c3k2"][i][2] for i in
            ("2", "4", "6", "8", "13", "16", "19", "22")] == \
        [False, False, True, True, False, False, False, True]
    spec_m = arch_spec_11("m")
    assert all(spec_m["c3k2"][i][2] for i in spec_m["c3k2"])
    p = init_params_11(jax.random.PRNGKey(0), "n", 80)
    assert "cv3" in p["6"]["m"][0] and "cv3" not in p["2"]["m"][0]


def _synthetic_sd(ref):
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(11)
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

    def add_plain(prefix, tree):
        k, _, cin, cout = tree["w"].shape
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, k, k,
                                             generator=g) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(cout, generator=g) * 0.01

    def add_c3k2(prefix, blk):
        add_convbn(f"{prefix}.cv1", blk["cv1"])
        add_convbn(f"{prefix}.cv2", blk["cv2"])
        for j, m in enumerate(blk["m"]):
            if "cv3" in m:
                for cv in ("cv1", "cv2", "cv3"):
                    add_convbn(f"{prefix}.m.{j}.{cv}", m[cv])
                for kk, mm in enumerate(m["m"]):
                    add_convbn(f"{prefix}.m.{j}.m.{kk}.cv1", mm["cv1"])
                    add_convbn(f"{prefix}.m.{j}.m.{kk}.cv2", mm["cv2"])
            else:
                add_convbn(f"{prefix}.m.{j}.cv1", m["cv1"])
                add_convbn(f"{prefix}.m.{j}.cv2", m["cv2"])

    for i in ("0", "1", "3", "5", "7", "17", "20"):
        add_convbn(f"model.{i}", ref[i])
    for i in ("2", "4", "6", "8", "13", "16", "19", "22"):
        add_c3k2(f"model.{i}", ref[i])
    add_convbn("model.9.cv1", ref["9"]["cv1"])
    add_convbn("model.9.cv2", ref["9"]["cv2"])
    add_convbn("model.10.cv1", ref["10"]["cv1"])
    add_convbn("model.10.cv2", ref["10"]["cv2"])
    for j, m in enumerate(ref["10"]["m"]):
        add_convbn(f"model.10.m.{j}.attn.qkv", m["attn"]["qkv"])
        add_convbn(f"model.10.m.{j}.attn.proj", m["attn"]["proj"])
        add_convbn(f"model.10.m.{j}.attn.pe", m["attn"]["pe"])
        add_convbn(f"model.10.m.{j}.ffn.0", m["ffn"][0])
        add_convbn(f"model.10.m.{j}.ffn.1", m["ffn"][1])
    for lvl in range(3):
        box = ref["23"]["cv2"][lvl]
        add_convbn(f"model.23.cv2.{lvl}.0", box[0])
        add_convbn(f"model.23.cv2.{lvl}.1", box[1])
        add_plain(f"model.23.cv2.{lvl}.2", box[2])
        cls = ref["23"]["cv3"][lvl]
        add_convbn(f"model.23.cv3.{lvl}.0.0", cls[0]["dw"])
        add_convbn(f"model.23.cv3.{lvl}.0.1", cls[0]["pw"])
        add_convbn(f"model.23.cv3.{lvl}.1.0", cls[1]["dw"])
        add_convbn(f"model.23.cv3.{lvl}.1.1", cls[1]["pw"])
        add_plain(f"model.23.cv3.{lvl}.2", cls[2])
    return sd


def test_v11_state_dict_import():
    ref = init_params_11(jax.random.PRNGKey(0), "n", 80)
    sd = _synthetic_sd(ref)
    assert weights.detect_arch(sd) == "11"
    assert weights.infer_size_from_state_dict(sd) == "n"
    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and arch == "11" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    # imported depthwise kernels keep the (k, k, 1, C) group shape
    assert params["23"]["cv3"][0][0]["dw"]["w"].shape[2] == 1


def test_v11_npz_roundtrip(tmp_path):
    ref = init_params_11(jax.random.PRNGKey(2), "n", 80)
    path = tmp_path / "y11.npz"
    weights.export_npz(ref, path)
    params, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "11" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    b0, s0 = forward_raw_11(ref, jnp.asarray(x), size="n", nc=80)
    b1, s1 = forward_raw_11(params, jnp.asarray(x), size="n", nc=80)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)


def test_infer_yolo11_end_to_end():
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    det = YOLOJax({"model": "yolo11n.pt", "imgsz": 64, "conf_thres": 0.0,
                   "max_det": 5, "classes_keep": []})
    assert det.arch == "11" and det.nc == 80
    frame = np.random.RandomState(3).randint(0, 255, (48, 64, 3),
                                             np.uint8)
    dets = det.infer(frame)
    assert len(dets) == 5          # conf 0: max_det slots fill
    for d in dets:
        assert 0 <= d.cls_id < 80
        assert d.cls_name == det.names[d.cls_id]


def test_v11_int8_quantized_forward():
    """The int8 conv path handles YOLO11's grouped/depthwise kernels
    (feature_group_count inferred in quant.conv_i8 too) — quantized
    scores stay close to the f32 reference."""
    from roadvision_tpu.models.yolo.quant import quantize_params

    p = init_params_11(jax.random.PRNGKey(5), "n", 8)
    x = np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32)
    b0, s0 = forward_raw_11(p, jnp.asarray(x), size="n", nc=8)
    q = quantize_params(p)
    b1, s1 = forward_raw_11(q, jnp.asarray(x), size="n", nc=8)
    assert float(np.abs(np.asarray(s0) - np.asarray(s1)).max()) < 0.05
    # boxes in px: a couple px of quantization drift is acceptable
    assert float(np.abs(np.asarray(b0) - np.asarray(b1)).max()) < 4.0


def test_v5_task_heads_rejected():
    from roadvision_tpu.detect.yolo_jax import YOLOJax
    with pytest.raises(ValueError, match="YOLOv8 or"):
        YOLOJax({"model": "yolov5n.pt", "task": "segment"})


def test_params_onnx_roundtrip_v11(tmp_path):
    from roadvision_tpu.models.yolo import onnx_io

    ref = init_params_11(jax.random.PRNGKey(4), "n", 80)
    path = tmp_path / "y11.onnx"
    onnx_io.export_onnx(ref, path, arch="11")
    params, arch, size, loaded = weights.load_params(str(path))
    assert loaded and arch == "11" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)
    x = np.random.RandomState(5).rand(1, 64, 64, 3).astype(np.float32)
    b0, s0 = forward_raw_11(ref, jnp.asarray(x), size="n", nc=80)
    b1, s1 = forward_raw_11(params, jnp.asarray(x), size="n", nc=80)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1), atol=1e-4)


def test_v11_train_step_reduces_loss_and_grads_reach_attention():
    from roadvision_tpu.models.yolo.train import (detection_loss,
                                                  init_momentum,
                                                  make_train_step)

    # the tests/test_train_parallel.py _tiny_batch construction (nc=80:
    # the head-bias init keeps targets stable enough that 4 steps
    # descend strictly, same bar as the v8 descent test)
    rng = np.random.RandomState(0)
    bs, hw, m, nc = 2, 64, 3, 80
    images = rng.rand(bs, hw, hw, 3).astype(np.float32)
    boxes = []
    for _ in range(bs):
        xy = rng.uniform(5, hw - 25, (m, 2))
        wh = rng.uniform(8, 20, (m, 2))
        boxes.append(np.concatenate([xy, xy + wh], -1))
    gt_boxes = np.stack(boxes).astype(np.float32)
    gt_cls = rng.randint(0, nc, (bs, m)).astype(np.int32)
    gt_mask = np.ones((bs, m), bool)
    gt_mask[:, -1] = False
    args = tuple(jnp.asarray(a) for a in
                 (images, gt_boxes, gt_cls, gt_mask))

    params = init_params_11(jax.random.PRNGKey(0), "n", nc)
    grads = jax.grad(lambda p: detection_loss(
        p, *args, size="n", nc=nc, arch="11")[0])(params)
    attn_norm = sum(float(jnp.sum(g * g)) for g in
                    jax.tree_util.tree_leaves(grads["10"]["m"]))
    dw_norm = sum(float(jnp.sum(g * g)) for g in
                  jax.tree_util.tree_leaves(grads["23"]["cv3"]))
    assert attn_norm > 0 and dw_norm > 0

    step = make_train_step("n", nc=nc, lr=5e-4, arch="11")
    mom = init_momentum(params)
    losses = []
    for _ in range(4):
        params, mom, loss, aux = step(params, mom, *args)
        losses.append(float(loss))
    assert losses[-1] < losses[0] and np.isfinite(losses[-1])


def test_engine_yolo11_fused_step():
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "yolo11n-missing.pt",
                   "device": "cpu", "max_det": 6, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": True, "new_track_thresh": 0.0},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.detector.arch == "11" and eng.detector.task == "detect"
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.rbox is None and d.mask is None for d in dets)
    assert all(d.track_id is not None for d in dets)


def test_train_cli_yolo11_smoke(tmp_path):
    from tools.train import main as train_main

    out = tmp_path / "y11_run.npz"
    rc = train_main(["--data", "synthetic", "--steps", "2",
                     "--imgsz", "96", "--batch", "2",
                     "--weights", "yolo11n-none.pt", "--out", str(out),
                     "--log-every", "1"])
    assert rc == 0
    saved = np.load(out.with_suffix(".weights.npz"))
    assert any(k.startswith("L23.") for k in saved)
    assert any(".attn." in k for k in saved)
