"""YOLO11 task heads (seg/pose/obb on the v11 backbone): torch-twin
parity, checkpoint import + auto task detection, end-to-end detector,
fused-engine smoke, trainability.

The ultralytics generation the reference wraps ships ``yolo11*-seg/
-pose/-obb.pt`` alongside detect; the same cv4/proto branches attach to
the v11 detect layer (23) — models/yolo/yolov8_{seg,pose,obb}.py
``arch="11"``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadvision_tpu.models.yolo import weights
from roadvision_tpu.models.yolo.yolov8_obb import (forward_obb_raw,
                                                   init_params_obb)
from roadvision_tpu.models.yolo.yolov8_pose import (forward_pose_raw,
                                                    init_params_pose)
from roadvision_tpu.models.yolo.yolov8_seg import (forward_seg_raw,
                                                   init_params_seg)

from tests.oracles import torch_yolo
from tests.test_yolo11 import _synthetic_sd


def test_v11_pose_forward_matches_twin():
    p = init_params_pose(jax.random.PRNGKey(0), "n", nc=1, arch="11")
    x = np.random.RandomState(0).rand(2, 64, 96, 3).astype(np.float32)
    jb, js, jk = forward_pose_raw(p, jnp.asarray(x), size="n", nc=1,
                                  arch="11")
    tb, ts, tk = torch_yolo.v11_pose_forward(p, x)
    assert float(np.abs(np.asarray(jb) - tb).max()) < 1e-3
    assert float(np.abs(np.asarray(js) - ts).max()) < 1e-5
    assert float(np.abs(np.asarray(jk) - tk).max()) < 1e-3


def test_v11_obb_forward_matches_twin():
    p = init_params_obb(jax.random.PRNGKey(1), "n", nc=15, arch="11")
    x = np.random.RandomState(1).rand(1, 96, 64, 3).astype(np.float32)
    jr, js = forward_obb_raw(p, jnp.asarray(x), size="n", nc=15,
                             arch="11")
    tr, ts = torch_yolo.v11_obb_forward(p, x)
    assert float(np.abs(np.asarray(jr) - tr).max()) < 1e-3
    assert float(np.abs(np.asarray(js) - ts).max()) < 1e-5


def test_v11_seg_forward_matches_twin():
    p = init_params_seg(jax.random.PRNGKey(2), "n", nc=8, arch="11")
    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    jb, js, jc, jp = forward_seg_raw(p, jnp.asarray(x), size="n", nc=8,
                                     arch="11")
    tb, ts, tc, tp = torch_yolo.v11_seg_forward(p, x)
    assert float(np.abs(np.asarray(jb) - tb).max()) < 1e-3
    assert float(np.abs(np.asarray(js) - ts).max()) < 1e-5
    assert float(np.abs(np.asarray(jc) - tc).max()) < 1e-3
    assert float(np.abs(np.asarray(jp) - tp).max()) < 1e-3


def _add_cv4(sd, tree, torch):
    g = torch.Generator().manual_seed(23)
    for lvl, stages in enumerate(tree["23"]["cv4"]):
        for si, st in enumerate(stages[:2]):
            k, _, cin, cout = st["w"].shape
            pre = f"model.23.cv4.{lvl}.{si}"
            sd[f"{pre}.conv.weight"] = torch.randn(cout, cin, k, k,
                                                   generator=g) * 0.05
            sd[f"{pre}.bn.weight"] = torch.rand(cout, generator=g) + 0.5
            sd[f"{pre}.bn.bias"] = torch.randn(cout, generator=g) * 0.01
            sd[f"{pre}.bn.running_mean"] = \
                torch.randn(cout, generator=g) * 0.01
            sd[f"{pre}.bn.running_var"] = \
                torch.rand(cout, generator=g) + 0.5
        k, _, cin, cout = stages[2]["w"].shape
        sd[f"model.23.cv4.{lvl}.2.weight"] = \
            torch.randn(cout, cin, k, k, generator=g) * 0.05
        sd[f"model.23.cv4.{lvl}.2.bias"] = \
            torch.randn(cout, generator=g) * 0.01


def test_v11_pose_state_dict_import():
    torch = pytest.importorskip("torch")
    ref = init_params_pose(jax.random.PRNGKey(0), "n", nc=1, arch="11")
    sd = _synthetic_sd(ref)          # detect part (nc=1 head widths)
    _add_cv4(sd, ref, torch)
    assert weights.detect_arch(sd) == "11"
    assert weights.detect_task(sd) == "pose"
    params, arch, size, loaded = weights.load_params(sd)
    assert loaded and arch == "11" and size == "n"
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ref)


def test_v11_obb_task_detected_by_cv4_width():
    torch = pytest.importorskip("torch")
    ref = init_params_obb(jax.random.PRNGKey(0), "n", nc=15, arch="11")
    sd = _synthetic_sd(ref)
    _add_cv4(sd, ref, torch)
    assert weights.detect_task(sd) == "obb"
    params, arch, _size, loaded = weights.load_params(sd)
    assert loaded and arch == "11"
    assert params["23"]["cv4"][0][2]["b"].shape[0] == 1


def test_infer_v11_tasks_end_to_end():
    from roadvision_tpu.detect.yolo_jax import YOLOJax

    frame = np.random.RandomState(3).randint(0, 255, (48, 64, 3),
                                             np.uint8)
    det = YOLOJax({"model": "yolo11n-pose.pt", "imgsz": 64,
                   "conf_thres": 0.0, "max_det": 4, "classes_keep": []})
    assert det.arch == "11" and det.task == "pose" and det.nc == 1
    dets = det.infer(frame)
    assert len(dets) == 4 and all(d.keypoints is not None
                                  and d.keypoints.shape == (17, 3)
                                  for d in dets)

    det = YOLOJax({"model": "yolo11n-obb.pt", "imgsz": 64,
                   "conf_thres": 0.0, "max_det": 4, "classes_keep": []})
    assert det.arch == "11" and det.task == "obb" and det.nc == 15
    dets = det.infer(frame)
    assert len(dets) == 4 and all(d.rbox is not None for d in dets)


def test_engine_v11_seg_masks():
    from roadvision_tpu.runtime.engine import PipelineEngine

    cfg = {
        "tpu": {"batch_size": 2},
        "preprocess": {"enabled": False},
        "detect": {"enabled": True, "model": "yolo11n-seg.pt",
                   "device": "cpu", "max_det": 4, "conf_thres": 1e-4,
                   "imgsz": 96, "classes_keep": [],
                   "compute_dtype": "float32"},
        "tracking": {"enabled": False},
        "geometry": {"enabled": False},
    }
    eng = PipelineEngine(cfg)
    assert eng.detector.arch == "11" and eng.detector.task == "segment"
    rng = np.random.default_rng(0)
    frames = np.asarray(rng.integers(0, 255, (2, 72, 96, 3)), np.uint8)
    res = eng.process_batch(frames, np.arange(2) / 30.0)
    dets = [d for r in res for d in r.detections]
    assert dets and all(d.mask is not None for d in dets)


def test_v11_pose_train_step_finite():
    from roadvision_tpu.models.yolo.train import init_momentum
    from roadvision_tpu.models.yolo.train_pose import make_train_step_pose

    params = init_params_pose(jax.random.PRNGKey(0), "n", nc=1,
                              arch="11")
    rng = np.random.RandomState(0)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    boxes = np.array([[[8, 8, 40, 56]], [[20, 10, 50, 60]]], np.float32)
    cls = np.zeros((2, 1), np.int32)
    mask = np.ones((2, 1), bool)
    kpts = np.zeros((2, 1, 17, 3), np.float32)
    kpts[..., 0] = rng.uniform(10, 48, (2, 1, 17))
    kpts[..., 1] = rng.uniform(10, 60, (2, 1, 17))
    kpts[..., 2] = 1.0
    step = make_train_step_pose("n", nc=1, lr=5e-4, arch="11")
    mom = init_momentum(params)
    params, mom, loss, aux = step(
        params, mom, *(jnp.asarray(a) for a in
                       (images, boxes, cls, mask, kpts)))
    assert np.isfinite(float(loss)) and int(aux["num_fg"]) > 0
